"""Unit tests for bench.py's sampling/estimation policy (VERDICT r08
item 2: the min-of-2 estimator wrote a one-sided artifact for a
bimodal query — [1.739, 15.644] reported as 1.74 — and the driver then
recorded the slow mode twice). bench.py is import-safe (main() is
__main__-guarded), so the policy helpers are tested directly."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_synthetic_spike_is_flagged_bimodal():
    # the exact r08 media_jpeg_pipeline samples
    assert bench.is_bimodal([1.739, 15.644])
    assert bench.is_bimodal([15.644, 1.739])  # order-insensitive
    # ordinary host jitter is NOT bimodal
    assert not bench.is_bimodal([1.0, 1.4])
    assert not bench.is_bimodal([2.0, 5.9])  # 2.95x, under the 3x line
    assert bench.is_bimodal([2.0, 6.1])
    # a single sample can never be flagged
    assert not bench.is_bimodal([7.0])
    assert not bench.is_bimodal([])
    # 3-sample spikes stay flagged so the artifact keeps the marker
    # even after the tiebreak resolved the estimate
    assert bench.is_bimodal([1.0, 1.1, 15.0])


def test_estimator_policy_min2_median3():
    assert bench.estimate([]) == -1.0
    assert bench.estimate([4.2]) == 4.2
    # 2 samples: min (median of 2 is a mean — worse under one-sided noise)
    assert bench.estimate([3.0, 5.0]) == 3.0
    # 3 samples: median — a forced tiebreak turns a bimodal 2-sample
    # min into a median-of-3 that lands on the majority mode
    assert bench.estimate([1.739, 15.644, 1.8]) == 1.8
    assert bench.estimate([1.739, 15.644, 14.9]) == 14.9
    assert bench.estimate([5.0, 1.0, 3.0]) == 3.0


def test_bimodal_threshold_constant_guards_policy():
    """The 3x line is what the r08 verdict calibrated against this
    host's noise band (plan-identical queries flip 1.4-1.6x between
    windows; 9x was the pathology) — moving it silently would
    re-open the masking hole, so pin it."""
    assert bench.BIMODAL_SPREAD == 3.0


def test_parse_sf_strict_and_fallback():
    """ADVICE r09: the old rsplit-token was used to build both a
    filename and a float — a path without an sf leaf produced a
    slash-containing filename (post-sweep FileNotFoundError) and a
    token like '0.0.1' passed isdigit but crashed float()."""
    assert bench.parse_sf("/root/testdata/sf0.1") == ("0.1", 0.1)
    assert bench.parse_sf("/root/testdata/sf0.1/") == ("0.1", 0.1)
    assert bench.parse_sf("/data/sf10") == ("10", 10.0)
    # no sf leaf: sanitized slug, string sf — never a slash, never float()
    tok, val = bench.parse_sf("/tmp/my data dir")
    assert "/" not in tok and val == tok
    # the exact ADVICE crash case: '0.0.1' must not reach float()
    tok, val = bench.parse_sf("/data/sf0.0.1")
    assert isinstance(val, str) and "/" not in tok


def test_load_py_band_queries_parses_plans_md(tmp_path):
    plans = tmp_path / "PLANS.md"
    plans.write_text(
        "# PLANS\n"
        "| query | check | shuffles | bcasts | joins | aggs | windows "
        "| top-K prune | pushdown | py-ops |\n"
        "|---|---|---|---|---|---|---|---|---|---|\n"
        "| `sessionize` | [O] | 2 | — | — | 4 | 0 | — | yes | — |\n"
        "| `media_png_pipeline` | [R] | 0 | — | — | 0 | 0 | — | — | 2 |\n"
        "| `embedding_whiten` | [R] | 0 | — | — | 0 | 0 | — | — | 1 |\n"
    )
    band = bench.load_py_band_queries(str(plans))
    assert band == {"media_png_pipeline", "embedding_whiten"}
    # missing file degrades to empty set, never raises
    assert bench.load_py_band_queries(str(tmp_path / "nope.md")) == set()


def test_load_py_band_real_plans_md_includes_codecs():
    """The committed PLANS.md must yield the codec family — the class
    the r09 verdict named as band-exposed."""
    band = bench.load_py_band_queries()
    for q in ("media_jpeg_pipeline", "media_video_frames", "media_png_pipeline"):
        assert q in band, q
    assert "sessionize" not in band


def test_band_history_flags_slow_uniform_drift():
    """The exact r09 miss: media_video_frames drifted 2.86->4.09s
    (1.43x vs the PREVIOUS artifact — under the 1.5x prev-diff line)
    but sits >1.5x over its QUIET-MEDIAN history."""
    history = {"media_video_frames": [2.47, 2.38, 2.38, 2.61, 2.62, 2.69]}
    drift = bench.check_band_history(
        history, {"media_video_frames": 4.09}, {"media_video_frames"}
    )
    assert len(drift) == 1
    name, cur, ref, ratio, tail = drift[0]
    assert name == "media_video_frames" and cur == 4.09
    assert ref == 2.545 or abs(ref - sorted(history[name])[3]) < 1e-9
    assert ratio > 1.5
    # quiet value: no flag
    assert not bench.check_band_history(
        history, {"media_video_frames": 2.9}, {"media_video_frames"}
    )
    # <3 history points: not enough evidence, no flag
    assert not bench.check_band_history(
        {"x": [1.0, 9.0]}, {"x": 9.0}, {"x"}
    )
    # improvements are reported too (a 3x speedup on no code change is
    # as suspicious as a 3x slowdown on this host)
    fast = bench.check_band_history(
        history, {"media_video_frames": 1.0}, {"media_video_frames"}
    )
    assert len(fast) == 1 and fast[0][3] < 1 / 1.5
