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
