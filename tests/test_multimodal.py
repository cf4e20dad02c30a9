"""K5 multimodal plumbing tests: binary columns, Arrow-batched decode
pipeline shape, frame plans, binary dedup. Codecs are stubbed
(deterministic) — the Spark-side schema/partitioning/batching is real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from post_modern_stack_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(media_id=1, kind="image", content=b"\x89PNG fake a", mime="image/png",
            width=64, height=64, duration_ms=None),
        Row(media_id=2, kind="image", content=b"\x89PNG fake a", mime="image/png",
            width=64, height=64, duration_ms=None),  # exact dup of 1
        Row(media_id=3, kind="audio", content=b"RIFF fake", mime="audio/wav",
            width=None, height=None, duration_ms=2500),
        Row(media_id=4, kind="video", content=b"\x00\x00ftyp fake", mime="video/mp4",
            width=320, height=240, duration_ms=3200),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_feature_extraction_shape(spark, media):
    out = MM.extract_features(media).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert all(len(r["features"]) == MM.FEATURE_DIM for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r["features"])
    # deterministic: identical bytes → identical features and sha
    assert by_id[1]["features"] == by_id[2]["features"]
    assert by_id[1]["content_sha"] == by_id[2]["content_sha"]
    assert by_id[1]["n_bytes"] == len(b"\x89PNG fake a")


def test_real_codec_stub_raises(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        MM.extract_features(media, require_real_codecs=True).collect()


def test_frame_sample_plan(spark, media):
    frames = MM.frame_sample_plan(media, every_ms=1000).collect()
    # 3200 ms video sampled at 1000 ms → ts 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]
    assert all(r["media_id"] == 4 for r in frames)


def test_media_dedup(spark, media):
    d = {r["media_id"]: r["n_copies"] for r in MM.media_dedup(media).collect()}
    assert d[1] == 2  # ids 1+2 collapse, keeping min id
    assert d[3] == 1 and d[4] == 1
