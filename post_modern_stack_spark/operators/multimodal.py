"""Multimodal columns (SURVEY.md §2 K5): image/audio/video as opaque
``binary`` columns + typed metadata, processed with Arrow-batched
``mapInPandas`` UDFs.

The Spark-side plumbing — schemas, batch iteration, partition sizing,
metadata propagation — is real and tested; the codec calls themselves
(image decode, audio resample, frame extraction) are STUBBED behind
``_decode_*`` hooks because media libraries are not available in this
container. Each stub is deterministic so tests can assert the full
pipeline shape, and raises ``NotImplementedError`` when
``require_real_codecs=True``.

Design for 100 TB: media bytes ride in parquet binary columns;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory, and the
UDFs stream record-batches (never materialize a partition). Feature
outputs are fixed-width float arrays → friendly to the K3 similarity
operators downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_and_featurize(content: bytes, kind: str, require_real_codecs: bool):
    """STUB codec hook. Real implementation would dispatch to
    PIL/libvips (image), soundfile/ffmpeg (audio/video). The
    deterministic fake derives a FEATURE_DIM vector from the content
    digest so plumbing tests have stable expectations."""
    if require_real_codecs:
        raise NotImplementedError(
            "media codecs are not available in this environment; "
            "install image/audio libs and implement _decode_and_featurize"
        )
    digest = hashlib.sha256(content or b"").digest()
    return [
        float(int.from_bytes(digest[2 * i : 2 * i + 2], "big")) / 65535.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media: DataFrame, require_real_codecs: bool = False
) -> DataFrame:
    """Decode + featurize media rows via ``mapInPandas`` (Arrow batch
    transfer, iterator API — constant memory per task)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_and_featurize(c, k, require_real_codecs)
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c or b"") for c in pdf["content"]],
                    "content_sha": [
                        hashlib.sha256(c or b"").hexdigest() for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per frame timestamp to
    extract (the decode itself is the stubbed codec call). Pure
    expression: sequence over the duration — no UDF until the codec
    boundary."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def media_dedup(media: DataFrame) -> DataFrame:
    """K1 applied to binary columns: exact dedup on the content digest
    (sha2 over binary works JVM-side — no decode needed)."""
    return (
        media.groupBy(F.sha2(F.col("content"), 256).alias("content_sha"))
        .agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )
