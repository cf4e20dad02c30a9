"""Streaming curation gate: score + filter documents IN FLIGHT.

The train-offline / score-online split for model-based quality
filtering (operators/inference): ``train_logreg`` runs as a batch job
over a labeled sample; the resulting weight vector is a few KB of
plan literals, so the scorer compiles into a stateless per-row
``select`` — no state store, no watermark, no shuffle — and the SAME
transformation runs on a batch DataFrame or a readStream
(parity-tested). This is the Spark-native analog of exporting a
fasttext quality model to the serving tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_documents(spark: SparkSession, path: str) -> DataFrame:
    """File-source document stream (new parquet files = new docs)."""
    return spark.readStream.schema(DOC_SCHEMA).parquet(path)


def quality_gate(
    docs: DataFrame,
    weights,
    bias: float,
    min_p: float = 0.5,
    n_features: int = 256,
) -> DataFrame:
    """Gopher keep-flag + classifier probability as ONE row-local
    projection, emitting only passing docs. Identical plan on batch
    and streaming inputs — no joins (a per-row gate must not turn
    into a stream-stream join), no aggregation, no state."""
    from post_modern_stack_spark.operators.inference import logreg_prob_expr
    from post_modern_stack_spark.operators.textstats import gopher_keep_expr

    p = logreg_prob_expr("text", weights, bias, n_features=n_features)
    return (
        docs.select(
            "doc_id",
            "source",
            gopher_keep_expr("text").alias("rules_keep"),
            p.alias("p"),
        )
        .filter((F.col("rules_keep") == 1) & (F.col("p") >= min_p))
        .select("doc_id", "source", F.round("p", 6).alias("p"))
    )
