"""Evaluation metrics as dataflow (SURVEY.md §2 G; reference
src/model/my_reclist.py — RecList ``stats`` + ``HR@10`` re-expressed as
aggregations so they run distributed instead of over driver lists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_stats(sessions: DataFrame, arr_col: str = "interactions") -> DataFrame:
    """G1: dataset statistics (reference my_reclist.py:6-16) — one
    partial+final aggregate pass, plus exact/approx distinct pair to
    document the 100 TB sketch posture (K6).
    """
    return sessions.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.size(arr_col)).alias("n_interactions"),
        F.round(F.avg(F.size(arr_col)), 4).alias("avg_session_len"),
        F.min(F.size(arr_col)).alias("min_session_len"),
        F.max(F.size(arr_col)).alias("max_session_len"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


def hit_rate_at_k(
    predictions: DataFrame,
    label_col: str = "y",
    preds_col: str = "preds",
) -> DataFrame:
    """G2: HitRate@K = mean([label ∈ top-K preds]) (reference
    my_reclist.py:18-26). ``preds_col`` is an array column of the
    model's (or baseline's) top-K items per row.
    """
    return predictions.agg(
        F.round(
            F.avg(F.array_contains(F.col(preds_col), F.col(label_col)).cast("double")),
            6,
        ).alias("hit_rate")
    )


def data_quality_checks(
    df: DataFrame, unique_col: str, not_null_cols: list[str] | None = None
) -> DataFrame:
    """dbt-style data tests as one aggregation (reference
    src/dbt/models/metaflow/schema.yml:9-13: ``unique`` + ``not_null``
    on SESSION_ID). Returns a one-row report; every violation count
    must be 0. Used by the pipeline's fail-fast stage (I2).
    """
    aggs = [
        # count(col), not count(*): NULLs are not duplicates (dbt
        # `unique` semantics; not_null reports them separately)
        (F.count(F.col(unique_col)) - F.count_distinct(F.col(unique_col))).alias(
            f"{unique_col}_duplicates"
        ),
        F.sum(F.col(unique_col).isNull().cast("long")).alias(f"{unique_col}_nulls"),
    ]
    for c in not_null_cols or []:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"))
    return df.agg(*aggs)
