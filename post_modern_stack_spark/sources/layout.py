"""Physical layout operators for co-located joins (SURVEY.md §4:
"repartition()/bucketing for co-located joins").

Bucketed tables pre-shuffle data by join key at write time: two tables
bucketed identically join with ZERO exchanges — at 100 TB this converts
every recurring fact-fact join (events ⋈ sessions, orders ⋈ lineitem)
from a full network shuffle into a local merge. The write cost is paid
once; every downstream join reads it back for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the per-task sort from
    sort-merge joins (bucket + sort = join-ready on disk).
    """
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: list[str]):
    """Read two bucketed tables for a co-located join. Caller should
    disable broadcast if the point is to exercise the zero-exchange
    sort-merge path (Catalyst broadcasts small tables regardless of
    bucketing)."""
    return spark.table(left).join(spark.table(right), on)
