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
from pyspark.sql import functions as F


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


def write_clustered(
    df: DataFrame,
    path: str,
    range_cols: list[str],
    sort_cols: list[str] | None = None,
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: ``repartitionByRange`` on the
    pruning columns + ``sortWithinPartitions`` so every file covers a
    narrow (min, max) slice of the cluster keys. Parquet row-group /
    file statistics then let range predicates skip whole files — the
    poor-man's Z-order, and the right default for (tenant, event_date)
    event logs at 100 TB.
    """
    cols = [F.col(c) for c in range_cols]
    part = (
        df.repartitionByRange(partitions, *cols)
        if partitions
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*(sort_cols or range_cols)).write.mode(mode).parquet(
        path
    )


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_cols: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory down to
    ``target_files`` (streaming sinks and incremental appends fragment
    layouts; scan cost at 100 TB is dominated by file count × footer
    reads if left unchecked). Returns the resulting file count.

    Swap protocol: write to ``__compacting``, move the old dir to
    ``__precompact`` (one rename), move the new one in (one rename),
    then delete the backup — a crash leaves either the original or the
    compacted data recoverable from a sibling dir, never a silent loss
    (a brief path-missing window between the two renames remains; this
    is a local-FS maintenance utility — on object stores / real tables,
    use the table format's transactional rewrite instead).
    """
    import glob
    import os
    import shutil

    df = spark.read.parquet(path)
    base = path.rstrip("/")
    tmp, backup = base + "__compacting", base + "__precompact"
    out = df.coalesce(target_files)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").parquet(tmp)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(base, backup)
    os.rename(tmp, base)
    shutil.rmtree(backup)
    return len(glob.glob(os.path.join(base, "*.parquet")))


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: list[str]):
    """Read two bucketed tables for a co-located join. Caller should
    disable broadcast if the point is to exercise the zero-exchange
    sort-merge path (Catalyst broadcasts small tables regardless of
    bucketing)."""
    return spark.table(left).join(spark.table(right), on)
