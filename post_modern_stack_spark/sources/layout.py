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


def zorder_key(cols: list[str], bits: int = 16) -> F.Column:
    """Z-order (Morton) interleave of N numeric columns into one sort
    key: each column is rank-normalized by the caller to [0, 2^bits)
    and its bits are interleaved, so sorting by the key clusters rows
    that are close in EVERY dimension — multi-dimensional file-stat
    pruning from a one-dimensional sort.

    Pure JVM bit expressions (shiftleft/or over longs): no UDF, safe
    under ANSI (bitwise ops never overflow-check). bits=16 × ≤4 cols
    stays inside a 64-bit long.
    """
    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols × {bits} bits exceeds a signed long")
    key = F.lit(0).cast("long")
    for bit in range(bits):
        for ci, c in enumerate(cols):
            src_bit = F.shiftright(F.col(c).cast("long"), bit).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(src_bit.cast("long"), bit * n + ci)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet: rank-normalize the cluster columns
    (ntile over each — rank, not raw value, so skewed domains still
    spread uniformly across the grid), interleave into a Morton key,
    range-partition + sort by it. Files then cover small hyper-rect
    regions of the column space, so parquet min/max stats prune on
    ANY clustered column, not just the first sort column — the
    multi-dimensional upgrade of ``write_clustered`` for workloads
    that filter sometimes by tenant, sometimes by date, sometimes by
    both.

    The ntile rank pass costs one global-ish window per column at
    WRITE time (over 2^bits buckets — ntile of the sorted column);
    at 100 TB use an approximate variant (approxQuantile cutpoints →
    ``width_bucket``) to avoid the global sort; exact ntile is right
    at maintenance-job scale.
    """
    from pyspark.sql import Window

    levels = 1 << bits
    ranked = df
    rank_cols = []
    for c in zorder_cols:
        rc = f"__zr_{c}"
        ranked = ranked.withColumn(
            rc, (F.ntile(levels).over(Window.orderBy(F.col(c))) - 1).cast("long")
        )
        rank_cols.append(rc)
    keyed = ranked.withColumn("__zkey", zorder_key(rank_cols, bits)).drop(*rank_cols)
    part = (
        keyed.repartitionByRange(partitions, "__zkey")
        if partitions
        else keyed.repartitionByRange("__zkey")
    )
    part.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)
