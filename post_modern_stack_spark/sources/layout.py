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


def _bucket_by_cutpoints(col: F.Column, cuts: list[float]) -> F.Column:
    """Bucket id = number of (sorted) cutpoints ≤ value, as a BINARY
    when-tree: log2(n) codegen'd comparisons per row instead of a
    linear n-element HOF scan (measured 10M rows × 2 cols × 255 cuts:
    linear interpreted HOF 41 s, this tree is comparison-count-bound).
    Duplicate cutpoints (skew plateaus) are fine — equal keys collapse
    into the same branch."""

    def tree(lo: int, hi: int) -> F.Column:
        # bucket for values known to satisfy cuts[lo-1] <= v < cuts[hi]
        if lo == hi:
            return F.lit(lo).cast("long")
        mid = (lo + hi + 1) // 2
        return (
            F.when(col >= F.lit(float(cuts[mid - 1])), tree(mid, hi))
            .otherwise(tree(lo, mid - 1))
        )

    return tree(0, len(cuts))


def _rank_normalize(
    df: DataFrame,
    cluster_cols: list[str],
    bits: int,
    approx: bool,
    rel_err: float,
    prefix: str,
) -> tuple[DataFrame, list[str]]:
    """Shared rank stage for the space-filling-curve writers: map each
    cluster column into [0, 2^bits) rank space — exact ntile (one
    global window per column; maintenance-job scale) or approx
    (one multi-column approxQuantile sketch + binary when-tree per
    row; the cluster-scale path, no global sort)."""
    from pyspark.sql import Window

    levels = 1 << bits
    if approx:
        if bits > 8:
            raise ValueError("approx rank caps bits at 8 (256 rank buckets)")
        probs = [i / levels for i in range(1, levels)]
        cuts = dict(
            zip(cluster_cols, df.stat.approxQuantile(cluster_cols, probs, rel_err))
        )
    ranked = df
    rank_cols = []
    for c in cluster_cols:
        rc = f"{prefix}{c}"
        if approx:
            bucket = _bucket_by_cutpoints(F.col(c).cast("double"), sorted(cuts[c]))
            # NULLs cluster first (bucket 0), like ntile's null-first sort
            ranked = ranked.withColumn(rc, F.coalesce(bucket, F.lit(0)))
        else:
            ranked = ranked.withColumn(
                rc,
                (F.ntile(levels).over(Window.orderBy(F.col(c))) - 1).cast("long"),
            )
        rank_cols.append(rc)
    return ranked, rank_cols


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int | None = None,
    partitions: int | None = None,
    mode: str = "overwrite",
    approx: bool = False,
    rel_err: float = 0.001,
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
    WRITE time (over 2^bits buckets — ntile of the sorted column):
    exact ranks, right at maintenance-job scale. ``approx=True`` is
    the 100 TB path: rank-space cutpoints come from one
    ``approxQuantile`` sketch job (all columns in a single pass,
    ``rel_err`` accuracy) and each row's bucket is the count of
    cutpoints crossed — a log2(2^bits) binary when-tree per row, an
    embarrassingly-parallel expression with NO global sort anywhere
    before the final range exchange. ``bits`` defaults per mode: 16
    exact, 8 approx (256 rank buckets — ample for file-level
    clustering, where file count ≪ 256²; the approx cap bounds the
    2^bits−1 cutpoint literals each column's sketch must produce and
    the when-tree must embed).
    """
    if bits is None:
        bits = 8 if approx else 16
    ranked, rank_cols = _rank_normalize(df, zorder_cols, bits, approx, rel_err, "__zr_")
    keyed = ranked.withColumn("__zkey", zorder_key(rank_cols, bits)).drop(*rank_cols)
    part = (
        keyed.repartitionByRange(partitions, "__zkey")
        if partitions
        else keyed.repartitionByRange("__zkey")
    )
    part.sortWithinPartitions("__zkey").drop("__zkey").write.mode(mode).parquet(path)


def with_hilbert_key(
    df: DataFrame, xcol: str, ycol: str, bits: int = 12, out: str = "__hkey"
) -> DataFrame:
    """Hilbert-curve index of two rank-normalized columns (each in
    [0, 2^bits)) — better clustering than the Morton key for 2-D
    workloads: the Hilbert curve has no Z-shaped jumps, so consecutive
    key ranges are contiguous spatial regions and file min/max ranges
    cover tighter rectangles.

    The classic xy2d bit algorithm is a sequential loop with rotation
    state. A naive Column unrolling nests each level's x/y inside the
    next level's when/otherwise and the expression tree grows 4^bits
    nodes (Catalyst analysis hangs) — so each level is MATERIALIZED as
    a projection over named temp columns: ``bits`` stacked selects,
    each O(1) expressions, still pure JVM bit ops with no UDF and no
    shuffle. That projection-chain trick is why this is a DataFrame
    transform, not a Column factory like ``zorder_key``.

    2-D only by design — Morton (zorder_key) generalizes to N dims
    trivially; Hilbert's rotation table doesn't.
    """
    hx, hy, hd = "__hx", "__hy", "__hd"
    cur = df.withColumns(
        {
            hx: F.col(xcol).cast("long"),
            hy: F.col(ycol).cast("long"),
            hd: F.lit(0).cast("long"),
        }
    )
    for level in range(bits - 1, -1, -1):
        s_val = 1 << level
        rx = F.shiftright(F.col(hx), level).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col(hy), level).bitwiseAND(F.lit(1))
        quadrant = (rx * 3).bitwiseXOR(ry).cast("long")
        reflect = (ry == 0) & (rx == 1)
        nx = F.when(reflect, F.lit(s_val - 1) - F.col(hx)).otherwise(F.col(hx))
        ny = F.when(reflect, F.lit(s_val - 1) - F.col(hy)).otherwise(F.col(hy))
        cur = cur.withColumns(
            {
                hd: F.col(hd) + F.lit(1 << (2 * level)).cast("long") * quadrant,
                hx: F.when(ry == 0, ny).otherwise(nx),
                hy: F.when(ry == 0, nx).otherwise(ny),
            }
        )
    return cur.withColumnRenamed(hd, out).drop(hx, hy)


def write_hilbert(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    bits: int | None = None,
    partitions: int | None = None,
    mode: str = "overwrite",
    approx: bool = False,
    rel_err: float = 0.001,
) -> None:
    """Hilbert-clustered parquet layout — the 2-D sibling of
    ``write_zordered`` with the same rank-normalize → key → range
    partition → sort pipeline, including the same ``approx=True``
    cluster-scale rank stage (sketch cutpoints + when-tree, no global
    ntile sort). ``bits`` defaults per mode: 12 exact, 8 approx."""
    if len(cluster_cols) != 2:
        raise ValueError("hilbert layout is 2-D; use write_zordered for N dims")
    if bits is None:
        bits = 8 if approx else 12
    ranked, rank_cols = _rank_normalize(
        df, cluster_cols, bits, approx, rel_err, "__hr_"
    )
    keyed = with_hilbert_key(ranked, *rank_cols, bits=bits).drop(*rank_cols)
    part = (
        keyed.repartitionByRange(partitions, "__hkey")
        if partitions
        else keyed.repartitionByRange("__hkey")
    )
    part.sortWithinPartitions("__hkey").drop("__hkey").write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    dynamic: bool = False,
) -> None:
    """Hive-style partitioned parquet layout (`path/col=value/...`) —
    the directory-pruning counterpart to bucketing: a filter on a
    partition column never lists, opens, or scans other partitions'
    files (visible as PartitionFilters in the scan node).

    ``dynamic=True`` sets partitionOverwriteMode=dynamic FOR THIS WRITE
    (writer option, not session conf — no global state mutated): an
    overwrite then replaces ONLY the partitions present in ``df``,
    leaving sibling partitions untouched. That is the idempotent
    daily-reload primitive — rewriting one day of a 5-year table
    touches 1/1800th of the files; static overwrite would drop the
    whole table first.
    """
    (
        df.write.mode(mode)
        .option(
            "partitionOverwriteMode", "dynamic" if dynamic else "static"
        )
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_with_bloom_filters(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    ndv: int = 100_000,
) -> None:
    """Parquet layout with per-column bloom filters — point-lookup data
    skipping for HIGH-cardinality columns where min/max stats are
    useless (a uuid/key column's min/max spans everything, so range
    pruning never fires; the bloom filter rejects a row group in O(1)
    probes instead). Spark's vectorized reader consults the filters
    transparently on `col = literal` predicates.
    """
    w = df.write.mode("overwrite")
    for c in bloom_cols:
        w = (
            w.option(f"parquet.bloom.filter.enabled#{c}", "true")
            .option(f"parquet.bloom.filter.expected.ndv#{c}", str(ndv))
        )
    w.parquet(path)
