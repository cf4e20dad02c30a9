"""Write-path data layout: Z-order (Morton) clustering for multi-column
min/max file pruning.

Why this exists (100 TB posture): parquet scan pruning works off
per-file/per-row-group min-max statistics. A table sorted by ONE column
prunes beautifully on that column and not at all on any other; Z-order
interleaves the bits of several columns' rank-buckets so every output
file covers a small hyper-rectangle of the key space — predicates on
ANY of the clustered columns skip most files. This is the same layout
optimization Delta Lake's ``OPTIMIZE ... ZORDER BY`` and public
lakehouse engines apply (Morton 1966; public technique), expressed
with plain DataFrame ops: bucket → bit-interleave → range-repartition
→ sort-within-partitions. No shuffle beyond the one range exchange the
rewrite needs anyway.

Bucketing defaults to uniform ``width_bucket`` over the column's
min/max (one tiny agg job to fetch the bounds). For heavily skewed
columns pass ``boundaries={col: [...]}`` (e.g. from
``df.stat.approxQuantile``) and the bucket id is computed by counting
crossed boundaries — rank-space buckets, Delta's approach.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_cols(
    df: DataFrame,
    cols: list[str],
    bits: int,
    boundaries: dict[str, list[float]] | None,
) -> list[Column]:
    n_buckets = 1 << bits
    boundaries = boundaries or {}
    uniform = [c for c in cols if c not in boundaries]
    bounds = {}
    if uniform:
        row = df.agg(
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in uniform],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in uniform],
        ).collect()[0]
        bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in uniform}

    out = []
    for c in cols:
        if c in boundaries:
            bs = sorted(boundaries[c])
            if len(bs) >= n_buckets:
                raise ValueError(
                    f"{c}: {len(bs)} boundaries need more than {bits} bits"
                )
            arr = F.array(*[F.lit(float(b)) for b in bs])
            # bucket = number of boundaries the value has crossed
            bucket = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc
                + F.when(F.col(c).cast("double") >= b, 1).otherwise(0),
            )
        else:
            lo, hi = bounds[c]
            if lo is None or hi is None or lo == hi:
                bucket = F.lit(0)
            else:
                # width_bucket: 0 below lo, n+1 at/above hi — clamp to
                # [0, n_buckets-1]
                bucket = F.least(
                    F.greatest(
                        F.width_bucket(
                            F.col(c).cast("double"),
                            F.lit(float(lo)),
                            F.lit(float(hi)),
                            F.lit(n_buckets),
                        )
                        - 1,
                        F.lit(0),
                    ),
                    F.lit(n_buckets - 1),
                )
        # NULLs sort first: bucket 0
        out.append(F.coalesce(bucket, F.lit(0)).cast("long"))
    return out


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    boundaries: dict[str, list[float]] | None = None,
) -> Column:
    """The interleaved Morton key as a Column (long).

    Bit layout: z = Σ_i Σ_j bit_i(bucket_j) << (i·k + j) for k columns —
    column j contributes every k-th bit. bits·len(cols) must fit a
    signed long (≤ 62).
    """
    if not cols:
        raise ValueError("zorder_key: need at least one column")
    k = len(cols)
    if bits * k > 62:
        raise ValueError(f"bits*cols = {bits * k} exceeds long range")
    buckets = _bucket_cols(df, cols, bits, boundaries)
    z = F.lit(0).cast("long")
    for j, b in enumerate(buckets):
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return z


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 8,
    num_files: int = 32,
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Return ``df`` arranged for a Z-ordered write: range-partitioned
    and sorted by the Morton key, so each of the ``num_files`` output
    files covers one contiguous z-range (a small hyper-rectangle in
    (cols) space → tight min/max stats on EVERY clustered column).
    Write with ``.write.parquet(...)`` as usual; the helper key column
    is dropped before return."""
    z = zorder_key(df, cols, bits, boundaries)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
