"""operators/layout — Z-order clustering for multi-column file pruning."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from post_modern_stack_spark.operators.layout import zorder_key, zorder_layout


def _morton(bx: int, by: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((bx >> i) & 1) << (2 * i)
        z |= ((by >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_python_morton(spark):
    """Interleave math against an independent python reference, on a
    grid where uniform width_bucket bucket ids are known exactly."""
    bits = 4
    n = 1 << bits
    pts = [(float(x), float(y)) for x in range(n) for y in range(n)]
    df = spark.createDataFrame(pts, "x double, y double")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.withColumn("z", zorder_key(df, ["x", "y"], bits=bits)).collect()
    }
    # width_bucket over [0, 15] with 16 buckets: value v lands in
    # bucket floor(v * 16/15), clamped — recompute identically
    for (x, y), z in got.items():
        bx = min(int(x * n / (n - 1)), n - 1)
        by = min(int(y * n / (n - 1)), n - 1)
        assert z == _morton(bx, by, bits), (x, y)


def test_zorder_key_validation(spark):
    df = spark.range(4).select(F.col("id").cast("double").alias("x"))
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key(df, [])
    with pytest.raises(ValueError, match="exceeds long range"):
        zorder_key(df, ["x"], bits=63)
    # constant / all-null columns degrade to bucket 0, never error
    const = df.withColumn("c", F.lit(1.0)).withColumn("z", F.lit(None).cast("double"))
    rows = const.withColumn("k", zorder_key(const, ["c", "z"], bits=4)).collect()
    assert all(r["k"] == 0 for r in rows)


def test_quantile_boundaries_balance_skewed_column(spark):
    """Rank-space buckets via explicit boundaries: a power-law column
    spreads across buckets instead of collapsing into one."""
    df = spark.range(1000).select(
        (F.col("id") * F.col("id")).cast("double").alias("v")  # skewed
    )
    bs = df.stat.approxQuantile("v", [i / 16 for i in range(1, 16)], 0.001)
    keyed = df.withColumn(
        "z", zorder_key(df, ["v"], bits=4, boundaries={"v": bs})
    )
    n_buckets = keyed.select(F.countDistinct("z")).collect()[0][0]
    assert n_buckets >= 14  # ~16 rank-buckets, not 1-2 width-buckets


def test_zorder_layout_prunes_on_both_columns(spark, tmp_path):
    """The pruning payoff, measured: with 16 output files over two
    independent columns, the mean per-file min/max spread must be
    small on BOTH columns, where a plain sort by x leaves y's per-file
    spread at ~the full range (no pruning possible on y)."""
    n = 4096
    df = spark.range(n).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double").alias("x"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("double").alias("y"),
    )

    def mean_spreads(path):
        spreads = {"x": [], "y": []}
        for f in glob.glob(os.path.join(path, "part-*.parquet")):
            row = (
                spark.read.parquet(f)
                .agg(
                    (F.max("x") - F.min("x")).alias("sx"),
                    (F.max("y") - F.min("y")).alias("sy"),
                )
                .collect()[0]
            )
            if row["sx"] is not None:
                spreads["x"].append(row["sx"])
                spreads["y"].append(row["sy"])
        return {k: sum(v) / len(v) for k, v in spreads.items()}

    zpath = str(tmp_path / "zorder")
    zorder_layout(df, ["x", "y"], bits=8, num_files=16).write.parquet(zpath)
    z_spread = mean_spreads(zpath)

    xpath = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(xpath)
    x_spread = mean_spreads(xpath)

    # sort-by-x: x prunes (tiny spread), y does not (~full 1000 range)
    assert x_spread["x"] < 150 and x_spread["y"] > 800
    # z-order: BOTH columns prune. 16 files over the z-curve ≈ the 16
    # top-level quads (each 1/4 of both ranges); range-partition
    # boundaries sampled by repartitionByRange can straddle two quads,
    # so a file's worst-case spread is ~2 quads (~500) — the mean must
    # sit clearly under that and FAR under sort-by-x's ~full-range y
    assert z_spread["x"] < 550 and z_spread["y"] < 550
    assert z_spread["y"] < 0.6 * x_spread["y"]
