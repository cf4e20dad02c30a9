"""operators/profile.summarize — generic single-scan column profiler."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from post_modern_stack_spark.operators.profile import summarize


def test_summarize_values_and_types(spark):
    df = spark.createDataFrame(
        [
            Row(i=10, d=2.5, s="b"),
            Row(i=2, d=None, s="a"),
            Row(i=10, d=-1.25, s=None),
            Row(i=None, d=10.0, s="a"),
        ]
    )
    got = {r["column"]: r for r in summarize(df).collect()}
    assert set(got) == {"i", "d", "s"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["i"]["n_nulls"], got["i"]["n_distinct"]) == (1, 2)
    # min/max on the NATIVE type: 2 < 10 numerically (lexicographic
    # string ordering would say "10" < "2")
    assert (got["i"]["min_s"], got["i"]["max_s"]) == ("2", "10")
    assert (got["d"]["n_nulls"], got["d"]["n_distinct"]) == (1, 3)
    assert float(got["d"]["min_s"]) == -1.25 and float(got["d"]["max_s"]) == 10.0
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (1, 2)
    assert (got["s"]["min_s"], got["s"]["max_s"]) == ("a", "b")


def test_summarize_subset_errors_and_empty(spark):
    df = spark.range(3).select(F.col("id").alias("a"), F.lit("x").alias("b"))
    rows = summarize(df, ["a"]).collect()
    assert [r["column"] for r in rows] == ["a"]
    with pytest.raises(ValueError, match="unknown columns"):
        summarize(df, ["a", "nope"])
    with pytest.raises(ValueError, match="no columns"):
        summarize(df, [])
    # all-null / empty-table edges: counts well-defined, min/max null
    empty = df.filter(F.lit(False))
    r = summarize(empty, ["a"]).collect()[0]
    assert (r["n_rows"], r["n_nulls"], r["n_distinct"]) == (0, 0, 0)
    assert r["min_s"] is None and r["max_s"] is None


def test_summarize_approx_mode(spark):
    """exact=False: HLL distinct counts land within the sketch's error
    band, null/min/max stay exact, and the plan loses the Expand — the
    whole profile becomes one map-side-combined aggregate."""
    df = spark.range(20_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").cast("double").alias("v")
    )
    got = {r["column"]: r for r in summarize(df, exact=False).collect()}
    assert abs(got["k"]["n_distinct"] - 1000) <= 1000 * 0.08  # 5% rsd sketch
    assert abs(got["v"]["n_distinct"] - 20_000) <= 20_000 * 0.08
    assert (got["k"]["min_s"], got["k"]["max_s"]) == ("0", "999")  # still exact
    assert all(r["n_nulls"] == 0 and r["n_rows"] == 20_000 for r in got.values())
    plan = summarize(df, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_summarize_scan_and_operator_shape(spark):
    """Exact mode profiles all columns in exactly TWO aggregate passes
    (r11: one Expand+HashAggregate pass for every countDistinct, one
    streaming keys=[] pass for nulls/min/max — the single combined agg
    forced SortAggregate over the sorted Expand fan-out because
    var-length min/max buffers are not hash-aggregable), never one
    scan per column. The distinct side must stay a HashAggregate and
    the plan must hold no Sort node at all."""
    df = spark.range(1000).select(
        F.col("id").alias("a"),
        (F.col("id") % 7).alias("b"),
        (F.col("id") % 3).cast("string").alias("c"),
    )
    plan = summarize(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") == 1
    assert plan.count("Range (") == 2  # two passes, not per-column
    # the Expand (distinct) side hash-aggregates; nothing sorts
    assert "HashAggregate" in plan
    assert "Sort " not in plan
