"""Scale-idiom tests: salted aggregation correctness under synthetic
skew, and bucketed-join plans with zero exchanges.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from post_modern_stack_spark.operators import skew
from post_modern_stack_spark.registry import load_table
from post_modern_stack_spark.sources import layout

SF = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    """Skewed input (one hot key = 90% of rows): salted two-phase agg
    must equal the plain groupBy exactly."""
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            (F.col("id") % 7).cast("string")
        ).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    plain = {
        (r["k"]): (r["s"], r["n"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"])
        for r in skew.salted_aggregate(df, ["k"], sums={"v": "s"}).collect()
    }
    assert salted == plain


def test_salted_ordered_collect_matches_plain(spark):
    from post_modern_stack_spark.functions import ordered_collect

    ev = load_table(spark, SF, "events").select("user_id", "ts_ns", "event_id", "value")
    plain = {
        r["user_id"]: r["arr"]
        for r in ev.groupBy("user_id")
        .agg(ordered_collect("value", "ts_ns", "event_id").alias("arr"))
        .collect()
    }
    salted = {
        r["user_id"]: r["arr"]
        for r in skew.salted_ordered_collect(
            ev, ["user_id"], "value", ["ts_ns", "event_id"]
        ).collect()
    }
    assert salted == plain


def test_bucketed_join_has_no_exchange(spark):
    """Two tables bucketed on the join key: the join plan must contain
    no Exchange (the 100 TB co-location payoff). Managed tables land in
    the session warehouse dir (./spark-warehouse, gitignored) and are
    dropped afterwards."""
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    layout.write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    layout.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        ["o_orderkey"],
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = layout.bucketed_join_ready(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # and it computes the right thing
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
