"""Physical-plan regression tests: the scale-critical plan shapes
(SURVEY.md §4) must hold — pushdown reaching scans, broadcast joins on
dimensions, map-side top-K pruning, shuffle-free narrow pipelines.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = entry_mod.queries()[name](spark, SF)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pricing_summary_pushdown_and_partial_agg(spark):
    p = plan_of(spark, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # partial+final pair around one exchange
    assert p.count("HashAggregate") >= 2
    # column pruning: unneeded columns (l_orderkey etc.) absent from scan
    read = [ln for ln in p.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read and "l_partkey" not in read


def test_dimension_joins_broadcast(spark):
    for name in ["top_customers", "regional_revenue", "brand_revenue",
                 "shipping_priority", "returned_items_by_nation"]:
        p = plan_of(spark, name)
        assert "BroadcastHashJoin" in p, f"{name}: dimension join not broadcast"
        assert "SortMergeJoin" not in p, f"{name}: unexpected SMJ"


def test_latest_event_uses_window_group_limit(spark):
    p = plan_of(spark, "latest_event_per_user")
    # top-1 pruned map-side before the shuffle AND after
    assert p.count("WindowGroupLimit") >= 2


def test_sessionize_filter_pushed_and_single_agg_shuffle(spark):
    p = plan_of(spark, "sessionize")
    assert "In(event_type, [click,purchase,view])" in p
    # exactly one hash-agg exchange (groupBy user_id) + the final sort
    exchanges = [ln for ln in p.splitlines() if ln.strip().startswith("(") and "Exchange" in ln]
    assert len(exchanges) <= 2


def test_text_stats_is_shuffle_free(spark):
    p = plan_of(spark, "text_stats")
    assert "Exchange" not in p  # pure projection pipeline


def test_top_value_dims_is_shuffle_free(spark):
    p = plan_of(spark, "top_value_dims")
    assert "Exchange" not in p  # per-row top-K without explode/shuffle


def test_top_k_cosine_broadcasts_queries(spark):
    p = plan_of(spark, "top_k_cosine")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "WindowGroupLimit" in p  # k pruned before full sort
