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


def test_tpch_subquery_shapes_broadcast_not_cartesian(spark):
    """Q2/Q16/Q20/Q22 shapes: dims and key-sets broadcast; no
    CartesianProduct anywhere (the one-row scalar joins must plan as
    BroadcastNestedLoopJoin, not a shuffled cartesian)."""
    for name in [
        "min_cost_supplier",
        "brand_supplier_counts",
        "heavy_part_suppliers",
        "rich_idle_customers",
    ]:
        p = plan_of(spark, name)
        assert "CartesianProduct" not in p, f"{name}: cartesian product"
        assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p, (
            f"{name}: nothing broadcast"
        )


def test_scalar_subquery_joins_are_single_row_broadcasts(spark):
    """Q11/Q15/Q22: the scalar-aggregate side joins as a broadcast
    (one row), never a SortMergeJoin."""
    for name in ["part_value_share", "top_revenue_supplier", "rich_idle_customers"]:
        p = plan_of(spark, name)
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p, name


def test_sole_latest_shipper_windows_share_one_exchange(spark):
    """Q21 shape: the two window passes run on ONE orderkey exchange
    (nested window funcs must not re-shuffle)."""
    p = plan_of(spark, "sole_latest_shipper")
    lines = p.splitlines()
    n_window = sum(1 for ln in lines if ln.strip().startswith("(") and "Window" in ln and "WindowGroupLimit" not in ln)
    n_exchange = sum(1 for ln in lines if ln.strip().startswith("(") and "Exchange" in ln)
    assert n_window == 2
    assert n_exchange <= 3  # agg grain + window re-distribution + final tiny agg


def test_window_family_single_shuffle(spark):
    """Per-user window queries: one user_id exchange, no extra sort
    shuffles; the two global-window queries run at user grain."""
    for name in [
        "moving_avg_value",
        "hourly_range_sum",
        "event_neighbors",
        "locf_last_purchase",
    ]:
        p = plan_of(spark, name)
        n_exchange = sum(
            1
            for ln in p.splitlines()
            if ln.strip().startswith("(") and "Exchange" in ln
        )
        assert n_exchange == 1, f"{name}: expected exactly 1 exchange"


def test_grouping_sets_single_expand(spark):
    """ROLLUP/CUBE/GROUPING SETS all plan as one Expand + one agg
    exchange — never one scan per grain."""
    for name in ["revenue_rollup", "status_priority_cube", "status_priority_sets"]:
        p = plan_of(spark, name)
        assert p.count("Expand") >= 1, name
    # the single-table grain queries must read their table ONCE
    # (explain prints each node twice: tree line + detail block)
    for name in ["status_priority_cube", "status_priority_sets"]:
        p = plan_of(spark, name)
        scans = sum(
            1 for ln in p.splitlines() if ln.strip().startswith("(") and "Scan parquet" in ln
        )
        assert scans == 1, f"{name}: {scans} scans (grains must share one)"


def test_regex_extracts_shuffle_free(spark):
    p = plan_of(spark, "regex_extracts")
    assert "Exchange" not in p


def test_media_queries_bytes_stay_jvm_side(spark):
    """K5 catalog queries: no Python/Arrow eval in the plan — binary
    digests and lengths are JVM built-ins."""
    for name in ["media_inventory", "media_dedup_groups"]:
        p = plan_of(spark, name)
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p, name


def _exchange_count(plan: str) -> int:
    import re

    return len(
        [l for l in plan.splitlines() if re.match(r"^\(\d+\) Exchange", l.strip())]
    )


def test_substring_dup_share_single_gram_exchange(spark):
    """The uniq-subtract form (r06): the gram set crosses the wire
    EXACTLY once (gram-key count+min aggregate) and the gram array is
    exploded exactly once — per-doc dup counts are derived as
    n_grams − n_uniq via a doc-grain join, never a gram-grain
    join-back (the old form re-exploded the grams as a broadcast-join
    probe: 58.6 s vs 44.4 s at 1M docs). 2 exchanges total (gram key
    + unique-count doc key); a third means the gram set is being
    shuffled twice again."""
    import re

    plan = plan_of(spark, "substring_dup_share")
    # r11: the conditional widen_narrow_scan prepends a ROUND-ROBIN
    # input exchange (statically duplicated into both consumers,
    # runtime-deduped by ReuseExchange) — the invariant this test
    # protects is about KEYED shuffles of the gram set, so count only
    # hash-partitioned exchanges
    hash_exchanges = [
        l
        for l in plan.splitlines()
        if l.strip().startswith("Arguments: hashpartitioning")
    ]
    assert len(hash_exchanges) == 2, plan
    gen_nodes = [
        l
        for l in plan.splitlines()
        if re.match(r"^\(\d+\) Generate", l.strip())
    ]
    assert len(gen_nodes) == 1, plan


def test_m4_downsample_single_exchange_partial_agg(spark):
    """M4 is one aggregation pass: exactly one exchange, with a partial
    (map-side) aggregate below it — the mixed min/max + min_by agg
    compiles to SortAggregate (imperative min_by buffer), but partial
    combine still collapses rows to bucket grain before the shuffle,
    and no Window node appears."""
    plan = plan_of(spark, "m4_downsample")
    assert _exchange_count(plan) == 1, plan
    assert plan.count("SortAggregate") >= 2 or plan.count("HashAggregate") >= 2
    assert "Window" not in plan, plan


def test_triangle_count_materializes_edges_once(spark):
    """The oriented edge list is localCheckpoint-ed, so the final
    triangle plan references scans of the checkpoint, not three
    rebuilds of the dedupe+degree+orient pipeline (was 37 exchanges)."""
    plan = plan_of(spark, "item_triangles")
    assert _exchange_count(plan) <= 2, plan


def test_span_dedup_trim_gram_exchange_shuffles_once_at_runtime(spark):
    """The r07 probe-restricted form computes the gram-key (count, min)
    aggregate for TWO consumers — the duplicated-key join build and the
    docs-holding-dup-keys probe restriction — but the position-grain
    gram exchange must cross the wire ONCE: both branches compile to
    identical partial-agg subtrees (the vacuous min-isNotNull predicate
    pins min(id) into the dup-keys branch against column pruning), so
    AQE's ReuseExchange serves the second consumer from the first's
    shuffle. Runtime check (reuse is applied at stage materialization,
    not visible in the static plan)."""
    df = entry_mod.queries()["span_dedup_trim"](spark, SF)
    # the vacuous predicate must SURVIVE optimization — a future
    # Catalyst that constant-folds IsNotNull(min(non-nullable)) would
    # silently split the exchange back in two; assert the cause here
    # so the exchange-count assert below points at a real regression
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "isnotnull(__d0" in optimized, (
        "the vacuous __d0 IsNotNull pin was optimized away\n" + optimized
    )
    # collect() finalizes df's own AQE plan — one execution is enough
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    import re

    gram_exchanges = [
        ln
        for ln in final.splitlines()
        if re.search(r"\bExchange hashpartitioning\(gkey", ln)
        and "ReusedExchange" not in ln
    ]
    assert len(gram_exchanges) == 1, final
    assert "ReusedExchange" in final, final


def test_share_and_trim_gram_exchange_shuffles_once_at_runtime(spark):
    """The FUSED share+trim (r10) inherits the span_dedup_trim pin: its
    gram-key aggregate feeds two in-plan consumers (duplicated-keys
    build + probe restriction) but the position-grain exchange must
    cross the wire once, served to the second consumer by
    ReuseExchange. This pin is what makes the funnel fusion a real
    saving — if the exchange split back in two, the fused action would
    quietly pay the gram aggregate twice again."""
    df = entry_mod.queries()["share_and_trim"](spark, SF)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "isnotnull(__d0" in optimized, (
        "the vacuous __d0 IsNotNull pin was optimized away\n" + optimized
    )
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    final = final.split("== Initial Plan ==")[0]
    import re

    gram_exchanges = [
        ln
        for ln in final.splitlines()
        if re.search(r"\bExchange hashpartitioning\(gkey", ln)
        and "ReusedExchange" not in ln
    ]
    assert len(gram_exchanges) == 1, final
    assert "ReusedExchange" in final, final


def test_curate_spans_funnel_uses_fused_operator(spark):
    """Wiring pin for the r10 fusion: curate_documents(span_trim=True)
    must run ONE substring_share_and_trim (one action pays the gram
    work once) and must NOT call the standalone share or trim
    operators — the r07–r09 two-stage form paid the corpus-grain
    gram-key aggregate once per stage across the `near` checkpoint."""
    from unittest import mock

    from pyspark.sql import functions as F

    from post_modern_stack_spark.operators import textstats
    from post_modern_stack_spark.registry import load_table

    docs = load_table(spark, SF, "documents")
    bench = docs.limit(2)
    with mock.patch.object(
        textstats,
        "substring_share_and_trim",
        wraps=textstats.substring_share_and_trim,
    ) as fused, mock.patch.object(
        textstats, "substring_dup_share", wraps=textstats.substring_dup_share
    ) as share, mock.patch.object(
        textstats,
        "remove_duplicate_spans",
        wraps=textstats.remove_duplicate_spans,
    ) as trim:
        stages = textstats.curate_documents(docs, bench, span_trim=True)
        fused.assert_called_once()
        share.assert_not_called()
        trim.assert_not_called()
        assert stages["final"].count() > 0
        # the non-span funnel keeps the share-only derivation (no
        # positional join when nothing needs positions)
        fused.reset_mock()
        textstats.curate_documents(docs, bench, span_trim=False)
        fused.assert_not_called()
        share.assert_called_once()


def test_gram_queries_never_reslice_an_inline_split(spark):
    """Token-projection regression guard for the r07 3.5× gram-stage
    fix: a slicing lambda over an inline split() re-runs the split per
    gram under interpreted HOF eval. The hygiene sweep covers the whole
    catalog; this pins the named gram queries with a clearer failure."""
    for name in [
        "substring_dup_share",
        "span_dedup_trim",
        "contamination_pairs",
        "doc_chunks",
        "minhash_candidates",
        "jaccard_pairs",
        "jaccard_pairs_prefix",
    ]:
        p = plan_of(spark, name)
        assert "slice(split(" not in p, f"{name} re-slices an inline split"


def test_shingle_stream_builds_array_once(spark):
    """r08 regression guard for the r07 shingle-family 2–2.8× slip:
    size+explode of an INLINE shingle expression built the array twice
    per row. The fixed form projects the array as an alias and uses
    explode_outer (InferFiltersFromGenerate skips outer generates, so
    no inferred size()>0 filter gets re-inlined below the token
    projection — SPARK-36715). Pin: exactly one array_distinct build
    in the stream's optimized plan, none inside a Filter."""
    from pyspark.sql import functions as F
    from post_modern_stack_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = dedup.shingle_stream(docs)
    plan = sh._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("array_distinct") == 1, plan
    filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln]
    assert not any("array_distinct" in ln for ln in filter_lines), plan
    # and the catalog consumers: the logical plan repeats the stream
    # subtree per use, so the invariant is one build per Generate
    # (explode) node — a second build per stream would double the count
    for name in ["jaccard_pairs", "jaccard_pairs_prefix"]:
        df = entry_mod.queries()[name](spark, SF)
        qplan = df._jdf.queryExecution().optimizedPlan().toString()
        import re

        n_generates = sum(
            1 for ln in qplan.splitlines() if re.match(r"^[:+\-| ]*Generate ", ln)
        )
        assert qplan.count("array_distinct") == n_generates, (
            f"{name}: {qplan.count('array_distinct')} shingle-array builds "
            f"for {n_generates} explodes — a stream is building twice\n{qplan}"
        )
