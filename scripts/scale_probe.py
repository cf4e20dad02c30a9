"""Scale probe: synthesize N-row event tables (deterministic, driver-
testdata-shaped) and time the heavy operators across a 10× ladder to
verify near-linear scaling of the chosen plans (SURVEY.md §6 posture:
the goal is 100 TB behavior, not sf0.1 wall-clock).

    python scripts/scale_probe.py [--rows 1000000 10000000] [--users-frac 0.001]

Writes nothing outside /tmp. Prints one JSON line per (rows, query).
"""

from __future__ import annotations

import argparse
import json
import re
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def synthesize(spark, n_rows: int, n_users: int, path: str) -> str:
    """Events-shaped table: monotonically increasing ns timestamps,
    hash-scattered users, JSON props — written as parquet so probes
    include scan cost."""
    df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("event_id"),
            (F.lit(1_700_000_000_000_000_000) + F.col("id") * 1_000_000).alias("ts"),
            F.pmod(F.xxhash64("id"), F.lit(n_users)).alias("user_id"),
            F.element_at(
                F.array(*[F.lit(x) for x in ["view", "click", "purchase", "signup", "error"]]),
                (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) + 1).cast("int"),
            ).alias("event_type"),
            (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)) / 100.0).alias("value"),
            F.concat(
                F.lit('{"k": '), F.pmod(F.xxhash64("id", F.lit(3)), F.lit(100)), F.lit("}")
            ).alias("props"),
        )
    )
    df.write.mode("overwrite").parquet(path)
    return path


def probe_queries(spark, path: str):
    """The shuffle/window/agg-heavy subset, rebuilt on the synthetic
    table (registry-compatible columns)."""
    from post_modern_stack_spark.functions import json_get, ordered_collect

    def load():
        df = spark.read.parquet(path)
        return (
            df.withColumnRenamed("ts", "ts_ns")
            .withColumn("ts", F.expr("timestamp_micros(ts_ns DIV 1000)"))
            .withColumn("ts_ms", F.expr("ts_ns DIV 1000000"))
        )

    def sessionize():
        ev = load()
        return (
            ev.filter(F.col("event_type").isin("view", "click", "purchase"))
            .select("user_id", "event_id", "ts_ns", "ts", json_get("props", "k", "long").alias("k"))
            .groupBy("user_id")
            .agg(
                F.to_date(F.min("ts")).alias("session_date"),
                F.count(F.lit(1)).alias("n_events"),
                ordered_collect(F.col("k").cast("string"), "ts_ns", "event_id").alias("interactions"),
            )
            .filter(F.col("n_events") >= 3)
        )

    def latest_per_user():
        from pyspark.sql import Window

        ev = load()
        w = Window.partitionBy("user_id").orderBy(F.desc("ts_ns"), F.desc("event_id"))
        return ev.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
            "user_id", "event_id", "ts_ms"
        )

    def windowed_running():
        from pyspark.sql import Window

        ev = load()
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts_ns", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return ev.select("event_id", "user_id", F.sum("value").over(w).alias("run"))

    def daily_agg():
        ev = load()
        return (
            ev.groupBy("user_id", F.to_date("ts").alias("d"))
            .agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))
        )

    def asof_purchase_view():
        from post_modern_stack_spark.operators.asof import asof_join

        ev = load()
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts_ms", "value"
        )
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("view_id"), "ts_ms"
        )
        return asof_join(
            purchases,
            views,
            on="ts_ms",
            by=["user_id"],
            right_cols=["view_id"],
            right_tie="view_id",
        )

    def range_views_before_purchase():
        from post_modern_stack_spark.operators.rangejoin import interval_join_buckets

        ev = load()
        purchases = ev.filter(F.col("event_type") == "purchase").select(
            "user_id", "event_id", "ts_ms"
        )
        views = ev.filter(F.col("event_type") == "view").select(
            "user_id", F.col("event_id").alias("view_id"), F.col("ts_ms").alias("view_ms")
        )
        return (
            interval_join_buckets(
                purchases,
                views,
                by=["user_id"],
                left_time="ts_ms",
                right_time="view_ms",
                lookback=3_600_000,
            )
            .groupBy("event_id")
            .agg(F.count(F.lit(1)).alias("n_views"))
        )

    def moving_avg():
        from pyspark.sql import Window

        ev = load()
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts_ns", "event_id")
            .rowsBetween(-2, Window.currentRow)
        )
        return ev.select("event_id", F.avg("value").over(w).alias("mov_avg"))

    def exact_dedup_props():
        # K1 at fact scale: digest-grouped dedup (props plays the text role)
        ev = load()
        return (
            ev.groupBy(F.sha2(F.col("props").cast("binary"), 256).alias("sha"))
            .agg(F.min("event_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
        )

    def salted_join_agg():
        # hot-key join: 20% of fact rows remapped onto user 0, then a
        # per-user dim joined via salted_join — the case a plain
        # shuffle join serializes onto one reducer
        from post_modern_stack_spark.operators.skew import salted_join

        ev = load().withColumn(
            "user_id",
            F.when(F.col("event_id") % 5 == 0, F.lit(0)).otherwise(F.col("user_id")),
        )
        dim = (
            load()
            .select("user_id")
            .distinct()
            .withColumn("segment", F.pmod("user_id", F.lit(7)))
        )
        return salted_join(
            ev.select("user_id", "value"), dim, on="user_id", buckets=16
        ).groupBy("segment").agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("n"))

    def cdc_apply():
        from post_modern_stack_spark.operators.cdc import apply_cdc

        ev = load()
        snap = ev.select("event_id", "user_id", "value", F.lit(0).alias("seq"))
        chg = (
            ev.filter(F.col("event_id") % 3 == 0)
            .select(
                "event_id",
                "user_id",
                (F.col("value") + 1.0).alias("value"),
                F.lit(1).alias("seq"),
                F.when(F.col("event_id") % 9 == 0, F.lit("D"))
                .otherwise(F.lit("U"))
                .alias("op"),
            )
        )
        return apply_cdc(snap, chg, ["event_id"], "seq")

    def scd2_runs():
        from post_modern_stack_spark.operators.cdc import scd2_intervals

        return scd2_intervals(load(), ["user_id"], "event_type", "ts_ns", ["event_id"])

    def sliding_distinct_users():
        # hourly_active_users shape: collect_set over a RANGE frame.
        # SCALE FINDING (this probe, first run): collect_set is a
        # non-invertible aggregate, so Spark recomputes the frame per
        # row -> O(n x frame_rows). On this 1 ms-spaced synthetic
        # timeline a 1-hour frame holds 3.6M rows and the query is
        # effectively quadratic (never finished at 1M rows). The probe
        # therefore pins frame density (~100 rows/frame) to measure
        # the linear regime; unbounded-density gauges must use the
        # HLL-sketch rollup (daily_sketch_rollup) instead — that is
        # the documented 100 TB path in the catalog query.
        from pyspark.sql import Window

        ev = load()
        w = (
            Window.partitionBy("event_type")
            .orderBy("ts_ms")
            .rangeBetween(-100, Window.currentRow)
        )
        return ev.select(
            "event_id",
            "event_type",
            F.size(F.collect_set("user_id").over(w)).alias("active_users"),
        )

    def group_sample_bottomk():
        # deterministic_group_sample shape: WindowGroupLimit must prune
        # per-partition before the final per-group merge (no full sort
        # of the fact table)
        from pyspark.sql import Window

        ev = load()
        w = Window.partitionBy("event_type").orderBy(
            F.md5(F.col("event_id").cast("string")), "event_id"
        )
        return (
            ev.select("event_type", "event_id")
            .withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 5)
        )

    def basket_pairs():
        # co_ordered_part_pairs shape on (user, day) baskets with the
        # hot-basket cap applied (slice to 20 items) — the documented
        # remedy for power-law baskets
        from post_modern_stack_spark.functions import json_get

        ev = load().select(
            "user_id",
            F.expr("ts_ns DIV 86400000000000").alias("day"),
            json_get("props", "k", "long").alias("k"),
        )
        baskets = ev.groupBy("user_id", "day").agg(
            F.slice(F.array_sort(F.collect_set("k")), 1, 20).alias("parts")
        )
        pairs = baskets.select(
            F.explode(
                F.flatten(
                    F.expr(
                        """
                        transform(parts, (x, i) ->
                            transform(slice(parts, i + 2, size(parts)), y ->
                                struct(x AS a, y AS b)))
                        """
                    )
                )
            ).alias("p")
        )
        return (
            pairs.groupBy("p.a", "p.b")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= 2)
        )

    def pagerank_transitions():
        # item-transition PageRank, 3 iterations, 100k-item domain —
        # the iterative join+agg pattern with bounded-catalog broadcast
        from pyspark.sql import Window

        from post_modern_stack_spark.operators.graph import pagerank

        ev = load().select(
            "user_id", "ts_ns", "event_id",
            F.pmod(F.xxhash64("props"), F.lit(100_000)).alias("item"),
        )
        w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        edges = (
            ev.withColumn("nxt", F.lead("item").over(w))
            .filter(F.col("nxt").isNotNull() & (F.col("item") != F.col("nxt")))
            .select(F.col("item").alias("src"), F.col("nxt").alias("dst"))
        )
        return pagerank(edges, iters=3, broadcast_ranks=True)

    def rolling_zscore():
        # the shipped integer-exact form (catalog_windows
        # rolling_zscore_anomalies): frame sums of cents + cents²,
        # membership via 3·D² > 14·M — two integer SUM frames replace
        # avg+stddev_samp float frames
        from pyspark.sql import Window

        from post_modern_stack_spark.functions.core import cents

        ev = load()
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts_ns", "event_id")
            .rowsBetween(-6, Window.currentRow)
        )
        c0 = cents("value")
        scored = ev.select(
            "event_id", "user_id", "value",
            F.count(F.lit(1)).over(w).alias("n_frame"),
            F.sum(c0).over(w).alias("s1"),
            F.sum(c0 * c0).over(w).alias("s2"),
            c0.alias("c0"),
        ).filter(F.col("n_frame") == 7)
        exact = scored.select(
            "event_id", "user_id", "value",
            (7 * F.col("c0") - F.col("s1")).alias("d"),
            (7 * F.col("s2") - F.col("s1") * F.col("s1")).alias("m"),
            "s1",
        )
        z = (F.col("value") - F.col("s1") / 700.0) / F.sqrt(F.col("m") / 420000.0)
        return exact.filter(
            (F.col("m") > 0) & (3 * F.col("d") * F.col("d") > 14 * F.col("m"))
        ).select("event_id", "user_id", "value", F.round(z, 4).alias("z"))

    def winsorize_by_type():
        ev = load()
        th = ev.groupBy("event_type").agg(
            F.percentile("value", F.lit(0.05)).alias("p05"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        clipped = F.least(F.greatest(F.col("value"), F.col("p05")), F.col("p99"))
        return (
            ev.join(F.broadcast(th), "event_type")
            .groupBy("event_type")
            .agg(F.avg("value").alias("avg_raw"), F.avg(clipped).alias("avg_w"))
        )

    def histogram_20bin():
        ev = load()
        bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        return (
            ev.crossJoin(F.broadcast(bounds))
            .select(
                F.least(
                    F.floor((F.col("value") - F.col("lo"))
                            / (F.col("hi") - F.col("lo")) * 20),
                    F.lit(19),
                ).alias("bin")
            )
            .groupBy("bin")
            .count()
        )

    def m4_downsample():
        ev = load()
        ordk = (
            F.col("ts_ns").cast("decimal(38,0)") * F.lit(1_000_000_000_000)
            + F.col("event_id")
        )
        return (
            ev.select(
                "event_type",
                (F.col("ts_ms") / F.lit(3600000)).cast("bigint").alias("bucket"),
                "value",
                ordk.alias("ord"),
            )
            .groupBy("event_type", "bucket")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("value").alias("v_min"),
                F.max("value").alias("v_max"),
                F.min_by("value", "ord").alias("v_first"),
                F.max_by("value", "ord").alias("v_last"),
            )
        )

    def mode_per_user():
        ev = load()
        counts = ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return counts.groupBy("user_id").agg(
            F.min_by(
                F.struct("event_type", "cnt"),
                F.struct((-F.col("cnt")).alias("neg"), F.col("event_type")),
            ).alias("m")
        )

    def item_triangles():
        from pyspark.sql import Window

        from post_modern_stack_spark.operators.graph import triangle_count

        ev = load().select(
            "user_id", "ts_ns", "event_id",
            F.pmod(F.xxhash64("props"), F.lit(100_000)).alias("item"),
        )
        w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        edges = (
            ev.withColumn("nxt", F.lead("item").over(w))
            .filter(F.col("nxt").isNotNull() & (F.col("item") != F.col("nxt")))
            .select(F.col("item").alias("src"), F.col("nxt").alias("dst"))
        )
        return triangle_count(edges)

    def ks_statistic():
        from pyspark.sql import Window

        ev = load()
        s = ev.filter(F.col("event_type").isin("click", "view")).select(
            "value", (F.col("event_type") == "click").cast("long").alias("g")
        )
        per_value = s.groupBy("value").agg(
            F.sum("g").alias("d1"), F.sum(1 - F.col("g")).alias("d2")
        )
        wr = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
        ecdf = per_value.select(
            F.sum("d1").over(wr).alias("c1"), F.sum("d2").over(wr).alias("c2")
        )
        tot = per_value.agg(F.sum("d1").alias("n1"), F.sum("d2").alias("n2"))
        return ecdf.crossJoin(F.broadcast(tot)).agg(
            F.max(F.abs(F.col("c1") / F.col("n1") - F.col("c2") / F.col("n2"))).alias("d")
        )

    def twap_per_user():
        from pyspark.sql import Window

        ev = load()
        seq = ev.select(
            "user_id", "value", F.col("ts_ms").alias("t"), "event_id"
        ).withColumn(
            "t_next",
            F.lead("t").over(Window.partitionBy("user_id").orderBy("t", "event_id")),
        )
        dur = F.col("t_next") - F.col("t")
        return (
            seq.filter(F.col("t_next").isNotNull() & (dur > 0))
            .groupBy("user_id")
            .agg((F.sum(F.col("value") * dur) / F.sum(dur)).alias("twap"))
        )

    return {
        "sessionize": sessionize,
        "latest_per_user": latest_per_user,
        "windowed_running": windowed_running,
        "daily_agg": daily_agg,
        "asof_purchase_view": asof_purchase_view,
        "range_views_before_purchase": range_views_before_purchase,
        "moving_avg": moving_avg,
        "exact_dedup_props": exact_dedup_props,
        "salted_join_agg": salted_join_agg,
        "cdc_apply": cdc_apply,
        "scd2_runs": scd2_runs,
        "sliding_distinct_users": sliding_distinct_users,
        "group_sample_bottomk": group_sample_bottomk,
        "basket_pairs": basket_pairs,
        "pagerank_transitions": pagerank_transitions,
        "rolling_zscore": rolling_zscore,
        "m4_downsample": m4_downsample,
        "mode_per_user": mode_per_user,
        "item_triangles": item_triangles,
        "ks_statistic": ks_statistic,
        "twap_per_user": twap_per_user,
        "winsorize_by_type": winsorize_by_type,
        "histogram_20bin": histogram_20bin,
    }


def synthesize_docs(spark, n_docs: int, path: str) -> str:
    """Documents-shaped table: deterministic pseudo-text (40-word
    vocabulary, 30-80 tokens/doc, ~1% exact duplicates) written as
    parquet so text probes include scan cost."""
    vocab = (
        "key agg row scan slow fast table value part hash merge batch "
        "spark line sort window the a of and to in big small filter "
        "data column join customer query order group vector stream "
        "cache disk node task"
    ).split()
    words = F.array(*[F.lit(w) for w in vocab])
    n_vocab = len(vocab)
    n_tok = (F.pmod(F.xxhash64("id"), F.lit(51)) + 30).cast("int")
    # ~2% of docs are exact duplicates of their neighbor (PAIR groups —
    # one giant shared-seed group would be a quadratic LSH-bucket
    # artifact real pipelines remove with exact dedup first)
    seed = F.when(
        F.pmod(F.xxhash64("id", F.lit(9)), F.lit(50)) == 0, F.col("id") - 1
    ).otherwise(F.col("id"))
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.element_at(
            words, (F.pmod(F.xxhash64(seed, i), F.lit(n_vocab)) + 1).cast("int")
        ),
    )
    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", toks).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), F.pmod("id", F.lit(20)).cast("string")).alias("source"),
    )
    df.withColumn("n_chars", F.length("text")).write.mode("overwrite").parquet(path)
    return path


def probe_text_queries(spark, path: str):
    """Text/dedup-family probes over the synthetic documents table."""
    from post_modern_stack_spark.operators import dedup, textstats

    def load():
        return spark.read.parquet(path)

    return {
        "doc_chunking": lambda: textstats.chunk_documents(load()),
        "exact_dedup_text": lambda: dedup.exact_dedup(load()),
        "minhash_candidates": lambda: dedup.minhash_lsh_candidates(load()),
        "contamination": lambda: textstats.contamination_pairs(
            load().filter(F.col("doc_id") % 10 != 0),
            load().filter(F.col("doc_id") % 10 == 0),
        ),
        "text_stats": lambda: textstats.text_stats(load()),
        "substring_dup_share": lambda: textstats.substring_dup_share(load(), n=8),
        "span_trim": lambda: textstats.remove_duplicate_spans(load(), n=8),
        # r10 fusion: one positional resolution yields share AND trim —
        # compare against substring_dup_share + span_trim run separately
        "share_and_trim": lambda: textstats.substring_share_and_trim(
            load(), n=8
        ),
        "unigram_logprob": lambda: textstats.unigram_logprob(load()),
        "bigram_perplexity": lambda: textstats.bigram_perplexity(load()),
        "sorted_neighborhood": lambda: textstats.sorted_neighborhood_pairs(load()),
        "token_budget_plain": lambda: textstats.token_budget_keep_ids(
            load().select(
                "doc_id",
                F.size(F.split(F.col("text"), r"\s+")).alias("__nt"),
            ),
            0.5,
        ),
        "token_budget_chunked": lambda: textstats.token_budget_keep_ids(
            load().select(
                "doc_id",
                F.size(F.split(F.col("text"), r"\s+")).alias("__nt"),
            ),
            0.5,
            chunked=True,
        ),
        "curation_final": lambda: textstats.curate_documents(
            load().filter(F.col("doc_id") % 97 != 0),
            load().filter(F.col("doc_id") % 97 == 0),
        )["final"],
        "curation_final_spans": lambda: textstats.curate_documents(
            load().filter(F.col("doc_id") % 97 != 0),
            load().filter(F.col("doc_id") % 97 == 0),
            span_trim=True,
        )["final"],
        # pre-r10 spans funnel (share gate and span trim as SEPARATE
        # actions over the gram-key aggregate, recompute route) — kept
        # as the same-window A/B twin quantifying the r10 fusion
        "curation_final_spans_unfused": lambda: _unfused_spans_funnel(
            load().filter(F.col("doc_id") % 97 != 0),
            load().filter(F.col("doc_id") % 97 == 0),
        ),
        "jaccard_pairs": lambda: dedup.jaccard_pairs(
            _wide_vocab_docs(load()), min_jaccard=0.5
        ),
        "jaccard_pairs_inline2x": lambda: _jaccard_pairs_inline2x(
            _wide_vocab_docs(load()), min_jaccard=0.5
        ),
        "jaccard_pairs_prefix": lambda: dedup.jaccard_pairs_prefix(
            _wide_vocab_docs(load()), min_jaccard=0.5
        ),
        # r09 skew routing: auto must match plain's time here (wide
        # vocab = mostly-unique shingles, where r08 measured prefix
        # 3.4x worse) and take prefix+arrays on the hot-header corpus
        # (where the plain join never finished at 10k docs)
        "jaccard_pairs_auto": lambda: dedup.jaccard_pairs_auto(
            _wide_vocab_docs(load()), 0.5
        ),
        "jaccard_auto_hot": lambda: dedup.jaccard_pairs_auto(
            _hot_header_docs(load()), 0.5
        ),
        "jaccard_prefix_streamverify_hot": lambda: dedup.jaccard_pairs_prefix(
            _hot_header_docs(load()), 0.5, verify="stream"
        ),
        # r09 candidate-bound verify in the full LSH dedup pipeline
        # (candidates -> exact verify -> connected components): the
        # _fulljoin twin is the pre-r09 shape (all-pairs jaccard, then
        # semi-filter to candidates), kept to quantify the change
        "lsh_dedup_pipeline": lambda: _lsh_pipeline(load(), old=False),
        "lsh_dedup_pipeline_fulljoin": lambda: _lsh_pipeline(load(), old=True),
        "gopher_rules": lambda: textstats.gopher_rules(load()),
        "bpe_pretokens": lambda: textstats.bpe_pretokens(load()),
        "dsir_weights": lambda: textstats.dsir_weights(
            load(), target_filter=F.col("source") == "src0"
        ),
        "pack_greedy": lambda: _pack_probe(load()),
        "logreg_2iter": lambda: _logreg_probe(load()),
        "semantic_dedup": lambda: _semdedup_probe(spark, load()),
        "semantic_dedup_skewed": lambda: _semdedup_probe(
            spark, load(), skew=True
        ),
        "semantic_dedup_skewed_sharded": lambda: _semdedup_probe(
            spark, load(), skew=True, sharded=True
        ),
        "semantic_dedup_skewed_auto": lambda: _semdedup_probe(
            spark, load(), skew=True, sharded="auto"
        ),
        "training_manifest": lambda: _manifest_probe(load()),
        "top_k_exact_expr": lambda: _topk_probe(spark, load(), arrow=False),
        "top_k_exact_arrow": lambda: _topk_probe(spark, load(), arrow=True),
    }


def _wide_vocab_docs(docs):
    """Re-tokenize the synthetic docs with a 50k pseudo-word vocabulary,
    PRESERVING the ~2% neighbor-duplicate structure (same seed rule as
    synthesize_docs). The 40-word synth vocab makes every 3-gram
    shingle collide corpus-wide — an all-pairs jaccard join over it is
    a quadratic bucket artifact, not a workload; real near-dup corpora
    have mostly-unique shingles, which this models (VERDICT r07 item 7
    asks for jaccard ladder rows)."""
    n_tok = (F.pmod(F.xxhash64("doc_id"), F.lit(51)) + 30).cast("int")
    seed = F.when(
        F.pmod(F.xxhash64("doc_id", F.lit(9)), F.lit(50)) == 0,
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    toks = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(seed, i), F.lit(50_000)).cast("string"),
        ),
    )
    return docs.select("doc_id", F.concat_ws(" ", toks).alias("text"))


def _lsh_pipeline(docs, old: bool):
    """Full corpus-dedup pipeline over the wide-vocab corpus (~2%
    planted neighbor duplicates): MinHash-LSH candidates → exact
    Jaccard ≥ 0.5 → min-label clustering. ``old=True`` replays the
    pre-r09 verify (full all-pairs join, semi-filtered to candidates);
    ``old=False`` is the shipped candidate-bound array verify."""
    from post_modern_stack_spark.operators import dedup as _dd

    d = _wide_vocab_docs(docs)
    cand = _dd.minhash_lsh_candidates(d)
    if old:
        verified = _dd.jaccard_pairs(d, min_jaccard=0.5).join(
            cand.select("id_a", "id_b"), ["id_a", "id_b"], "left_semi"
        )
    else:
        verified = _dd.jaccard_verify_pairs(d, cand, min_jaccard=0.5)
    return _dd.cluster_pairs(verified)


def _unfused_spans_funnel(docs, benchmark):
    """Byte-exact replay of the r07–r09 curate_documents(span_trim=
    True) wiring (git HEAD@r09): share gate and span trim as separate
    actions, per_key on the recompute route (the >2M-doc default), so
    the corpus-grain gram-key aggregate runs once per stage. The r10
    funnel fused the two stages (substring_share_and_trim); this twin
    measures what the fusion saves in the same host window."""
    from pyspark.sql import functions as F

    from post_modern_stack_spark.operators import textstats as ts

    q = ts.quality_score(docs).filter(F.col("quality") >= 0.66)
    quality = docs.join(q.select("doc_id"), "doc_id")
    deduped = ts.exact_keep_min(quality).localCheckpoint()
    per_key = ts.gram_key_counts(deduped, "text", n=8)  # recompute route
    shares = ts.substring_dup_share(deduped, n=8, per_key=per_key)
    near = (
        deduped.join(
            shares.filter(F.col("dup_share") < 0.8).select("doc_id")
            .unionAll(
                deduped.filter(
                    F.size(F.split(F.col("text"), r"\s+")) < 8
                ).select("doc_id")
            ),
            "doc_id",
        )
    ).localCheckpoint()
    trim_info = ts.remove_duplicate_spans(near, n=8, per_key=per_key)
    trimmed = (
        near.withColumnRenamed("text", "__orig")
        .join(
            trim_info.filter(F.col("n_kept") > 0).select(
                "doc_id", "n_tokens", "n_kept", "kept_text"
            ),
            "doc_id",
        )
        .withColumn(
            "text",
            F.when(
                F.col("n_kept") < F.col("n_tokens"), F.col("kept_text")
            ).otherwise(F.col("__orig")),
        )
        .drop("__orig", "n_tokens", "n_kept", "kept_text")
        .localCheckpoint()
    )
    contaminated = (
        ts.contamination_pairs(trimmed, benchmark, n=8)
        .select(F.col("corpus_doc_id").alias("doc_id"))
        .distinct()
    )
    clean = trimmed.join(contaminated, "doc_id", "left_anti").localCheckpoint()
    sizes = clean.select(
        "doc_id", F.size(F.split(F.col("text"), r"\s+")).alias("__nt")
    )
    keep_ids = ts.token_budget_keep_ids(sizes, 0.5, chunked=True)
    return clean.join(keep_ids, "doc_id", "left_semi")


def _hot_header_docs(docs):
    """Hot-shingle regime: every doc opens with the same 12-token
    banner (boilerplate df = corpus size — the stop-word-square case
    prefix filtering exists for) followed by a unique 30-token tail,
    so true Jaccard between any two docs is far below τ and the
    correct output is (nearly) empty while the plain join's fan-out is
    quadratic in corpus size."""
    banner = (
        "this site uses cookies by continuing you agree to the policy "
        "terms apply"
    )
    toks = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.concat(
            F.lit("u"),
            F.col("doc_id").cast("string"),
            F.lit("x"),
            F.pmod(F.xxhash64("doc_id", i), F.lit(10**9)).cast("string"),
        ),
    )
    return docs.select(
        "doc_id",
        F.concat(F.lit(banner + " "), F.concat_ws(" ", toks)).alias("text"),
    )


def _jaccard_pairs_inline2x(df, min_jaccard: float):
    """The r07 form jaccard_pairs shipped with (and r08 removed):
    size()+explode() of an INLINE shingle expression — the
    interpreted-HOF array is built twice per row. Kept here only so
    the ladder can quantify the before/after at scale."""
    from post_modern_stack_spark.operators.dedup import shingles_from_tokens

    sh_arr = shingles_from_tokens(F.col("__toks"), 3)
    sh = (
        df.select(F.col("doc_id"), F.split(F.col("text"), r"\s+").alias("__toks"))
        .select(
            "doc_id",
            F.size(sh_arr).alias("n_sh"),
            F.explode(sh_arr).alias("shingle"),
        )
        .select("doc_id", "n_sh", F.xxhash64("shingle").alias("shingle_h"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle_h") == F.col("b.shingle_h"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


def _topk_probe(spark, docs, arrow: bool):
    """Exact cosine top-5 of 32 queries against a synthetic 32-dim
    corpus: the expression path materializes |corpus|x32 joined rows,
    the mapInArrow path one GEMM per record batch — the ladder row
    quantifies the gap (BASELINE.md round-8)."""
    from post_modern_stack_spark.operators import similarity

    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0),
        ).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 32)
    fn = (
        similarity.brute_force_top_k_arrow
        if arrow
        else similarity.brute_force_top_k
    )
    return fn(emb, queries, k=5)


def _manifest_probe(docs):
    """The full training_manifest chain (catalog q_training_manifest):
    Gopher sub-rules → exact dedup keep-min → per-token DSIR gate →
    A-ES 10-per-source sample → greedy 256-token packing. The 5-stage
    funnel was only measured to 1M docs before (VERDICT r04 item 5)."""
    from post_modern_stack_spark.operators import textstats
    from post_modern_stack_spark.operators.shaping import (
        pack_greedy,
        weighted_sample_per_group,
    )
    from post_modern_stack_spark.operators.textstats import _gopher_metrics

    m = _gopher_metrics("text")
    filtered = docs.filter(m["r_word_count"] & m["r_alpha"] & m["r_mean_word_len"])
    deduped = textstats.exact_keep_min(filtered)
    lw = textstats.dsir_weights(
        docs, target_filter=F.col("source") == "src0"
    ).select("doc_id", "dsir_logratio", F.col("n_tokens").alias("__ntok"))
    surv = (
        deduped.join(lw, "doc_id")
        .filter(F.col("dsir_logratio") >= -0.5 * F.col("__ntok"))
        .select(
            "source",
            "doc_id",
            F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
        )
    )
    sampled = weighted_sample_per_group(surv, k=10, weight_col="n_tokens").select(
        "source", "doc_id", "n_tokens"
    )
    return pack_greedy(sampled, budget=256).select(
        "source", "bin_id", "doc_id", "n_tokens"
    )


def _pack_probe(docs):
    from post_modern_stack_spark.operators.shaping import pack_greedy

    meta = docs.select(
        "source", "doc_id",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
    )
    return pack_greedy(meta, budget=256)


def _logreg_probe(docs):
    """Train on a bounded ~100k-doc sample, score the FULL corpus —
    the production contract (classifiers never train on the whole
    corpus; scoring is the part that must scale)."""
    from post_modern_stack_spark.operators import inference

    sample = docs.filter(F.pmod(F.xxhash64("doc_id", F.lit(7)), F.lit(10)) == 0)
    tfeats = inference.hashed_text_features(sample).localCheckpoint()
    labels = sample.select(
        "doc_id", (F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0).cast("double").alias("y")
    )
    w, b = inference.train_logreg(tfeats, labels, n_iter=2, lr=2.0)
    return inference.score_logreg(inference.hashed_text_features(docs), w, b)


def _semdedup_probe(spark, docs, skew: bool = False, sharded: bool = False):
    """Synthetic 32-dim embeddings, ~1000-member clusters — the
    per-cluster GEMM grain SemDeDup's k is chosen to produce.

    ``skew=True`` routes 10% of the corpus into cluster 0 (a 100k-
    member cluster at 1M docs): the straggler scenario VERDICT r04
    item 5 asks about. The row-blocked GEMM keeps that one task at
    O(block·n) memory; wall-clock is bounded by its O(n²)·dim flops
    in BLAS, which the ladder row quantifies."""
    from post_modern_stack_spark.operators import dedup

    # cluster COUNT scales with corpus so cluster SIZE stays ~1000 —
    # exactly how SemDeDup picks k; a fixed k would grow per-task GEMMs
    # quadratically with corpus size
    n_clusters = max(docs.count() // 1000, 1)
    label = F.pmod(F.xxhash64("doc_id", F.lit(3)), F.lit(n_clusters)).cast("int")
    if skew:
        label = F.when(
            F.pmod(F.xxhash64("doc_id", F.lit(5)), F.lit(10)) == 0, F.lit(0)
        ).otherwise(label)
    emb = docs.select(
        F.col("doc_id").alias("vec_id"),
        label.alias("label"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: (F.pmod(F.xxhash64("doc_id", i), F.lit(1000)) / 500.0 - 1.0),
        ).alias("embedding"),
    )
    if sharded == "auto":
        return dedup.semantic_dedup_auto(emb, threshold=0.8)
    if sharded:
        return dedup.semantic_dedup_sharded(emb, threshold=0.8)
    return dedup.semantic_dedup(emb, threshold=0.8)


def _release_checkpoints(spark) -> None:
    """Unpersist every lingering cached/localCheckpoint RDD between
    probes. Block release normally rides the ASYNC ContextCleaner
    (driver GC → cleanup queue), so consecutive heavy probes in one
    JVM can overlap: the next probe's localCheckpoint allocates while
    the previous probe's dead blocks still hold heap — observed as a
    Java OOM when training_manifest followed curation_final at 10M
    docs in one process (48g heap). Probes are independent, so a
    synchronous sweep between them is always safe here; it would NOT
    be safe inside an operator while its DataFrames are still live."""
    import gc

    gc.collect()  # drop Python-side RDD refs first
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for rdd_id in list(jmap.keySet().toArray()):
        jmap.get(rdd_id).unpersist(True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[1_000_000, 10_000_000])
    ap.add_argument("--users-frac", type=float, default=0.001)
    ap.add_argument("--only", type=str, default=None,
                    help="regex filter on probe names")
    ap.add_argument(
        "--docs",
        type=int,
        nargs="*",
        default=[],
        help="also probe the text family at these documents-table sizes",
    )
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions (default 32 is "
        "sized for bench SFs; 1B-row exploded grains at 10M docs "
        "want corpus-proportional counts — the knob a real cluster "
        "turns)",
    )
    args = ap.parse_args()

    from post_modern_stack_spark.session import get_spark

    spark = get_spark(
        app_name="pmss-scale-probe",
        shuffle_partitions=args.shuffle_partitions,
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="pmss-scale-")
    try:
        for n in args.rows:
            path = f"{base}/events_{n}"
            synthesize(spark, n, max(int(n * args.users_frac), 10), path)
            for name, build in probe_queries(spark, path).items():
                if args.only and not re.search(args.only, name):
                    continue
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                dt = round(time.perf_counter() - t0, 2)
                print(json.dumps({"rows": n, "query": name, "sec": dt}), flush=True)
                _release_checkpoints(spark)
        for n in args.docs:
            path = f"{base}/docs_{n}"
            synthesize_docs(spark, n, path)
            # knob-free default (VERDICT r10 item 5): when no explicit
            # --shuffle-partitions, size the shuffle width from the
            # corpus's exploded-grain estimate — the same policy
            # curate_documents now applies internally — so 10M+ doc
            # ladders run without remembering the knob. An explicit
            # knob still wins (get_spark already applied it).
            from contextlib import nullcontext

            from post_modern_stack_spark.operators.textstats import (
                grain_partitions_hint,
            )
            from post_modern_stack_spark.session import (
                elevated_shuffle_partitions,
            )

            if args.shuffle_partitions is None:
                hint = grain_partitions_hint(spark.read.parquet(path))
                ctx = elevated_shuffle_partitions(spark, hint)
                print(
                    json.dumps({"docs": n, "grain_partitions_hint": hint}),
                    flush=True,
                )
            else:
                ctx = nullcontext()
            with ctx:
                for name, build in probe_text_queries(spark, path).items():
                    if args.only and not re.search(args.only, name):
                        continue
                    t0 = time.perf_counter()
                    build().write.format("noop").mode("overwrite").save()
                    dt = round(time.perf_counter() - t0, 2)
                    print(
                        json.dumps({"docs": n, "query": name, "sec": dt}),
                        flush=True,
                    )
                    _release_checkpoints(spark)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
