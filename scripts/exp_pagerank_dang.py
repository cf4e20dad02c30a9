"""Interleaved A/B for pagerank's observed dangling mass (r12 item 5).

Arms (all broadcast_ranks=True, the catalog setting):
  A  observe_dangling=False, ci=2   (r11 committed behavior)
  B  observe_dangling=True,  ci=2   (literal on post-checkpoint iters)
  C  observe_dangling=True,  ci=1   (literal on every iter > 0)
  D  observe_dangling=True,  ci=3

Prints per-arm samples + medians, and checks 6dp-rounded value parity
of every arm against arm A (the query emits round(rank, 6)).

Usage: python scripts/exp_pagerank_dang.py [rounds]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import Window

from post_modern_stack_spark.operators.graph import pagerank
from post_modern_stack_spark.registry import load_table
from post_modern_stack_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark(app_name="exp-pagerank-dang")
spark.sparkContext.setLogLevel("ERROR")


def edges():
    ev = (
        load_table(spark, SF_DIR, "events")
        .select(
            "user_id",
            "ts_ns",
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("item"),
        )
        .filter(F.col("item").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return (
        ev.withColumn("next_item", F.lead("item").over(w))
        .filter(
            F.col("next_item").isNotNull()
            & (F.col("item") != F.col("next_item"))
        )
        .select(F.col("item").alias("src"), F.col("next_item").alias("dst"))
    )


ARMS = {
    "A_inplan_ci2": dict(observe_dangling=False, checkpoint_interval=2),
    "B_obs_ci2": dict(observe_dangling=True, checkpoint_interval=2),
    "C_obs_ci1": dict(observe_dangling=True, checkpoint_interval=1),
    "D_obs_ci3": dict(observe_dangling=True, checkpoint_interval=3),
}


def run(kw) -> float:
    t0 = time.perf_counter()
    out = pagerank(edges(), iters=8, broadcast_ranks=True, **kw).select(
        "node", F.round("rank", 6).alias("rank")
    )
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


# value parity first (also warms the JVM)
vals = {}
for name, kw in ARMS.items():
    rows = (
        pagerank(edges(), iters=8, broadcast_ranks=True, **kw)
        .select("node", F.round("rank", 6).alias("rank"))
        .collect()
    )
    vals[name] = sorted((r["node"], r["rank"]) for r in rows)
ref = vals["A_inplan_ci2"]
for name, v in vals.items():
    print(f"parity {name}: {'EQUAL' if v == ref else 'DIFFERS'} ({len(v)} rows)")

samples: dict[str, list[float]] = {n: [] for n in ARMS}
for r in range(ROUNDS):
    for name, kw in ARMS.items():
        samples[name].append(run(kw))
for name, s in samples.items():
    print(
        f"{name}: med {statistics.median(s):.3f}s  "
        f"samples {[round(x, 3) for x in s]}"
    )
spark.stop()
