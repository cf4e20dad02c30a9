"""Interleaved A/B for the span-mode `near` checkpoint drop (r12 item 4).

Replicates q_curation_funnel_spans (doc_id%97 corpus/bench split,
span_trim=True, observe-based stage counts, one final count+token-sum
action) with checkpoint_near True (r11 committed) vs False (r12), and
checks value parity of the one-row funnel output.

Usage: python scripts/exp_funnel_near_ckpt.py [rounds]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Observation
from pyspark.sql import functions as F

from post_modern_stack_spark.operators import textstats
from post_modern_stack_spark.registry import load_table
from post_modern_stack_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

spark = get_spark(app_name="exp-funnel-near-ckpt")
spark.sparkContext.setLogLevel("ERROR")

STAGES = ["quality", "deduped", "near", "trimmed", "clean"]


def funnel_row(checkpoint_near: bool):
    docs = load_table(spark, SF_DIR, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    obs = {n: Observation() for n in STAGES}
    stages = textstats.curate_documents(
        corpus,
        benchmark,
        span_trim=True,
        observations=obs,
        checkpoint_near=checkpoint_near,
    )
    toks = F.size(F.split(F.col("text"), r"\s+"))
    counts = stages["input"].agg(F.count(F.lit(1)).alias("n_input"))
    for name in STAGES:
        counts = counts.withColumn(
            f"n_{name}", F.lit(int(obs[name].get["n"])).cast("long")
        )
    final_agg = stages["final"].agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum(toks).alias("final_tokens"),
    )
    return counts.crossJoin(final_agg)


def run(ck: bool) -> float:
    t0 = time.perf_counter()
    funnel_row(ck).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


rows = {}
for ck in (True, False):
    rows[ck] = funnel_row(ck).collect()
print(
    "parity:",
    "EQUAL" if rows[True] == rows[False] else "DIFFERS",
    rows[False],
)

samples = {"ckpt_near(r11)": [], "no_ckpt(r12)": []}
for r in range(ROUNDS):
    samples["ckpt_near(r11)"].append(run(True))
    samples["no_ckpt(r12)"].append(run(False))
for name, s in samples.items():
    print(
        f"{name}: med {statistics.median(s):.3f}s "
        f"samples {[round(x, 3) for x in s]}"
    )
spark.stop()
