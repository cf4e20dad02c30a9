"""Plan artifacts for the r12 funnel near-checkpoint drop
(plans/r12/curation_funnel_spans_{before,after}.txt).

The FINAL plan of q_curation_funnel_spans is identical before/after —
every stage feeding the funnel row is checkpointed either way — so the
evidence plan is the NEAR stage frame as its consumer (the trimmed
checkpoint action) sees it: before (checkpoint_near=True, the pre-r12
behavior) near is localCheckpoint-ed and consumers see a checkpoint
scan; after (span-mode default) the deduped⋈near_ids join subtree
inlines into the trimmed checkpoint action. The companion change for
bpe_train is an action-count win (jobs 7 → 5, observe rides the words
checkpoint), not a plan-shape change — no plan artifact exists for it
by construction.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from post_modern_stack_spark.operators import textstats
from post_modern_stack_spark.registry import load_table
from post_modern_stack_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = "/root/repo/plans/r12"
os.makedirs(out_dir, exist_ok=True)

spark = get_spark(app_name="pmss-dump-r12")
spark.sparkContext.setLogLevel("ERROR")


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


docs = load_table(spark, sf_dir, "documents")
corpus = docs.filter(F.col("doc_id") % 97 != 0)
benchmark = docs.filter(F.col("doc_id") % 97 == 0)

for tag, ckpt_near in (("before", True), ("after", None)):
    stages = textstats.curate_documents(
        corpus, benchmark, span_trim=True, checkpoint_near=ckpt_near
    )
    header = (
        "== plan of the NEAR stage frame as consumed by the trimmed "
        f"checkpoint (curate_documents span mode, checkpoint_near={ckpt_near!r}).\n"
        "== before = pre-r12: near is localCheckpoint-ed, consumers see a "
        "checkpoint scan (the stage was materialized to local scratch).\n"
        "== after  = r12 default: near checkpoint dropped, the "
        "deduped-join-near_ids subtree inlines into the trimmed checkpoint "
        "action (which runs it exactly once — near has one consumer in "
        "span mode). =="
    )
    plan = formatted(stages["near"])
    path = f"{out_dir}/curation_funnel_spans_{tag}.txt"
    with open(path, "w") as f:
        f.write(header + "\n\n" + plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines)")

spark.stop()
