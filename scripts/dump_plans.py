"""Dump .explain('formatted') for named catalog queries to
plans/r11/<query>_<tag>.txt (the judge-checkable before/after plan
artifacts for the optimization round).

Usage: python scripts/dump_plans.py <tag> q1 [q2 ...]
       (tag = 'before' | 'after')
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from post_modern_stack_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out_dir = os.path.join("/root/repo/plans", os.environ.get("PLANS_ROUND", "r11"))
os.makedirs(out_dir, exist_ok=True)

tag = sys.argv[1]
names = sys.argv[2:]

spark = get_spark(app_name="pmss-dump-plans")
spark.sparkContext.setLogLevel("ERROR")
qs = entry_mod.queries()

for name in names:
    df = qs[name](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines)")
spark.stop()
