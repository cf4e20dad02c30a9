"""Per-query cost attribution at $SPARK_GRAFT_SF_DIR (guide §1: measure
first — decide whether time goes to driver planning, scheduling, or
executor compute BEFORE touching an operator).

For each named catalog query (no args = all), times the noop-sink run
and splits it into:
  - build_ms: Python DSL construction (driver, pre-Spark);
  - plan_ms:  analysis+optimization+physical planning of the query's
              own frame (forced via executedPlan before the action; the
              write command re-plans, so the action wall still includes
              a second planning pass — plan_ms is the lower bound that
              tells us whether the query is planning-bound);
  - jobs / stages / tasks: scheduling volume (Spark REST API deltas);
  - exec_ms:  summed executorRunTime across the query's stages —
              actual task compute, all cores (divide by 32 for the
              wall-clock floor);
  - gc_ms, shuffle_r/w bytes, input bytes.

Usage: python scripts/profile_queries.py [--reps N] [q1 q2 ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from post_modern_stack_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

args = sys.argv[1:]
reps = 1
if args and args[0] == "--reps":
    reps = int(args[1])
    args = args[2:]

spark = get_spark(app_name="pmss-profile")
spark.sparkContext.setLogLevel("ERROR")
qs = entry_mod.queries()
names = args or list(qs)

ui = spark.sparkContext.uiWebUrl


def rest(path: str):
    app_id = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
        return json.loads(r.read())


def stage_snapshot() -> dict[int, dict]:
    out = {}
    for s in rest("/stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = s
    return out


# warm JVM + parquet footers + Python worker pool (mirrors bench.py)
next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode("overwrite").save()
import pandas as pd
from pyspark.sql.functions import col, pandas_udf


@pandas_udf("long")
def _warm(s: pd.Series) -> pd.Series:
    import hashlib  # noqa: F401

    import numpy  # noqa: F401

    return s


spark.range(32).repartition(32).select(_warm(col("id"))).write.format(
    "noop"
).mode("overwrite").save()

hdr = (
    "query wall_s build_ms plan_ms jobs stages tasks exec_ms gc_ms "
    "shuf_r_mb shuf_w_mb input_mb"
)
print(hdr)
for name in names:
    best = None
    for _ in range(reps):
        before = stage_snapshot()
        jobs_before = len(rest("/jobs"))
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t1 = time.perf_counter()
        _ = df._jdf.queryExecution().executedPlan()  # force planning
        t2 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.perf_counter()
        after = stage_snapshot()
        jobs_after = len(rest("/jobs"))
        new = [s for k, s in after.items() if k not in before]
        row = dict(
            wall=t3 - t0,
            build_ms=(t1 - t0) * 1e3,
            plan_ms=(t2 - t1) * 1e3,
            jobs=jobs_after - jobs_before,
            stages=len(new),
            tasks=sum(s["numCompleteTasks"] for s in new),
            exec_ms=sum(s["executorRunTime"] for s in new),
            gc_ms=sum(s["jvmGcTime"] for s in new),
            shuf_r=sum(s["shuffleReadBytes"] for s in new) / 1e6,
            shuf_w=sum(s["shuffleWriteBytes"] for s in new) / 1e6,
            input=sum(s["inputBytes"] for s in new) / 1e6,
        )
        if best is None or row["wall"] < best["wall"]:
            best = row
    r = best
    print(
        f"{name} {r['wall']:.3f} {r['build_ms']:.0f} {r['plan_ms']:.0f} "
        f"{r['jobs']} {r['stages']} {r['tasks']} {r['exec_ms']} {r['gc_ms']} "
        f"{r['shuf_r']:.2f} {r['shuf_w']:.2f} {r['input']:.2f}"
    )
spark.stop()
