"""Time named catalog queries at $SPARK_GRAFT_SF_DIR (3-sample medians).

Usage: python scripts/time_queries.py q1 q2 ...  (no args = all)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod
from post_modern_stack_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
reps = int(os.environ.get("REPS", "3"))

spark = get_spark(app_name="pmss-time-queries")
spark.sparkContext.setLogLevel("ERROR")
qs = entry_mod.queries()
names = sys.argv[1:] or list(qs)

# warm JVM + parquet footers
next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode("overwrite").save()

for name in names:
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    med = sorted(times)[len(times) // 2]
    print(f"{name}: median={med} samples={times}")
