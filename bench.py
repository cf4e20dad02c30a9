"""Benchmark runner — times every catalog query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` = total wall-clock over the full query sweep (the driver's
headline number, compared against BASELINE.md round over round).
Each query is executed to completion via a count-ish terminal action
(``df.write.format("noop")`` so results are fully materialized without
driver collection overhead).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry_mod
    from post_modern_stack_spark.session import get_spark

    spark = get_spark(app_name="pmss-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once so per-query numbers measure
    # the plan, not session startup
    next(iter(qs.values()))(spark, sf_dir).write.format("noop").mode("overwrite").save()
    # warm the Python/Arrow worker pool too (first pandas UDF in a
    # session pays ~8 s of interpreter+Arrow startup otherwise)
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(32).select(_warm(col("id"))).write.format("noop").mode(
        "overwrite"
    ).save()

    total0 = time.perf_counter()
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # a broken query must not sink the bench
            timings[name] = -1.0
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
    total = round(time.perf_counter() - total0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "full_query_sweep_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
