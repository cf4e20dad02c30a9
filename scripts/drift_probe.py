"""Drift adjudication probe (VERDICT r10 item 1): interleaved N-sample
medians for a set of suspect catalog queries, judged against their
BENCH_HISTORY quiet medians, with known-stable control queries run in
the SAME interleave to certify the window itself.

    python scripts/drift_probe.py [--queries a,b,c] [--samples 5]

Method: round-robin across (controls + suspects) so a degraded host
window hits every arm equally — a suspect can only be declared REAL
drift if it holds >2x its quiet median while the controls sit at
theirs. Quiet median = median of the query's BENCH_HISTORY entries
that lie within 2x of its fastest entry (the committed history mixes
quiet and degraded windows; the fast mode is the code's floor).

Prints one JSON line per query and a final verdict line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUSPECTS = [
    "embedding_near_dups",
    "media_jpeg_pipeline",
    "tfidf_top_terms",
    "media_real_features",
    "ann_recall_report",
]
# cheap, JVM-only, historically tight-band queries — window certifiers
CONTROLS = ["sessionize", "pricing_summary", "top_value_dims"]


def quiet_median(history: list[float]) -> float:
    lo = min(history)
    quiet = [v for v in history if v <= 2 * lo]
    return statistics.median(quiet)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=str, default=",".join(SUSPECTS))
    ap.add_argument("--controls", type=str, default=",".join(CONTROLS))
    ap.add_argument("--samples", type=int, default=5)
    ap.add_argument("--sf-dir", type=str, default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from post_modern_stack_spark.session import get_spark

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_HISTORY.json")) as f:
        history = json.load(f)

    spark = get_spark(app_name="pmss-drift-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    names = [n for n in args.controls.split(",") + args.queries.split(",") if n]
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    # warm JVM + Python workers exactly like bench.py (pandas imported
    # at module level: pandas_udf resolves the pd.Series hints in the
    # function's GLOBAL namespace, so a main()-local import breaks it)
    from pyspark.sql.functions import col, pandas_udf

    qs[names[0]](spark, args.sf_dir).write.format("noop").mode("overwrite").save()

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        import hashlib  # noqa: F401
        import numpy  # noqa: F401

        return s

    spark.range(32).repartition(32).select(_warm(col("id"))).write.format(
        "noop"
    ).mode("overwrite").save()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for i in range(args.samples):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples[n].append(round(time.perf_counter() - t0, 3))
            print(
                json.dumps({"sample": i, "query": n, "sec": samples[n][-1]}),
                file=sys.stderr,
                flush=True,
            )

    controls = args.controls.split(",")
    window_ok = True
    results = []
    for n in names:
        med = statistics.median(samples[n])
        qm = quiet_median(history[n]) if n in history else None
        ratio = round(med / qm, 2) if qm else None
        is_control = n in controls
        if is_control and ratio and ratio > 2.0:
            window_ok = False
        results.append(
            {
                "query": n,
                "role": "control" if is_control else "suspect",
                "samples": samples[n],
                "median": round(med, 3),
                "quiet_median": round(qm, 3) if qm else None,
                "ratio": ratio,
            }
        )
    for r in results:
        print(json.dumps(r), flush=True)
    verdicts = {
        r["query"]: (
            "REAL-DRIFT" if window_ok and r["ratio"] and r["ratio"] > 2.0
            else ("UNJUDGEABLE-WINDOW" if not window_ok else "INSIDE-BAND")
        )
        for r in results
        if r["role"] == "suspect"
    }
    print(json.dumps({"window_quiet": window_ok, "verdicts": verdicts}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
