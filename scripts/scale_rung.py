"""Scale-visible bench rung (r12, VERDICT r11 item 8): at sf0.1 the
whole catalog sits at ~1 s fixed-overhead floors, so 8-core vs 32-core
sweeps tie and the bench cannot demonstrate scale-out. This probe
synthesizes a 10× rung (sf0.1 tables replicated 10 times with
id offsets — deterministic, written once under /tmp) and times the
five scaling-capable queries named by the r11 verdict at
SPARK_GRAFT_CPUS=8 and =32 in SEPARATE processes (each gets its own
local[N] session via the normal env contract), reporting the
8c/32c wall ratio per query.

    python scripts/scale_rung.py [--queries q1 q2 ...] [--reps 2] [--factor 10]

Writes only under /tmp. The rung directory is content-addressed by
replication factor (/tmp/pmss_rung_x<factor>); delete it to force a
rebuild. Core-count processes ALTERNATE (32, 8, 32, 8) and the
embedding corpus memo is cleared before every rep, so best-of-merged
walls compare cold path to cold path across the same host window.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
QUERIES = [
    "embedding_near_dups",
    "association_rules",
    "media_video_frames",
    "semantic_dedup_kmeans",
    "jsonl_docs_roundtrip",
]
# id column to offset per table so replicas do not collapse under
# dedup/distinct; non-id columns are kept verbatim (same part/user
# universes — co-occurrence density scales like the fact table).
TABLES = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
}
OFFSET = 1_000_000_000


def synthesize(factor: int) -> str:
    RUNG = f"/tmp/pmss_rung_x{factor}"
    if os.path.isdir(RUNG) and all(
        os.path.exists(f"{RUNG}/{t}.parquet") for t in TABLES
    ):
        return RUNG
    from pyspark.sql import functions as F

    from post_modern_stack_spark.session import get_spark

    spark = get_spark(app_name="pmss-rung-synth")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(RUNG, exist_ok=True)
    for t, idc in TABLES.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = [
            df.withColumn(idc, F.col(idc) + F.lit(i * OFFSET))
            for i in range(factor)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{RUNG}/{t}.parquet")
        print(json.dumps({"synth": t, "rows": out.count()}), flush=True)
    spark.stop()
    return RUNG


WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
import __spark_entry__ as m
from post_modern_stack_spark.operators import dedup
from post_modern_stack_spark.session import get_spark
spark = get_spark(app_name="pmss-rung-%s" % os.environ["SPARK_GRAFT_CPUS"])
spark.sparkContext.setLogLevel("ERROR")
qs = m.queries()
names = json.loads(sys.argv[1]); reps = int(sys.argv[2]); rung = sys.argv[3]
# warm JVM + workers on a cheap query first
qs[names[0]](spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
def clear_memos():
    # cold-path guarantee, same as bench.py: every rep pays the corpus
    # collect + routing probe a first invocation would pay
    memo = getattr(dedup, "_corpus_memo", None)
    while memo:
        _, bc = memo.popitem()
        try:
            bc.unpersist()
        except Exception:
            pass
out = {}
for n in names:
    walls = []
    for _ in range(reps):
        clear_memos()
        t0 = time.perf_counter()
        qs[n](spark, rung).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 2))
    out[n] = walls
print("RUNG_RESULT " + json.dumps(out))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=QUERIES)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    rung = synthesize(args.factor)
    # ALTERNATE the core-count processes (32, 8, 32, 8) so slow host
    # drift between process launches cannot masquerade as a core-count
    # effect; merge each cpu level's reps across its two processes.
    results: dict[str, dict[str, list[float]]] = {}
    for cpus in ("32", "8", "32", "8"):
        env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
        p = subprocess.run(
            [sys.executable, "-c", WORKER, json.dumps(args.queries),
             str(args.reps), rung],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [
            ln for ln in p.stdout.splitlines() if ln.startswith("RUNG_RESULT ")
        ]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:])
            raise SystemExit(f"worker cpus={cpus} failed rc={p.returncode}")
        got = json.loads(line[0][len("RUNG_RESULT "):])
        acc = results.setdefault(cpus, {})
        for n, walls in got.items():
            acc.setdefault(n, []).extend(walls)
        print(json.dumps({"cpus": cpus, **got}), flush=True)
    for n in args.queries:
        best32 = min(results["32"][n])
        best8 = min(results["8"][n])
        print(
            json.dumps(
                {
                    "query": n,
                    "t32_best": best32,
                    "t8_best": best8,
                    "ratio_8c_over_32c": round(best8 / best32, 2),
                    "walls32": results["32"][n],
                    "walls8": results["8"][n],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
