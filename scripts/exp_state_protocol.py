"""Component breakdown + bucketing A/B for the applyInPandasWithState
per-group protocol floor (r12 item 1 — VERDICT r11 top item).

Probes, all over the same synthetic backlog (reusing the r09 harness's
file generator, memory sink + processingTime trigger like the parity
test):

  drain_nostate   groupBy(user_id), body consumes batches, touches NO
                  state — the serializer/protocol floor at user grain
  drain_state     + one tiny state.update + timeout per group — adds
                  the state codec cost at user grain
  real            streaming.sessionize_stream.stateful_session_arrays
  bucketed        stateful_session_arrays_bucketed (key-range
                  coalescing: pmod(user_id, n_buckets) groups)

If drain_nostate ≈ real, the floor is the per-group protocol, not the
session body; bucketed shows what amortizing it buys.

Usage: python scripts/exp_state_protocol.py [--files 10]
       [--rows-per-file 200000] [--n-users 100000] [--only name]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from typing import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from scripts.streaming_throughput import write_batch_files

TINY_STATE = "a array<long>"
OUT = "user_id long, n_events long"


def drain_nostate(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    for pdf in pdfs:
        pass
    return
    yield  # generator


def drain_state(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    if state.hasTimedOut:
        state.remove()
        return
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    prev = state.get[0] if state.exists else []
    state.update((list(prev) + [n],))
    state.setTimeoutDuration(5_000)
    return
    yield


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=10)
    ap.add_argument("--rows-per-file", type=int, default=200_000)
    ap.add_argument("--n-users", type=int, default=100_000)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()

    from post_modern_stack_spark.session import get_spark
    from post_modern_stack_spark.streaming.sessionize_stream import (
        stateful_session_arrays,
        stateful_session_arrays_bucketed,
        stream_events,
    )

    spark = get_spark(app_name="exp-state-protocol")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="pmss-statefloor-")
    src = f"{base}/events"
    os.makedirs(src, exist_ok=True)
    total = write_batch_files(
        spark, src, args.files, args.rows_per_file, args.n_users
    )
    print(json.dumps({"step": "synthesize", "rows": total}), flush=True)

    def prepped(events):
        return events.select(
            "user_id",
            "ts_ns",
            "event_id",
            F.get_json_object("props", "$.k").alias("k"),
        ).filter(F.col("k").isNotNull())

    PROBES = {
        "drain_nostate": lambda ev: prepped(ev)
        .groupBy("user_id")
        .applyInPandasWithState(
            drain_nostate, OUT, TINY_STATE, "append",
            GroupStateTimeout.NoTimeout,
        ),
        "drain_state": lambda ev: prepped(ev)
        .groupBy("user_id")
        .applyInPandasWithState(
            drain_state, OUT, TINY_STATE, "append",
            GroupStateTimeout.ProcessingTimeTimeout,
        ),
        "real": stateful_session_arrays,
        "bucketed": stateful_session_arrays_bucketed,
    }

    for name, build in PROBES.items():
        if args.only and args.only not in name:
            continue
        ckpt = f"{base}/ckpt_{name}"
        events = stream_events(spark, src, max_files_per_trigger=1)
        df = build(events)
        t0 = time.perf_counter()
        q = (
            df.writeStream.format("memory")
            .queryName(f"mem_{name}")
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(processingTime="1 second")
            .start()
        )
        seen = 0
        deadline = time.perf_counter() + 1800
        while time.perf_counter() < deadline:
            time.sleep(1)
            seen = sum(p.get("numInputRows", 0) for p in q.recentProgress)
            if seen >= total:
                break
        wall = time.perf_counter() - t0
        q.stop()
        print(
            json.dumps(
                {
                    "probe": name,
                    "rows": seen,
                    "sec": round(wall, 1),
                    "rows_per_sec": round(seen / max(wall, 0.001)),
                }
            ),
            flush=True,
        )
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
