"""Controlled A/B for the r10 candidate-scoring change: arrow
(`rounded_pair_cosine`, einsum per Arrow batch) vs expr
(`F.round(cosine_similarity, 6)`, interpreted higher-order lambdas)
over the SAME pinned candidates frame.

The full-pipeline ANN ladder rows swing ±4x with the host band, so
this isolates the one stage the change touches: build a (qv, cv)
pair frame once, localCheckpoint it (scan cost paid once, excluded),
then time both scoring forms interleaved N rounds.

    python scripts/exp_pair_scoring.py [--pairs 2000000] [--dim 64] [--rounds 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=2_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--first", choices=["arrow", "expr"], default="arrow",
                    help="which form runs first each round (rules out "
                    "JIT-warmup ordering effects)")
    args = ap.parse_args()

    from post_modern_stack_spark.functions import cosine_similarity
    from post_modern_stack_spark.operators.similarity import rounded_pair_cosine
    from post_modern_stack_spark.session import get_spark

    spark = get_spark(app_name="pmss-pair-scoring-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def vec(seed: int):
        return F.array(
            *[
                (
                    F.pmod(F.xxhash64("id", F.lit(seed * 1000 + j)), F.lit(2000))
                    / 1000.0
                    - 1.0
                )
                for j in range(args.dim)
            ]
        )

    pairs = (
        spark.range(args.pairs)
        .select(F.col("id"), vec(1).alias("qv"), vec(2).alias("cv"))
        .localCheckpoint()
    )
    pairs.count()

    forms = {
        "arrow": lambda df: df.select(
            rounded_pair_cosine("qv", "cv").alias("cos_sim")
        ),
        "expr": lambda df: df.select(
            F.round(cosine_similarity("qv", "cv"), 6).alias("cos_sim")
        ),
    }
    # value parity on this frame before timing
    chk = pairs.limit(5000)
    a = [r["cos_sim"] for r in forms["arrow"](chk).collect()]
    e = [r["cos_sim"] for r in forms["expr"](chk).collect()]
    assert a == e, "arrow/expr scoring diverged on the probe frame"
    print(json.dumps({"parity_rows": len(a), "ok": True}), flush=True)

    order = [args.first] + [f for f in forms if f != args.first]
    for rnd in range(args.rounds):
        for name in order:
            build = forms[name]
            t0 = time.perf_counter()
            build(pairs).write.format("noop").mode("overwrite").save()
            print(
                json.dumps(
                    {"round": rnd, "form": name, "pairs": args.pairs,
                     "sec": round(time.perf_counter() - t0, 2)}
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
