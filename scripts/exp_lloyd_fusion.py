"""Interleaved A/B for the fused Lloyd assign+update (r12 item 3).

Arm OLD reconstructs the r11 iteration body (assign pandas UDF →
posexplode → groupBy(cluster,dim) aggregate → collect) inline; arm NEW
is similarity.kmeans_lloyd's fused mapInArrow partials. Both run the
full semantic_dedup_kmeans input (sf0.1 embeddings, k=8, n_iter=5)
and the probe checks assignment parity between the arms.

Usage: python scripts/exp_lloyd_fusion.py [rounds]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from post_modern_stack_spark.operators import similarity
from post_modern_stack_spark.registry import load_table
from post_modern_stack_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
K, N_ITER = 8, 5

spark = get_spark(app_name="exp-lloyd-fusion")
spark.sparkContext.setLogLevel("ERROR")


def kmeans_old(embeddings, k, n_iter, id_col="vec_id", vec_col="embedding"):
    """r11 iteration body, verbatim (init shared via n_iter=0 call)."""
    _, centroids = similarity.kmeans_lloyd(
        embeddings, k=k, n_iter=0, id_col=id_col, vec_col=vec_col
    )

    def assigner(cents):
        c = cents.copy()

        @pandas_udf("int")
        def assign(emb: pd.Series) -> pd.Series:
            mat = np.vstack(emb.to_numpy()).astype(np.float64)
            d = (c * c).sum(axis=1)[None, :] - 2.0 * (mat @ c.T)
            return pd.Series(d.argmin(axis=1).astype("int32"))

        return assign

    for _ in range(n_iter):
        assigned = embeddings.select(
            id_col, vec_col, assigner(centroids)(F.col(vec_col)).alias("cluster")
        )
        sums = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new = centroids.copy()
        for r in sums:
            new[r["cluster"], r["dim"]] = r["s"] / r["n"]
        centroids = new
    assignments = embeddings.select(
        id_col, assigner(centroids)(F.col(vec_col)).alias("cluster")
    )
    return assignments, centroids


def run(fn) -> float:
    emb = load_table(spark, SF_DIR, "embeddings").localCheckpoint()
    t0 = time.perf_counter()
    assignments, _ = fn(emb, K, N_ITER)
    assignments.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    return dt, assignments


def new_fn(emb, k, n):
    return similarity.kmeans_lloyd(emb, k=k, n_iter=n)


# parity (also warms JVM + workers)
emb0 = load_table(spark, SF_DIR, "embeddings").localCheckpoint()
a_old, c_old = kmeans_old(emb0, K, N_ITER)
a_new, c_new = similarity.kmeans_lloyd(emb0, k=K, n_iter=N_ITER)
m_old = {r["vec_id"]: r["cluster"] for r in a_old.collect()}
m_new = {r["vec_id"]: r["cluster"] for r in a_new.collect()}
print(
    f"parity assignments: {'EQUAL' if m_old == m_new else 'DIFFERS'} "
    f"({len(m_new)} rows); centroid max-abs-diff "
    f"{np.abs(np.asarray(c_old) - np.asarray(c_new)).max():.3e}"
)

samples = {"old": [], "new": []}
for r in range(ROUNDS):
    samples["old"].append(run(lambda e, k, n: kmeans_old(e, k, n))[0])
    samples["new"].append(run(new_fn)[0])
for name, s in samples.items():
    print(
        f"{name}: med {statistics.median(s):.3f}s "
        f"samples {[round(x, 3) for x in s]}"
    )
spark.stop()
