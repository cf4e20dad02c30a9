"""Experiment: compare shingle-stream forms for jaccard_pairs at sf0.1.

Forms:
  A (r7 current): inline sh_arr in size() + explode()  -> 2 builds/row
  B (r6):         project alias, size+explode of attr  -> 1 build + inferred
                  filter re-inlined below token projection (per-shingle split)
  C (candidate):  project alias, size + explode_outer  -> outer generate is
                  skipped by InferFiltersFromGenerate -> 1 build, no filter

Prints: count of `array_distinct` occurrences in the optimized plan for the
shingle stage of each form, and 3-sample wall times for the full
jaccard_pairs(min_jaccard=0.2) query on documents at $SF_DIR.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, DataFrame, functions as F

from post_modern_stack_spark.operators.dedup import shingles_from_tokens

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "16g")
    .config("spark.sql.adaptive.enabled", "true")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")


def stream_a(df: DataFrame) -> DataFrame:
    sh_arr = shingles_from_tokens(F.col("__toks"), 3)
    return (
        df.select(F.col("doc_id"), F.split(F.col("text"), r"\s+").alias("__toks"))
        .select("doc_id", F.size(sh_arr).alias("n_sh"), F.explode(sh_arr).alias("shingle"))
        .select("doc_id", "n_sh", F.xxhash64("shingle").alias("shingle_h"))
    )


def stream_b(df: DataFrame) -> DataFrame:
    sh_arr = shingles_from_tokens(F.split(F.col("text"), r"\s+"), 3)
    return (
        df.select(F.col("doc_id"), sh_arr.alias("sh"))
        .select("doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle"))
        .select("doc_id", "n_sh", F.xxhash64("shingle").alias("shingle_h"))
    )


def stream_c(df: DataFrame) -> DataFrame:
    sh_arr = shingles_from_tokens(F.col("__toks"), 3)
    return (
        df.filter(F.col("text").isNotNull())
        .select(F.col("doc_id"), F.split(F.col("text"), r"\s+").alias("__toks"))
        .select(F.col("doc_id"), sh_arr.alias("__sh"))
        .select(
            "doc_id",
            F.size("__sh").alias("n_sh"),
            F.explode_outer("__sh").alias("shingle"),
        )
        .select("doc_id", "n_sh", F.xxhash64("shingle").alias("shingle_h"))
    )


def pairs(sh: DataFrame) -> DataFrame:
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle_h") == F.col("b.shingle_h"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return inter.select(
        "id_a",
        "id_b",
        F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6).alias(
            "jaccard"
        ),
    ).filter(F.col("jaccard") >= 0.2)


for name, fn in [("A_inline2x", stream_a), ("B_r6_alias", stream_b), ("C_outer", stream_c)]:
    sh = fn(docs)
    plan = sh._jdf.queryExecution().optimizedPlan().toString()
    n_builds = plan.count("array_distinct")
    print(f"{name}: array_distinct occurrences in optimized shingle-stage plan = {n_builds}")

for name, fn in [("A_inline2x", stream_a), ("B_r6_alias", stream_b), ("C_outer", stream_c)]:
    q = pairs(fn(docs))
    times = []
    cnt = None
    for _ in range(3):
        t0 = time.time()
        cnt = q.count()
        times.append(round(time.time() - t0, 3))
    print(f"{name}: rows={cnt} times={times} median={sorted(times)[1]}")

spark.stop()
