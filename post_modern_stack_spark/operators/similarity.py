"""Similarity search over embedding columns (SURVEY.md §2 K3).

- ``brute_force_top_k``: exact cosine top-K — the correctness baseline.
  Query side is broadcast; corpus side never shuffles; per-partition
  top-K via window (Catalyst WindowGroupLimit pushes the limit down).
- ``rp_lsh_top_k``: random-hyperplane LSH (sign buckets) — the scale
  path. Buckets shrink the candidate set ~2^bits-fold; probing multiple
  buckets (multi-probe by Hamming-1 neighbors) trades recall vs cost.

Both are pure DataFrame ops; the dot products run JVM-side via
``aggregate(zip_with(...))`` (functions.core.dot_product).
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from post_modern_stack_spark.functions import cosine_similarity
from post_modern_stack_spark.operators.shaping import top_k_per_group


def as_double_array(col: str | F.Column) -> F.Column:
    """array<float> → array<double> so similarity math matches the
    oracle's double-precision accumulation bit-for-bit-ish."""
    col = F.col(col) if isinstance(col, str) else col
    return F.transform(col, lambda x: x.cast("double"))


def brute_force_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-K: broadcast(queries) × corpus → window top-K.

    Output: (query_id, neighbor_id, cos_sim) — (score desc, neighbor_id)
    deterministic ranking, self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_array(vec_col).alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine_similarity("qv", "cv"), 6))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.asc("neighbor_id")],
        k,
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (literal constants —
    the plan embeds them; no data dependency, no driver collect)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def rp_bucket(vec_col: str | F.Column, dim: int, bits: int = 8, seed: int = 42) -> F.Column:
    """Sign-of-projection bucket id (0..2^bits-1) for one vector column."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _hyperplanes(dim, bits, seed)
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def rp_lsh_top_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
) -> DataFrame:
    """Approximate top-K: join query and corpus on the LSH bucket, then
    exact-rank within candidates. Recall < 1 by design; the bucket join
    replaces the O(|Q|·|C|) cross product with O(collisions).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double_array(vec_col).alias("qv"),
        rp_bucket(vec_col, dim, bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
        rp_bucket(vec_col, dim, bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", F.round(cosine_similarity("qv", "cv"), 6))
        .select("query_id", "neighbor_id", "cos_sim")
    )
    return top_k_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.asc("neighbor_id")],
        k,
    ).select("query_id", "neighbor_id", "cos_sim", "rank")
