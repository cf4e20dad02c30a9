"""Round-6-ready catalog queries, staged OUTSIDE the frozen registry.

The round-5 driver window must verify the final 46 never-checked
oracle-paired names (tests/test_catalog_freeze.py holds the catalog at
212 until CORRECTNESS_r05.json lands), so these builders are NOT in
``entryflow.QUERIES`` yet. Each is fully oracle-paired and runs through
the same DuckDB parity gate locally (tests/test_pending_queries.py);
when the freeze lifts, round 6 promotes them by moving each into its
catalog module under an ``@query(...)`` decoration — a mechanical flip
with zero new code.

Staged here:

- ``semantic_dedup_sharded`` / ``semantic_dedup_auto`` — the round-4
  skew-hardening paths (operators/dedup.py), measured 7x faster under
  a hostile clustering on the 1M-doc ladder (BASELINE.md round-8).
  They produce bit-identical results to ``semantic_dedup``, so they
  share its DuckDB pairwise-cosine oracle verbatim — promoting them
  makes the skew path driver-hash-checked, not just parity-tested.
- ``bpe_encode_tokens`` — the encode half of the BPE pair
  (vocab.bpe_encode, new this session): apply the 8 trained merges to
  the corpus and emit per-doc token counts with the ACTUAL tokenizer
  (the token-budget denominator real accounting needs, replacing the
  whitespace proxy). Oracle reuses bpe_train_merges' unrolled CTE
  chain — s8 holds each word's final symbols — joined back at doc
  grain (_bpe_encode_oracle_sql).
- ``jsonl_docs_roundtrip`` — end-to-end value check of the jsonl_docs
  Python Data Source (sources/docsource.py): write the documents
  table through the committing Arrow writer, read it back through the
  byte-range-splitting reader with a pushed string-equality filter,
  and aggregate per source with an md5-derived text checksum. The
  oracle computes the same aggregate from the parquet truth, so a hash
  match proves the connector round-trips every byte of every surviving
  row and the pushed filter drops exactly the non-matching rows.
"""

from __future__ import annotations

import os
import tempfile
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from post_modern_stack_spark.registry import load_table

PENDING_QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
PENDING_ORACLES: Dict[str, str] = {}

# Force multi-block decomposition at driver SFs: sf0.01's ~200
# embeddings over ~10 labels give ~20-member clusters, so 16-row
# blocks exercise the block-pair join + i==j masking paths for real
# (production default 8192 would collapse every test cluster to one
# block and the parity check would prove nothing about sharding).
_SHARD_ROWS = 16

_SEMANTIC_DEDUP_ORACLE = """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    close AS (
      SELECT b.vec_id AS id_b, count(*) AS n_close
      FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE list_sum(list_transform(range(1, len(a.v) + 1),
                                    i -> a.v[i] * b.v[i]))
            / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
               * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.5
      GROUP BY b.vec_id
    )
    SELECT e.vec_id, e.label,
           coalesce(c.n_close, 0)::BIGINT AS n_close_lower,
           CASE WHEN c.id_b IS NULL THEN 1 ELSE 0 END AS keep
    FROM e LEFT JOIN close c ON c.id_b = e.vec_id
"""


def pending(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        PENDING_QUERIES[name] = fn
        if oracle is not None:
            PENDING_ORACLES[name] = oracle
        return fn

    return deco


@pending("semantic_dedup_sharded", oracle=_SEMANTIC_DEDUP_ORACLE)
def q_semantic_dedup_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] SemDeDup, straggler-proof form: the per-cluster O(n^2)
    cosine pass decomposed into (cluster, block_i, block_j) GEMM tasks
    so one giant cluster spreads across executors instead of
    serializing into a single task (dedup.semantic_dedup_sharded;
    measured 403.6 s -> 123.3 s under a planted 100k-member cluster at
    1M docs). Identical per-pair cosine expression => bit-identical
    keep/n_close, so the plain path's oracle applies verbatim."""
    from post_modern_stack_spark.operators import dedup

    return dedup.semantic_dedup_sharded(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.5,
        shard_rows=_SHARD_ROWS,
    )


@pending("semantic_dedup_auto", oracle=_SEMANTIC_DEDUP_ORACLE)
def q_semantic_dedup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] SemDeDup with size-based dispatch: clusters at or under
    the block size run the zero-overhead one-task-per-cluster path,
    oversized ones the block-pair path (dedup.semantic_dedup_auto;
    measured 403.6 s -> 57.8 s under skew, no packing tax on the
    well-sized majority). Same oracle — routing never changes values."""
    from post_modern_stack_spark.operators import dedup

    return dedup.semantic_dedup_auto(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.5,
        shard_rows=_SHARD_ROWS,
    )


def _bpe_encode_oracle() -> str:
    from post_modern_stack_spark.plans.catalog_text import (
        _bpe_encode_oracle_sql,
    )

    return _bpe_encode_oracle_sql()


@pending("bpe_encode_tokens", oracle=_bpe_encode_oracle())
def q_bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] BPE encode (vocab.bpe_encode): train the 8-merge table
    (vocab.bpe_train — already driver-checked as bpe_train_merges),
    then tokenize every document with it. Merges apply on the
    DISTINCT-WORD table (vocab-sized), then broadcast-join back to
    corpus word occurrences — one explode + one hash agg at corpus
    grain regardless of merge-table size. The expression-fold word
    path is used here (bit-identical to training's state rewrite); the
    pandas-UDF rank-priority path for production 30k-merge tables is
    parity-tested in tests/test_operators.py."""
    from post_modern_stack_spark.operators.vocab import bpe_encode, bpe_train

    docs = load_table(spark, sf_dir, "documents")
    merges, _ = bpe_train(docs, n_merges=8)
    return bpe_encode(docs, merges)


@pending(
    "jsonl_docs_roundtrip",
    oracle="""
    SELECT source,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars,
           sum(('0x' || substr(md5(text), 1, 8))::BIGINT)::BIGINT
             AS text_csum
    FROM documents
    WHERE lang = 'en'
    GROUP BY source
    """,
)
def q_jsonl_docs_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] H11 connector value check: documents -> jsonl_docs writer
    (committing _MANIFEST generation) -> jsonl_docs reader with a
    pushed EqualTo('lang','en') filter -> per-source checksum
    aggregate. The oracle aggregates the parquet truth directly, so a
    hash match certifies byte-exact text round-trip AND pushed-filter
    correctness end-to-end through the Python Data Source.

    The shard directory is keyed by corpus identity (sf path), written
    mode("overwrite") each call — the committing writer makes a
    concurrent re-write invisible until its manifest swap, so repeated
    invocations are idempotent. A fresh .load() per call sidesteps the
    Spark 4.1 bridge's cached-scan caveat (tests/test_docsource.py)."""
    from post_modern_stack_spark.sources import docsource

    docsource.register(spark)
    docs = load_table(spark, sf_dir, "documents")
    root = os.path.join(
        tempfile.gettempdir(),
        "pmss_jsonl_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)) or "sf",
    )
    docs.write.format("jsonl_docs").option("path", root).mode(
        "overwrite"
    ).save()
    back = (
        spark.read.format("jsonl_docs")
        .schema(docsource.DOCUMENTS_SCHEMA)
        .option("path", root)
        .load()
        .filter(F.col("lang") == "en")
    )
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.sum(
            F.conv(F.substring(F.md5("text"), 1, 8), 16, 10).cast("long")
        ).alias("text_csum"),
    )
