"""Keyed-table MERGE (upsert/delete) on plain parquet with
partition-pruned rewrites — the lakehouse ``MERGE INTO`` contract
(reference analog: the warehouse's destructive-reload/append posture,
upload_to_snowflake.py, generalized to keyed updates) composed from
engine primitives this repo already proves out:

- the table is laid out in ``N_BUCKETS`` hash partitions of the merge
  key (``layout.write_partitioned`` Hive dirs);
- a merge computes the AFFECTED bucket set from the updates (one tiny
  distinct over the updates' keys), reads ONLY those partitions
  (directory pruning — untouched buckets are never listed, read, or
  rewritten), applies latest-wins upsert/delete semantics
  (``operators/cdc.apply_cdc``'s max_by idiom at the row grain), and
  rewrites just the affected directories via dynamic partition
  overwrite.

At 100 TB this is the difference between rewriting a table and
rewriting ``|affected buckets| / N_BUCKETS`` of it; the untouched-file
guarantee is tested by inode/mtime equality, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from post_modern_stack_spark.sources.layout import write_partitioned

BUCKET_COL = "__bucket"


def bucket_of(key_col: str | F.Column, n_buckets: int) -> F.Column:
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(F.xxhash64(col), F.lit(n_buckets))


def write_keyed_table(
    df: DataFrame, path: str, key: str, n_buckets: int = 16
) -> None:
    """Initial layout: hash-partition rows by merge key into
    ``n_buckets`` Hive directories."""
    write_partitioned(
        df.withColumn(BUCKET_COL, bucket_of(key, n_buckets)),
        path,
        [BUCKET_COL],
    )


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    n_buckets: int = 16,
    delete_col: str | None = None,
) -> dict:
    """MERGE ``updates`` into the keyed table at ``path``.

    Semantics: per key, an update row replaces the existing row
    (latest wins); rows whose ``delete_col`` is true are tombstones —
    the key disappears. Keys absent from ``updates`` are untouched —
    physically: their partitions' FILES are not rewritten.

    Returns {"affected_buckets": [...], "n_buckets": N} so callers can
    audit the blast radius.
    """
    upd = updates.withColumn(BUCKET_COL, bucket_of(key, n_buckets))
    affected = sorted(
        r[0] for r in upd.select(BUCKET_COL).distinct().collect()
    )
    if not affected:
        return {"affected_buckets": [], "n_buckets": n_buckets}

    current = spark.read.parquet(path).filter(
        F.col(BUCKET_COL).isin([int(b) for b in affected])
    )
    if delete_col is None:
        upd_clean = upd.withColumn("__del", F.lit(False))
    else:
        upd_clean = upd.withColumn(
            "__del", F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    cols = [c for c in current.columns]
    merged = (
        current.withColumn("__seq", F.lit(0))
        .withColumn("__del", F.lit(False))
        .unionByName(upd_clean.select(*cols, "__del").withColumn("__seq", F.lit(1)))
        .groupBy(key)
        .agg(
            F.max_by(
                F.struct(*[c for c in cols if c != key], "__del"), F.col("__seq")
            ).alias("__row")
        )
        .select(key, "__row.*")
        .filter(~F.col("__del"))
        .drop("__del")
    )
    # dynamic overwrite replaces ONLY the affected bucket directories
    write_partitioned(merged, path, [BUCKET_COL], dynamic=True)
    return {"affected_buckets": affected, "n_buckets": n_buckets}


def read_keyed_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)


def start_merge_stream(
    spark: SparkSession,
    updates_stream: DataFrame,
    path: str,
    key: str,
    n_buckets: int = 16,
    delete_col: str | None = None,
    checkpoint: str | None = None,
):
    """Continuous CDC apply: every micro-batch of the update stream
    MERGEs into the keyed table (foreachBatch — the sink-side analog
    of streaming/ingest_stream's COPY-INTO loop). Each batch rewrites
    only its affected buckets; the streaming checkpoint makes the
    apply restartable (a replayed batch re-merges idempotently —
    latest-wins per key is insensitive to re-application)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            spark, path, batch_df, key, n_buckets=n_buckets, delete_col=delete_col
        )

    w = updates_stream.writeStream.foreachBatch(apply_batch).trigger(
        availableNow=True
    )
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    return w.start()
