"""dbt-style SNAPSHOT: incremental SCD2 materialization on parquet.

The reference is a dbt project (reference src/dbt/dbt_project.yml);
dbt's ``snapshot`` block is the standard way such projects track
slowly-changing sources — each run compares the source's current rows
to the stored current version and versions the changes with
``dbt_valid_from`` / ``dbt_valid_to``. This module implements those
semantics (the ``check`` strategy: a row changed iff any tracked
column differs) on the keyed-parquet MERGE layout (sources/merge.py),
so each apply physically rewrites ONLY the hash buckets holding
changed keys — the property that makes nightly snapshots of a huge
dimension affordable.

Row shape in the snapshot table:
  <unique_key>, <tracked cols>, valid_from BIGINT, valid_to BIGINT
  (NULL = current), plus the internal surrogate merge key.

Per apply, against the CURRENT rows only:
  - changed key  → close the old version (valid_to = at_ts) AND
                   insert the new current one (valid_from = at_ts);
  - new key      → insert a current row;
  - missing key  → closed only when ``hard_deletes=True`` (dbt's
                   invalidate_hard_deletes); the default False matches
                   dbt's 'ignore' — deleted keys stay current.
Both delta kinds are plain upserts keyed by (key, valid_from), so one
``merge_upsert`` call applies the whole delta atomically per bucket.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from post_modern_stack_spark.sources.merge import (
    merge_upsert,
    read_keyed_table,
    write_keyed_table,
)

SURROGATE = "__snap_key"


class DbtSnapshot:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        unique_key: str,
        check_cols: list[str],
        n_buckets: int = 16,
        hard_deletes: bool = False,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key = unique_key
        self.check_cols = list(check_cols)
        self.n_buckets = n_buckets
        self.hard_deletes = hard_deletes

    def exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame:
        return read_keyed_table(self.spark, self.path).drop(SURROGATE)

    def current(self) -> DataFrame:
        return self.read().filter(F.col("valid_to").isNull())

    def _with_surrogate(self, df: DataFrame) -> DataFrame:
        # merge key must identify a VERSION, not a business key: the
        # same key's closed row and new current row travel in one delta
        return df.withColumn(
            SURROGATE,
            F.concat_ws("§", F.col(self.key).cast("string"), F.col("valid_from")),
        )

    def apply(self, source: DataFrame, at_ts: int) -> dict:
        """One snapshot run at logical time ``at_ts`` (epoch ms)."""
        src = source.select(self.key, *self.check_cols)
        if not self.exists():
            first = src.withColumn("valid_from", F.lit(at_ts).cast("long")).withColumn(
                "valid_to", F.lit(None).cast("long")
            )
            write_keyed_table(
                self._with_surrogate(first), self.path, SURROGATE, self.n_buckets
            )
            return {"inserted": first.count(), "closed": 0, "unchanged": 0}

        cur = self.current()
        s = src.alias("s")
        c = cur.alias("c")
        joined = s.join(c, F.col(f"s.{self.key}") == F.col(f"c.{self.key}"), "full_outer")

        diff = F.lit(False)
        for col in self.check_cols:
            diff = diff | ~F.col(f"s.{col}").eqNullSafe(F.col(f"c.{col}"))

        src_exists = F.col(f"s.{self.key}").isNotNull()
        cur_exists = F.col(f"c.{self.key}").isNotNull()

        # close the stored version: changed, or (hard_deletes only)
        # vanished from the source
        close_pred = cur_exists & (src_exists & diff)
        if self.hard_deletes:
            close_pred = cur_exists & (~src_exists | diff)
        closed = joined.filter(close_pred).select(
            F.col(f"c.{self.key}").alias(self.key),
            *[F.col(f"c.{col}").alias(col) for col in self.check_cols],
            F.col("c.valid_from").alias("valid_from"),
            F.lit(at_ts).cast("long").alias("valid_to"),
        )
        # open a new current version: changed or brand-new
        opened = joined.filter(src_exists & (~cur_exists | diff)).select(
            F.col(f"s.{self.key}").alias(self.key),
            *[F.col(f"s.{col}").alias(col) for col in self.check_cols],
            F.lit(at_ts).cast("long").alias("valid_from"),
            F.lit(None).cast("long").alias("valid_to"),
        )
        delta = self._with_surrogate(closed.unionByName(opened))
        # count BEFORE the merge: these plans read the files the merge
        # is about to overwrite
        n_closed, n_opened, n_cur = closed.count(), opened.count(), cur.count()
        if n_closed or n_opened:
            merge_upsert(self.spark, self.path, delta, SURROGATE, self.n_buckets)
        return {
            "inserted": n_opened,
            "closed": n_closed,
            "unchanged": n_cur - n_closed,
        }
