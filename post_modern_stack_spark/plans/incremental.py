"""Incremental model materialization — dbt's ``materialized:
incremental`` over the append-only log (the reference materializes
views only, dbt_project.yml:27; incremental is the mode its append-only
+ etl-stamped layout is built to enable — each ``COPY INTO`` load is a
natural increment).

``IncrementalModel.refresh`` processes only the ETL loads not yet seen:
new-load detection is an anti-join of distinct ``etl_id``s in the raw
log vs a tiny processed-loads ledger, transformation runs on the new
slice only, output appends partitioned by ``etl_id`` so reprocessing or
deleting a load is a partition operation. At 100 TB this is the
difference between re-transforming the corpus per run and touching only
the day's arrivals.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalModel:
    def __init__(
        self,
        spark: SparkSession,
        name: str,
        transform: Callable[[DataFrame], DataFrame],
        out_dir: str,
    ) -> None:
        self.spark = spark
        self.name = name
        self.transform = transform
        self.out_path = os.path.join(out_dir, name)
        self.ledger_path = os.path.join(out_dir, f"{name}__ledger")

    def _processed_loads(self) -> DataFrame:
        if os.path.exists(self.ledger_path):
            return self.spark.read.parquet(self.ledger_path)
        return self.spark.createDataFrame([], "etl_id string")

    def refresh(self, raw: DataFrame) -> dict:
        """Transform loads not in the ledger; append results + ledger.

        The raw slice keeps its ``etl_id`` so output partitions align
        with loads (replay = drop partition + re-run).
        """
        seen = self._processed_loads()
        new_loads = (
            raw.select("etl_id").distinct().join(seen, "etl_id", "left_anti")
        )
        load_ids = [r["etl_id"] for r in new_loads.collect()]
        if not load_ids:
            return {"model": self.name, "new_loads": [], "rows_appended": 0}

        slice_df = raw.filter(F.col("etl_id").isin(load_ids))
        out = self.transform(slice_df)
        if "etl_id" not in out.columns:
            raise ValueError(
                f"incremental model {self.name}: transform must keep etl_id"
            )
        # dynamic partition overwrite, not append: refresh appends data
        # BEFORE the ledger commits, so a crash between the two must
        # leave a retry that REWRITES the load's partitions instead of
        # duplicating them
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("etl_id")
            .parquet(self.out_path)
        )
        rows = self.spark.read.parquet(self.out_path).filter(
            F.col("etl_id").isin(load_ids)
        ).count()
        new_loads.write.mode("append").parquet(self.ledger_path)
        return {"model": self.name, "new_loads": load_ids, "rows_appended": rows}

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.out_path)
