"""Streaming ingestion — the reference's PUT + COPY INTO loop run
continuously (SURVEY.md §2 J1 + H3/H5; reference README.md:86 points at
a companion real-time ingestion pipeline living out-of-repo).

``foreachBatch`` gives each micro-batch a transactional batch id; we
stamp it as BOTH the ETL id and the ETL timestamp (batch ids increase
monotonically, so latest-ETL-wins reads pick the newest batch — a
per-row event-time stamp would make max_by(etl_id, etl_timestamp)
arbitrary). Output partitions on (api_key, etl_id) and each batch
writes with DYNAMIC partition overwrite: foreachBatch is at-least-once,
and a replayed batch must rewrite its own partition, not append a
second copy.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def start_ingest_stream(
    events: DataFrame,
    out_path: str,
    checkpoint: str,
    api_key: str,
    trigger_available_now: bool = True,
) -> Any:
    """Continuously append the normalized event stream to the raw-log
    layout: (etl_timestamp, etl_id, event_type, api_key, event_date,
    raw_data) partitioned by api_key."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.select(
                # constant per load, monotonically increasing across
                # loads — the latest-ETL-wins contract
                F.lit(batch_id).cast("long").alias("etl_timestamp"),
                F.lit(f"stream-batch-{batch_id}").alias("etl_id"),
                "event_type",
                F.lit(api_key).alias("api_key"),
                F.to_date("ts").alias("event_date"),
                F.to_json(
                    F.struct(
                        "event_id",
                        F.col("user_id").cast("string").alias("session_id"),
                        F.col("ts_ms").cast("string").alias(
                            "server_timestamp_epoch_ms"
                        ),
                        "props",
                    )
                ).alias("raw_data"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("api_key", "etl_id")
            .parquet(out_path)
        )

    w = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
