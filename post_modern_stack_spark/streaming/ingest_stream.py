"""Streaming ingestion — the reference's PUT + COPY INTO loop run
continuously (SURVEY.md §2 J1 + H3/H5; reference README.md:86 points at
a companion real-time ingestion pipeline living out-of-repo).

``foreachBatch`` gives each micro-batch a transactional batch id; we
stamp it as the ETL id (the streaming analog of
upload_to_snowflake.py:152-154's per-load uuid), append to the same
partitioned parquet layout batch ingestion writes, and the checkpoint
makes re-delivery idempotent at the batch level (a replayed batch
rewrites the same etl_id, preserving latest-ETL-wins reads).
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
                F.col("ts_ms").alias("etl_timestamp"),
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
            .write.mode("append")
            .partitionBy("api_key")
            .parquet(out_path)
        )

    w = (
        events.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
