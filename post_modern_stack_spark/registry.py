"""Table registry — name → DataFrame over the sf-dir parquet layout.

Replaces the reference's dbt ``ref()``/``var()`` Jinja indirection
(reference src/dbt/models/metaflow/shopping_events_exploded.sql:10,26 and
SURVEY.md §1.3): table identity is resolved here, once, instead of at
SQL-compile time. DataFrames are lazy, so a registered view has exactly
the recompute-on-read semantics of the reference's dbt view
materialization (reference src/dbt/dbt_project.yml:27).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from post_modern_stack_spark.session import ensure_session_confs

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one registry table, normalizing physical quirks.

    ``events.ts`` has shipped both as parquet TIMESTAMP(NANOS) (Spark
    reads it only as a nanosecond long via ``nanosAsLong``) and as
    TIMESTAMP(MICROS) (native TimestampType). Either way we expose:
      - ``ts``     TimestampType (microsecond precision, UTC) — for
                   date math and windowing;
      - ``ts_ns``  LongType epoch nanoseconds — the exact ordering /
                   tie-break key (SURVEY.md §7 watch-list 1);
      - ``ts_ms``  LongType epoch milliseconds — the reference's native
                   event-time unit (reference upload_to_snowflake.py:59).
    Integer division (``DIV``) keeps full precision; ns epoch values
    exceed 2**53 so float math would corrupt them.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        orig_cols = df.columns  # 'ts' keeps its original slot in both paths
        if ts_type == "bigint":
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts", F.expr("timestamp_micros(ts_ns DIV 1000)"))
                .withColumn("ts_ms", F.expr("ts_ns DIV 1000000"))
            )
        elif ts_type in ("timestamp", "timestamp_ntz"):
            if ts_type == "timestamp_ntz":
                # isAdjustedToUTC=false parquet stamps; session tz is
                # pinned to UTC so the NTZ wall clock IS the UTC instant.
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
            df = df.withColumn("ts_ns", F.expr("unix_micros(ts) * 1000")).withColumn(
                "ts_ms", F.expr("unix_micros(ts) DIV 1000")
            )
        else:
            # Fail loudly instead of letting unix_micros() raise a cryptic
            # AnalysisException downstream (ADVICE.md round 1).
            raise TypeError(
                f"events.ts has unsupported type {ts_type!r}; expected "
                "bigint epoch-ns, timestamp, or timestamp_ntz"
            )
        # Fixed-order schema regardless of which physical variant shipped,
        # so positional consumers (union-by-position, schema snapshots)
        # see one schema (ADVICE.md round 1).
        df = df.select(*orig_cols, "ts_ns", "ts_ms")
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Register every table as a temp view for the SQL surface.

    Mirrors dbt materializing models as views: lazily evaluated,
    recomputed on read, zero storage (SURVEY.md §1.1 row 2).
    """
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def register_model_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the transformation-DAG models as temp views over the
    driver-shaped events table, exposing the dbt surface to
    ``spark.sql`` users: querying ``session_events`` recomputes both
    models exactly like Snowflake inlining the dbt view chain
    (SURVEY.md §3 entry 2).
    """
    from post_modern_stack_spark.operators.sessionize import (
        driver_events_exploded,
        driver_session_events,
    )

    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    driver_events_exploded(ev).createOrReplaceTempView("events_exploded")
    driver_session_events(ev).createOrReplaceTempView("session_events")
    return ["events", "events_exploded", "session_events"]
