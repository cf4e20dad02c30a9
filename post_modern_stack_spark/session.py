"""SparkSession factory — the engine's single entry point for compute.

The reference delegates execution to Snowflake (SURVEY.md §4: "the
reference implements no optimizer and no execution engine"); here the
equivalent role is played by Catalyst + Tungsten, so session-level
configuration IS the engine tuning surface.

Scale posture (100 TB / 1000-executor design, tested on local[32]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  dynamic join-strategy switching — replaces hand-scheduling.
- Timezone pinned to UTC: the reference derived dates from epoch ms in
  *local* time (reference upload/upload_to_snowflake.py:168-169); we pin
  UTC and document it (SURVEY.md §7 watch-list 4) so results are
  machine-independent.
- Arrow enabled for any pandas boundary (the ML edge, pandas UDFs).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32  # sized for local[32]; a real cluster
# would set ~2-3x total cores, or rely on AQE coalescing from a high
# initial value. AQE re-coalesces at runtime either way.


def get_spark(
    app_name: str = "post-modern-stack-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine session with scale-ready defaults."""
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode runs executors inside the driver JVM; the 1g
        # default heap GC-thrashes under 32 task threads. Sized for the
        # 128 GiB container; on a real cluster executor memory is the
        # knob instead.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # the driver's events table carries TIMESTAMP(NANOS) parquet
        # timestamps, which Spark's parquet reader rejects by default;
        # read them as raw nanosecond longs and normalize in the
        # registry (registry.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Python-worker lifecycle pinned EXPLICITLY (VERDICT r11 item 7:
        # the media/codec family swings 1.5-3x in windows where workers
        # churn — cold fork + module imports charged to whichever
        # Python-band query runs first). These are the 4.1.2 defaults,
        # pinned so a packaging/default change can never silently
        # enable idle-kill or bound the reuse pool: workers are reused
        # across tasks, never terminated on idle, and the idle pool is
        # unbounded (local[32] peaks at 32 workers; at 100 TB scale the
        # per-executor pool is cores-per-executor sized, still small).
        .config("spark.python.worker.reuse", "true")
        .config("spark.python.worker.idleTimeoutSeconds", "0")
        .config("spark.python.worker.killOnIdleTimeout", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.ui.explainMode", "formatted")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ensure_session_confs(spark)
    return spark


def ensure_session_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs the engine depends on.

    Called defensively from the registry too, because the grading driver
    constructs its own SparkSession (without our builder confs) and then
    calls ``entry(spark)``.
    """
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            # static / unknown conf on this build — engine still works,
            # only the events-table ns-timestamp read path needs the
            # first one, and that raises loudly on its own if unset.
            pass
    return spark


@contextmanager
def elevated_shuffle_partitions(spark: SparkSession, n: int):
    """Context manager: raise the session's shuffle-partition count —
    BOTH ``spark.sql.shuffle.partitions`` and AQE's
    ``initialPartitionNum`` (AQE can only coalesce DOWN from the
    initial number, so a 32-partition default silently caps every
    shuffle regardless of data size) — for the enclosed actions, then
    restore the previous values.

    This is the per-action partition hint (VERDICT r10 item 5):
    operators whose shuffle GRAIN is corpus-exploded (positional
    grams ~ tokens, not docs) size their aggregates from an estimated
    grain row count instead of requiring the caller to pre-size the
    session for the largest stage. Never LOWERS the setting: if the
    session already runs wider, the hint is a no-op.
    """
    conf = spark.conf
    init_key = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"
    prev_parts = conf.get("spark.sql.shuffle.partitions")
    try:
        prev_init = conf.get(init_key)
    except Exception:
        prev_init = None
    if n <= int(prev_parts):
        yield
        return
    conf.set("spark.sql.shuffle.partitions", str(n))
    conf.set(init_key, str(n))
    try:
        yield
    finally:
        conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_init is None:
            conf.unset(init_key)
        else:
            conf.set(init_key, prev_init)
