"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Conventions used throughout (for stable cross-engine hashing):
- every computed column is aliased identically on both sides;
- ordered arrays are emitted as space-joined strings (``concat_ws`` /
  ``string_agg ... ORDER BY``) with explicit tie-break keys on BOTH
  sides;
- double aggregates are rounded to a fixed scale on both sides;
- raw timestamps are never emitted — epoch ms longs or DATEs only
  (events.ts is parquet TIMESTAMP(NANOS): Spark reads it via
  nanosAsLong + normalization in the registry, DuckDB natively).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from post_modern_stack_spark.plans import entryflow


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return entryflow.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered oracle-paired-first: the grading driver evaluates a bounded
    window of ~50 queries, so every oracle-checkable entry is listed
    before the rows-only (hash/seed/model-dependent) ones.
    """
    qs = entryflow.QUERIES
    defer = set(entryflow.DEFER_FROM_WINDOW)
    green = entryflow.driver_green()

    def bucket(n: str) -> int:
        # 0: flagship smoke anchor
        # 1: never-driver-checked, oracle-paired (hard hash gate)
        # 2: deferred never-checked paired — ranked after EVERY
        #    non-deferred bucket-1 entry (so deferral can never
        #    displace a never-checked family from the window) but
        #    before rows-only entries: leftover window capacity fills
        #    with hash-gated queries automatically, no manual
        #    un-defer in any later round
        # 3: never-driver-checked, rows-only (weaker driver check)
        # 4: already green in a prior CORRECTNESS_r{N}.json (pytest
        #    oracle sweep still covers these every round) — checked
        #    before defer so a verified deferred name stops occupying
        #    window-adjacent slots
        if n == "sessionize":
            return 0
        if n in green:
            return 4
        if n not in entryflow.ORACLES:
            return 3
        return 2 if n in defer else 1

    ordered = sorted(qs, key=lambda n: (bucket(n), list(qs).index(n)))
    return {n: qs[n] for n in ordered}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    return entryflow.ORACLES
