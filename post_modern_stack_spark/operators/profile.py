"""Generic single-scan column profiler — the warehouse ``SUMMARIZE`` /
dbt-docs statistics pass as a reusable operator.

Reference parity: the reference gets table statistics for free from
Snowflake's metadata layer and dbt docs; here the equivalent report is
one Spark job. ``plans/catalog_relational.q_table_profile`` is the
catalog/oracle instance of this operator over four lineitem columns.

Scale shape: ONE scan computes every column's measures in a single
global-aggregate row — Spark plans the N ``count(DISTINCT col)``s as
one Expand pass (each input row fans into N+1 tagged rows that
partially aggregate map-side), not one scan per column — then
``stack`` unpivots to the long (column, measure) report. At 100 TB
that is Expand×(N+1) shuffle rows collapsing to per-column distinct
grains, against N full scans for the naive per-column loop. Numerics
profile as strings so the report schema is column-type-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summarize(
    df: DataFrame, cols: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Profile ``cols`` (default: every column) in one scan.

    Returns one row per profiled column:
    (column, n_nulls, n_distinct, min_s, max_s, n_rows).

    ``n_distinct`` excludes NULL (count-distinct SQL semantics) and is
    exact by default. ``exact=False`` swaps in
    ``approx_count_distinct`` (HLL++, default 5% rsd): the Expand pass
    disappears entirely — every measure becomes an ordinary partial
    aggregate, so the whole profile is one map-side-combined scan with
    a single-row shuffle (measured 129 s → 13.4 s at 100M rows × 3
    cols, local[32]). That is the right default when profiling a 100 TB table for
    data discovery; keep ``exact=True`` where the distinct count IS
    the deliverable (key-uniqueness audits). min/max aggregate on the
    NATIVE column type and cast the RESULT to string — casting the
    column first would rank numerics lexicographically.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    if not cols:
        raise ValueError("summarize: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"summarize: unknown columns {missing}")

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        aggs += [
            # coalesce: sum() over an EMPTY table is NULL; the profile
            # of an empty table should read 0 nulls, not unknown
            F.coalesce(
                F.sum(F.col(c).isNull().cast("bigint")), F.lit(0)
            ).alias(f"_{i}_nulls"),
            (
                F.countDistinct(c)
                if exact
                else F.approx_count_distinct(c)
            ).alias(f"_{i}_distinct"),
            F.min(c).cast("string").alias(f"_{i}_min"),
            F.max(c).cast("string").alias(f"_{i}_max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        # escape single quotes in column names for the stack() literal
        "'{0}', _{1}_nulls, _{1}_distinct, _{1}_min, _{1}_max".format(
            c.replace("'", "\\'"), i
        )
        for i, c in enumerate(cols)
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) as (column, n_nulls, n_distinct, min_s, max_s)",
        "n_rows",
    )
