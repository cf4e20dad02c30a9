"""Change-data-capture application + slowly-changing-dimension history
(warehouse maintenance surface; SURVEY.md §2 H/I families widened).

The reference maintains state by full destructive reload
(upload_to_snowflake.py:152-207 DROP+COPY); these operators are the
incremental alternatives a Spark warehouse actually runs at 100 TB:
apply a keyed change feed to a snapshot (MERGE semantics without a
table format), and reconstruct validity intervals from an event log
(SCD type 2).

Both are single-window-pass plans: one shuffle on the key, no
self-joins, no driver round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Latest-wins MERGE: union snapshot (as low-sequence upserts) with
    the change feed, keep each key's highest-(seq, op) row, drop rows
    whose winner is a delete.

    ``snapshot`` must NOT carry ``op_col``; every snapshot row is
    treated as an upsert at its ``seq_col`` value (pass a constant
    column if the snapshot is unversioned). Ties on ``seq_col`` break
    toward the delete ('D' sorts before 'U') so a same-sequence
    delete+upsert pair resolves deterministically.

    One shuffle on ``key_cols``; the window's per-key sort is bounded
    by that key's change count, so a hot key degrades to its own
    history length, not the table size.
    """
    snap = snapshot.withColumn(op_col, F.lit("U"))
    cols = snap.columns
    unioned = snap.select(cols).unionByName(changes.select(cols))
    # seq DESC primary (newest change wins); op ASC secondary — 'D' < 'U',
    # so a same-sequence delete sorts ahead of the update and wins the tie
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc(seq_col), F.asc(op_col)
    )
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn", op_col)
    )


def scd2_intervals(
    events: DataFrame,
    key_cols: list[str],
    attr_col: str,
    seq_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """SCD type-2 reconstruction: collapse an event log into validity
    intervals — one row per (key, attribute run) with
    ``valid_from``/``valid_to`` sequence bounds (``valid_to`` NULL for
    the current run).

    Run detection is the classic gaps-and-islands pair of windows
    (lag → change flag → running sum = run id), then one aggregation
    per run. All three passes share the same (key) partitioning, so
    Catalyst plans ONE exchange and reuses the sort.
    """
    ties = tie_cols or []
    w = Window.partitionBy(*key_cols).orderBy(seq_col, *ties)
    flagged = events.withColumn(
        "_chg",
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col)),
            1,
        ).otherwise(0),
    ).withColumn("_run", F.sum("_chg").over(w))
    runs = flagged.groupBy(*key_cols, "_run").agg(
        F.first(attr_col).alias(attr_col),
        F.min(seq_col).alias("valid_from"),
        F.max(seq_col).alias("_run_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_runs = Window.partitionBy(*key_cols).orderBy("valid_from")
    return (
        runs.withColumn("valid_to", F.lead("valid_from").over(w_runs))
        .drop("_run", "_run_end")
    )
