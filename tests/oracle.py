"""Local replica of the driver's DuckDB-oracle gate.

Runs a Spark query and its oracle SQL on the same parquet tables and
compares row count, column names, and order-insensitive values. Used by
tests so every ``queries()`` entry is exercised before the driver's t2
gate sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from post_modern_stack_spark.registry import TABLES, table_path

FLOAT_TOL = 1e-6


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, 6)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        return v

    out = df.map(norm)
    return out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c].tolist(), want[c].tolist()
        for i, (a, b) in enumerate(zip(g, w)):
            if isinstance(a, float) and isinstance(b, float):
                # NULLs in numeric columns round-trip as NaN through
                # pandas (None re-coerces to NaN in float64 columns, so
                # _canon can't normalize them away) — NaN on BOTH sides
                # is a match, not a mismatch
                ok = (math.isnan(a) and math.isnan(b)) or math.isclose(
                    a, b, rel_tol=FLOAT_TOL, abs_tol=FLOAT_TOL
                )
            else:
                ok = repr(a) == repr(b)
            assert ok, f"value mismatch col={c} row={i}: spark={a!r} oracle={b!r}"
