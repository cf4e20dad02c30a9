"""Every queries() entry with an oracle twin must hash-match DuckDB —
the local replica of the driver's t2 gate (SURVEY.md §5 strategy 1)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.oracle import compare, duckdb_con

SF = "/root/testdata/sf0.001"


def _oracle_cases():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    return sorted(set(q) & set(o))


def _rows_only_cases():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    return sorted(set(q) - set(o))


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", _oracle_cases())
def test_oracle_parity(spark, con, name):
    df = entry_mod.queries()[name](spark, SF)
    compare(df, con, entry_mod.oracle_sql()[name])


@pytest.mark.parametrize("name", _rows_only_cases())
def test_rows_only_runs(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
