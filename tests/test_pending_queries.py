"""Round-6 staging gate: every pending catalog query must already pass
the same DuckDB oracle parity the driver will apply after promotion,
and must NOT leak into the frozen registry (tests/test_catalog_freeze
holds the catalog at 212 until CORRECTNESS_r05.json lands)."""

from __future__ import annotations

import pytest

from post_modern_stack_spark.plans.catalog_pending import (
    PENDING_ORACLES,
    PENDING_QUERIES,
)
from tests.oracle import compare, duckdb_con

SF = "/root/testdata/sf0.001"
DRIVER_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    c = duckdb_con(SF)
    yield c
    c.close()


def test_pending_names_not_registered():
    from post_modern_stack_spark.plans import entryflow

    leaked = set(PENDING_QUERIES) & set(entryflow.QUERIES)
    assert not leaked, (
        f"pending queries registered during the round-5 freeze: {leaked}"
    )


def test_every_pending_query_is_oracle_paired():
    assert set(PENDING_QUERIES) == set(PENDING_ORACLES)


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_pending_oracle_parity(spark, con, name):
    compare(PENDING_QUERIES[name](spark, SF), con, PENDING_ORACLES[name])


@pytest.mark.parametrize("name", sorted(PENDING_QUERIES))
def test_pending_oracle_parity_at_driver_sf(spark, name):
    """sf0.01 is where the 16-row blocks actually decompose clusters
    (see test_sharded_multiblock_actually_exercised) — parity at
    sf0.001 alone would never run the block-pair join."""
    con = duckdb_con(DRIVER_SF)
    try:
        compare(
            PENDING_QUERIES[name](spark, DRIVER_SF), con, PENDING_ORACLES[name]
        )
    finally:
        con.close()


@pytest.mark.parametrize("name", sorted(PENDING_ORACLES))
def test_pending_oracle_not_vacuous_at_driver_sf(name):
    con = duckdb_con(DRIVER_SF)
    try:
        assert len(con.execute(PENDING_ORACLES[name]).df()) > 0
    finally:
        con.close()


def test_sharded_multiblock_actually_exercised(spark):
    """At the driver SF the 16-row blocks must decompose at least one
    cluster into multiple blocks — otherwise the parity run proves
    nothing about the block-pair join (the whole point of staging)."""
    from pyspark.sql import functions as F

    from post_modern_stack_spark.registry import load_table

    sizes = (
        load_table(spark, DRIVER_SF, "embeddings")
        .groupBy("label")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert sizes > 16, f"largest cluster {sizes} rows <= one 16-row block"
