"""dbt-generic expectations + incremental materialization tests."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from post_modern_stack_spark.operators import expectations as E
from post_modern_stack_spark.plans.incremental import IncrementalModel
from post_modern_stack_spark.registry import load_table

SF = "/root/testdata/sf0.001"


def test_four_generic_expectations(spark):
    orders = load_table(spark, SF, "orders")
    customer = load_table(spark, SF, "customer")
    report = E.run_expectations(
        spark,
        orders,
        {
            "unique": ["o_orderkey"],
            "not_null": ["o_orderkey", "o_custkey"],
            "accepted_values": {"o_orderstatus": ["F", "O", "P"]},
            "relationships": {"o_custkey": ("customer", "c_custkey")},
        },
        parents={"customer": customer},
    )
    rows = {(r["check"], r["column"]): r["violations"] for r in report.collect()}
    assert all(v == 0 for v in rows.values()), rows
    assert len(rows) == 5


def test_expectations_catch_violations(spark):
    df = spark.createDataFrame(
        [Row(id=1, s="a"), Row(id=1, s="zz"), Row(id=None, s="b")]
    )
    parent = spark.createDataFrame([Row(pid=1)])
    report = E.run_expectations(
        spark,
        df,
        {
            "unique": ["id"],
            "not_null": ["id"],
            "accepted_values": {"s": ["a", "b"]},
            "relationships": {"id": ("p", "pid")},
        },
        parents={"p": parent},
    )
    rows = {(r["check"], r["column"]): r["violations"] for r in report.collect()}
    assert rows[("unique", "id")] == 1       # duplicate id=1
    assert rows[("not_null", "id")] == 1     # one NULL
    assert rows[("accepted_values", "s")] == 1  # 'zz'
    assert rows[("relationships", "id")] == 0   # NULL isn't an orphan; 1s have parent


def test_incremental_model_processes_each_load_once(spark, tmp_path):
    from post_modern_stack_spark.operators.sessionize import events_exploded
    from post_modern_stack_spark.sources import ingest

    def make_load(etl_id, ts_base):
        events = [
            Row(
                event_type="event_product",
                hashed_url="u",
                product_action="detail",
                product_sku=f"sku-{etl_id}-{i}",
                server_timestamp_epoch_ms=str(ts_base + i * 1000),
                session_id=f"s-{etl_id}",
            )
            for i in range(4)
        ]
        return spark.createDataFrame([Row(events=events)])

    raw_path = str(tmp_path / "raw")
    ingest.ingest_events(make_load("L1", 1_547_528_000_000), raw_path, "t1",
                         etl_id="L1", etl_timestamp_ms=1000)

    # incremental flattening model: per-load JSON explode WITHOUT the
    # latest-ETL filter (each load is its own increment)
    def flatten(raw_slice):
        from post_modern_stack_spark.functions import json_get

        return raw_slice.select(
            "etl_id",
            "api_key",
            json_get("raw_data", "session_id", "string").alias("session_id"),
            json_get("raw_data", "product_sku", "string").alias("sku"),
            json_get("raw_data", "server_timestamp_epoch_ms", "long").alias("ts_ms"),
        )

    model = IncrementalModel(spark, "events_flat", flatten, str(tmp_path / "models"))

    r1 = model.refresh(ingest.read_raw_events(spark, raw_path))
    assert r1["new_loads"] == ["L1"] and r1["rows_appended"] == 4

    # no new loads → no work
    r2 = model.refresh(ingest.read_raw_events(spark, raw_path))
    assert r2["new_loads"] == [] and r2["rows_appended"] == 0

    # second load → only the delta is processed
    ingest.ingest_events(make_load("L2", 1_547_529_000_000), raw_path, "t1",
                         etl_id="L2", etl_timestamp_ms=2000)
    r3 = model.refresh(ingest.read_raw_events(spark, raw_path))
    assert r3["new_loads"] == ["L2"] and r3["rows_appended"] == 4

    out = model.read()
    assert out.count() == 8
    assert out.select("etl_id").distinct().count() == 2
    # incremental output == full recompute over the whole log
    # (partitionBy moves etl_id to the end on read-back — fix an order)
    cols = ["etl_id", "api_key", "session_id", "sku", "ts_ms"]
    full = flatten(ingest.read_raw_events(spark, raw_path))
    assert sorted(map(tuple, out.select(*cols).collect())) == sorted(
        map(tuple, full.select(*cols).collect())
    )

def test_incremental_replay_is_idempotent(spark, tmp_path):
    """Crash-window simulation: data written but ledger lost → the
    retry must REWRITE the load's partition, not duplicate it."""
    import shutil

    from post_modern_stack_spark.functions import json_get
    from post_modern_stack_spark.sources import ingest

    events = [
        Row(
            event_type="event_product",
            hashed_url="u",
            product_action="detail",
            product_sku=f"sku-{i}",
            server_timestamp_epoch_ms=str(1_547_528_000_000 + i),
            session_id="s",
        )
        for i in range(5)
    ]
    raw_path = str(tmp_path / "raw")
    ingest.ingest_events(
        spark.createDataFrame([Row(events=events)]), raw_path, "t1",
        etl_id="L1", etl_timestamp_ms=1000,
    )

    def flatten(raw_slice):
        return raw_slice.select(
            "etl_id", json_get("raw_data", "product_sku", "string").alias("sku")
        )

    model = IncrementalModel(spark, "m", flatten, str(tmp_path / "models"))
    r1 = model.refresh(ingest.read_raw_events(spark, raw_path))
    assert r1["rows_appended"] == 5
    # simulate: output committed, ledger write lost
    shutil.rmtree(model.ledger_path)
    r2 = model.refresh(ingest.read_raw_events(spark, raw_path))
    assert r2["new_loads"] == ["L1"]
    assert model.read().count() == 5  # rewritten, not doubled
