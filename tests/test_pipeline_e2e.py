"""End-to-end pipeline test on a reference-shaped fixture
(SURVEY.md §5 strategies 3-4): ingest → explode → sessionize → extract
→ split → encode, asserting the A7 ordering contract exactly plus the
sessionization invariants.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from post_modern_stack_spark.operators.sessionize import (
    events_exploded,
    latest_etl,
    session_events,
)
from post_modern_stack_spark.plans.nep_flow import run_nep_flow
from post_modern_stack_spark.sources import ingest

API_A = "aaaaaaaa-0000-0000-0000-000000000000"
API_B = "bbbbbbbb-0000-0000-0000-000000000000"

BASE_MS = 1_547_528_000_000  # 2019-01-15ish, matching reference date era


def _event(sku, ms, action="detail", etype="event_product", session="s1"):
    return Row(
        event_type=etype,
        hashed_url=f"url-{sku}",
        product_action=action,
        product_sku=sku,
        server_timestamp_epoch_ms=str(ms),  # STRING holding an int (A2)
        session_id=session,
    )


@pytest.fixture(scope="module")
def raw_log(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rawlog") / "raw_events")
    # session s1: deliberate duplicate timestamp (tie-break by sku),
    # uppercase + space sku (C1/C2), >3 events
    s1 = [
        _event("SKU A", BASE_MS + 1000),
        _event("beta", BASE_MS + 2000),
        _event("alpha", BASE_MS + 3000),
        _event("zeta", BASE_MS + 3000),  # tie with alpha at +3000
        _event("last", BASE_MS + 9000, action="purchase"),
    ]
    # session s2: includes filtered-out actions/types + a null sku event
    s2 = [
        _event("x1", BASE_MS + 1000, session="s2"),
        _event(None, BASE_MS + 1500, etype="pageview", session="s2"),
        _event("x2", BASE_MS + 2000, action="remove", session="s2"),  # filtered
        _event("x3", BASE_MS + 3000, action="add", session="s2"),
        _event("x4", BASE_MS + 4000, action="purchase", session="s2"),
    ]
    # session s3: long session (>20 events) for pad-truncation
    s3 = [
        _event(f"t{i:02d}", BASE_MS + 1000 * i, session="s3") for i in range(25)
    ]
    # tenant B session, must be excluded by the api_key filter
    sb = [_event(f"b{i}", BASE_MS + 1000 * i, session="sb") for i in range(4)]

    sessions_a = spark.createDataFrame(
        [Row(events=s1), Row(events=s2), Row(events=s3)]
    )
    sessions_b = spark.createDataFrame([Row(events=sb)])

    # two loads for tenant A: the first must lose to the second
    # ("latest ETL wins", shopping_events_exploded.sql:7-13)
    ingest.ingest_events(
        sessions_a, out, API_A, etl_id="etl-old", etl_timestamp_ms=BASE_MS - 10
    )
    ingest.ingest_events(
        sessions_a, out, API_A, etl_id="etl-new", etl_timestamp_ms=BASE_MS + 10
    )
    ingest.ingest_events(
        sessions_b, out, API_B, etl_id="etl-new", etl_timestamp_ms=BASE_MS + 10
    )
    return out


def test_ingest_schema_and_append(spark, raw_log):
    raw = ingest.read_raw_events(spark, raw_log)
    assert set(raw.columns) == {
        "etl_timestamp",
        "etl_id",
        "event_type",
        "api_key",
        "event_date",
        "raw_data",
    }
    # append-only: both loads present (35 events * 2 loads + 4)
    assert raw.count() == 35 * 2 + 4
    payload = json.loads(raw.select("raw_data").first()["raw_data"])
    assert "session_id" in payload and "server_timestamp_epoch_ms" in payload


def test_latest_etl_selection(spark, raw_log):
    raw = ingest.read_raw_events(spark, raw_log)
    assert latest_etl(raw).collect()[0]["etl_id"] == "etl-new"
    flat = events_exploded(raw)
    assert flat.select("etl_id").distinct().collect()[0]["etl_id"] == "etl-new"
    assert flat.count() == 35 + 4  # one load's worth


def test_session_arrays_ordered_exactly(spark, raw_log):
    """The A7 contract: time-ordered, (ts, sku) tie-break, normalized
    SKUs, filtered actions only."""
    sess = session_events(events_exploded(ingest.read_raw_events(spark, raw_log)))
    rows = {r["session_id"]: r for r in sess.collect()}
    # s1: 'SKU A'→'sku_a'; tie at +3000 breaks alpha<zeta; remove/pageview absent
    assert rows["s1"]["interactions"] == ["sku_a", "beta", "alpha", "zeta", "last"]
    # s2: 'remove' action and 'pageview' type filtered out
    assert rows["s2"]["interactions"] == ["x1", "x3", "x4"]
    # s3: full 25 in time order
    assert rows["s3"]["interactions"] == [f"t{i:02d}" for i in range(25)]
    # session_date stamped from first event of the session
    assert str(rows["s1"]["session_date"]) == "2019-01-15"


def test_sessionization_invariants(spark, raw_log):
    """Property: Σ size(interactions) == count(kept events); every
    array is time-sorted (verified against the exploded source)."""
    flat = events_exploded(ingest.read_raw_events(spark, raw_log))
    kept = flat.filter(
        (F.col("event_type") == "event_product")
        & F.col("product_action").isin("detail", "add", "purchase")
    )
    sess = session_events(flat)
    total = sess.agg(F.sum(F.size("interactions"))).collect()[0][0]
    assert total == kept.count()


def test_full_nep_flow(spark, raw_log, tmp_path):
    raw = ingest.read_raw_events(spark, raw_log)
    out = run_nep_flow(
        spark,
        raw,
        str(tmp_path),
        "run-1",
        api_key=API_A,
        start_date="2019-01-01",
        end_date="2019-03-14",
    )
    assert out["manifest"]["order"] == ["events_exploded", "session_events"]
    assert out["metrics"]["n_sessions"] == 3.0
    assert out["metrics"]["n_train"] + out["metrics"]["n_test"] == 3.0

    ds = spark.read.parquet(out["run_dir"] + "/dataset")
    row = {r["session_id"]: r for r in ds.collect()}
    # D2/D3: x = prefix, y = last
    assert row["s1"]["x"] == ["sku_a", "beta", "alpha", "zeta"]
    assert row["s1"]["y"] == "last"
    # D4: padded to exactly MAX_LEN, left-padded with 0
    assert all(len(r["x_padded"]) == 20 for r in row.values())
    assert row["s1"]["x_padded"][:16] == [0] * 16
    # s3: 24-long x keeps LAST 20 encoded ids (pre-truncation)
    assert row["s3"]["x_padded"] == row["s3"]["x_enc"][-20:]
    # F2: encoded ids ≥ 1; y_label = y_enc - 1 (the off-by-one trap)
    assert all(r["y_label"] == r["y_enc"] - 1 for r in row.values())


def test_resume_skips_completed_stages(spark, raw_log, tmp_path):
    """Metaflow ``resume`` parity (I1): a second run under the same
    run_id with resume=True reads every complete checkpoint back
    instead of recomputing — artifacts untouched on disk, recorded row
    counts replayed from the stage metadata sidecars, and the final
    outputs identical. A fresh run_id still computes everything."""
    import os

    raw = ingest.read_raw_events(spark, raw_log)
    kw = dict(api_key=API_A, start_date="2019-01-01", end_date="2019-03-14")
    out1 = run_nep_flow(spark, raw, str(tmp_path), "run-res", **kw)
    assert out1["resumed_stages"] == []

    def artifact_mtimes():
        seen = {}
        for stage in out1["stages"]:
            d = os.path.join(out1["run_dir"], stage)
            seen[stage] = {
                f: os.path.getmtime(os.path.join(d, f)) for f in os.listdir(d)
            }
        return seen

    before = artifact_mtimes()
    out2 = run_nep_flow(spark, raw, str(tmp_path), "run-res", resume=True, **kw)
    assert out2["resumed_stages"] == out1["stages"]
    assert out2["stage_rows"] == out1["stage_rows"]
    assert out2["metrics"] == out1["metrics"]
    assert artifact_mtimes() == before, "resume must not rewrite artifacts"

    # a stage with no complete checkpoint recomputes: delete the
    # _SUCCESS marker of one stage and resume again
    victim = out1["stages"][1]
    os.remove(os.path.join(out1["run_dir"], victim, "_SUCCESS"))
    out3 = run_nep_flow(spark, raw, str(tmp_path), "run-res", resume=True, **kw)
    assert victim not in out3["resumed_stages"]
    assert out3["stage_rows"] == out1["stage_rows"]

    # a present-but-truncated metadata sidecar (process killed
    # mid-write under a pre-atomic-rename layout) must RECOMPUTE the
    # stage, not crash the resumed run (ADVICE r04)
    victim2 = out1["stages"][0]
    with open(os.path.join(out1["run_dir"], f"{victim2}.meta.json"), "w") as f:
        f.write('{"stage": "' + victim2 + '", "ro')  # truncated JSON
    out4 = run_nep_flow(spark, raw, str(tmp_path), "run-res", resume=True, **kw)
    assert victim2 not in out4["resumed_stages"]
    assert out4["stage_rows"] == out1["stage_rows"]


def test_stage_rows_observed_without_extra_jobs(spark, raw_log, tmp_path):
    """I-family observability: every checkpoint records its row count
    via df.observe (accumulated during the write, no second count job)
    and the counts match the artifacts on disk."""
    raw = ingest.read_raw_events(spark, raw_log)
    out = run_nep_flow(
        spark,
        raw,
        str(tmp_path),
        "run-obs",
        api_key=API_A,
        start_date="2019-01-01",
        end_date="2019-03-14",
    )
    for name, rows in out["stage_rows"].items():
        assert rows is not None
        on_disk = spark.read.parquet(out["run_dir"] + "/" + name).count()
        assert rows == on_disk, name
