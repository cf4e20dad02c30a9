"""transformWithStateInPandas (state API v2) session operator.

The full parity test runs only where ``google.protobuf`` (the state
server protocol dependency) is installed; in this container the
operator is implemented but gated, and we assert the gate itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from post_modern_stack_spark.registry import load_table
from post_modern_stack_spark.streaming import sessionize_stream as S

SF = "/root/testdata/sf0.001"

try:
    from google.protobuf import descriptor  # noqa: F401

    HAVE_PROTOBUF = True
except ImportError:
    HAVE_PROTOBUF = False


@pytest.mark.skipif(HAVE_PROTOBUF, reason="protobuf present: gate not applicable")
def test_tws_gate_raises_clear_error(spark, tmp_path):
    src = str(tmp_path / "in")
    load_table(spark, SF, "events").select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type", "value", "props"
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = S.stream_events(spark, src)
    with pytest.raises(NotImplementedError, match="protobuf"):
        S.stateful_session_arrays_v2(stream)


@pytest.mark.skipif(not HAVE_PROTOBUF, reason="google.protobuf not installed")
def test_tws_sessions_match_batch(spark, tmp_path):
    """Closed sessions must match batch gap-sessionized ordered arrays
    (subset: final sessions' timers never fire in availableNow runs)."""
    from pyspark.sql import Window

    src = str(tmp_path / "in")
    ev = load_table(spark, SF, "events")
    ev.select(
        "event_id", F.col("ts_ns").alias("ts"), "user_id", "event_type", "value", "props"
    ).orderBy("ts_ns").coalesce(1).write.mode("overwrite").parquet(src)

    stream = S.stream_events(spark, src)
    out = S.stateful_session_arrays_v2(stream, gap_ms=60_000, watermark="0 seconds")
    q = (
        out.writeStream.format("memory")
        .queryName("tws_sess")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], tuple(r["interactions"]))
        for r in spark.table("tws_sess").collect()
    }
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    numbered = (
        ev.select("user_id", "ts_ns", "event_id", "ts_ms",
                  F.get_json_object("props", "$.k").alias("k"))
        .withColumn("prev", F.lag("ts_ms").over(w))
        .withColumn(
            "new_s",
            (F.col("prev").isNull() | (F.col("ts_ms") - F.col("prev") > 60_000)).cast("int"),
        )
        .withColumn(
            "sess_no",
            F.sum("new_s").over(
                Window.partitionBy("user_id")
                .orderBy("ts_ns", "event_id")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    batch = {
        (r["user_id"], tuple(r["arr"]))
        for r in numbered.groupBy("user_id", "sess_no")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts_ns", "event_id", "k"))),
                lambda s: s.getField("k"),
            ).alias("arr")
        )
        .collect()
    }
    assert got and got <= batch
