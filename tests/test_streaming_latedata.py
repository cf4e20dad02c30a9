"""J2 watermark semantics: a record arriving far behind the watermark
must be dropped from already-finalized windows (late-data contract).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from post_modern_stack_spark.streaming import sessionize_stream as S

NS = 1_000_000_000
BASE = 1_700_000_000 * NS  # arbitrary epoch anchor


def _write_file(path, rows):
    """Write one raw parquet file into the watched directory (schema =
    EVENTS_STREAM_SCHEMA physical layout: ts as ns longs)."""
    cols = {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
    }
    pq.write_table(pa.table(cols), path)


def test_watermark_drops_very_late_rows(spark, tmp_path):
    watch = tmp_path / "in"
    watch.mkdir()
    # batch 1: two 1-hour windows' worth of events, advancing event time
    _write_file(
        str(watch / "a.parquet"),
        [
            (1, BASE + 0, 1, "view", 1.0),
            (2, BASE + 30 * 60 * NS, 1, "view", 1.0),   # window W0 [0h,1h)
            (3, BASE + 90 * 60 * NS, 1, "view", 1.0),   # window W1 [1h,2h)
            (4, BASE + 10 * 3600 * NS, 1, "view", 1.0), # window W10, pushes watermark far ahead
        ],
    )
    stream = S.stream_events(spark, str(watch))
    agg = S.windowed_event_counts(stream, "1 hour", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            (r["window_start"], r["n_events"])
            for r in spark.table("late_test").collect()
        }
        # W0/W1 finalized (watermark = 10h - 10min); W10 still open
        assert {n for _, n in first} and len(first) == 2

        # batch 2: a VERY late event for W0 (hours behind watermark)
        _write_file(
            str(watch / "b.parquet"),
            [(5, BASE + 45 * 60 * NS, 1, "view", 1.0)],
        )
        q.processAllAvailable()
        second = {
            (r["window_start"], r["n_events"])
            for r in spark.table("late_test").collect()
        }
        # the late row must NOT resurrect or amend the closed W0:
        # no new row for W0, counts unchanged
        assert second == first
    finally:
        q.stop()
