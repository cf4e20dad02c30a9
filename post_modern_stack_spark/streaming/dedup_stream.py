"""Streaming exact deduplication (SURVEY.md §2 J1/J2 × K1).

The batch K1 operator (operators/dedup.exact_dedup) reprocesses the
whole corpus per run — the reference's append-only-log posture
(reference README.md:80). The streaming form dedups INCREMENTALLY:
each micro-batch drops rows whose key was already seen, with state
bounded by the event-time watermark.

Spark-first: ``dropDuplicatesWithinWatermark`` (Spark 3.5+) is the
purpose-built primitive — it keeps one state row per key and expires
keys once the watermark passes them, so state size follows the
duplicate-arrival horizon (e.g. "dupes arrive within 10 minutes"),
NOT corpus size. That bound is what makes streaming dedup viable on an
unbounded 100 TB/day feed; a plain ``dropDuplicates`` on a stream
would accumulate state forever.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def dedup_events(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exactly-once event feed by key: first arrival wins, duplicates
    within the watermark horizon are dropped.

    Batch and streaming share the call so parity tests can run the
    same plan both ways: on a static frame the watermark is a no-op
    and dedup is the global exact K1 semantics; on a stream, state is
    watermark-bounded and duplicates separated by more than the
    horizon are NOT caught (that is the documented contract — pair
    with a periodic batch sweep for full-history guarantees, the
    standard lambda posture for dedup at scale).
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            list(keys)
        )
    return events.dropDuplicates(list(keys))
