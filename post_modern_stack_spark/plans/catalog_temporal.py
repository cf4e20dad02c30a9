"""Temporal-join queries: as-of and range (interval) joins on the
driver's ``events`` table.

The reference engine family exposes temporal joins as first-class
operators; Spark has no built-in, so these are the catalog entries for
``operators.asof`` (union-window idiom) and ``operators.rangejoin``
(bucketed interval join). Both have exact DuckDB twins (``ASOF JOIN``
/ inequality join), making them fully oracle-checkable.

Millisecond epoch is the join axis on BOTH sides (``ts_ms`` ↔
``epoch_ms(ts)``) so Spark and DuckDB compare identical integers; the
right side is deduplicated per (user, ms) with a max-event_id
tie-break so as-of tie semantics are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from post_modern_stack_spark.operators.asof import asof_join
from post_modern_stack_spark.operators.rangejoin import interval_join_buckets
from post_modern_stack_spark.functions.core import cents, sum128
from post_modern_stack_spark.plans.entryflow import query
from post_modern_stack_spark.registry import load_table

_HOUR_MS = 3_600_000


def _views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View events keyed for the as-of right side.

    No dedup pass: equal-(user, ms) ties are resolved inside the as-of
    window itself (``right_tie`` last-wins = max view_id), matching the
    oracle's QUALIFY dedup without an extra exchange.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts_ms").alias("t_ms"),
        F.col("ts_ms").alias("view_ms"),
        F.col("event_id").alias("view_id"),
        F.round("value", 2).alias("view_value"),
    )


def _purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_ms").alias("t_ms"),
    )


@query(
    "purchase_last_view",
    oracle="""
    WITH v AS (
      SELECT user_id,
             epoch_ms(ts)    AS t_ms,
             event_id        AS view_id,
             round(value, 2) AS view_value
      FROM events
      WHERE event_type = 'view'
      QUALIFY row_number() OVER (PARTITION BY user_id, epoch_ms(ts)
                                 ORDER BY event_id DESC) = 1
    ), p AS (
      SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS t_ms
      FROM events
      WHERE event_type = 'purchase'
    )
    SELECT p.user_id,
           p.purchase_id,
           p.t_ms            AS purchase_ms,
           v.view_id,
           v.t_ms            AS view_ms,
           p.t_ms - v.t_ms   AS gap_ms,
           v.view_value
    FROM p ASOF JOIN v
      ON p.user_id = v.user_id AND p.t_ms >= v.t_ms
    """,
)
def q_purchase_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent view
    at-or-before it (inner — purchases with no prior view drop, keeping
    every output column non-null for stable cross-engine hashing).

    Union-window strategy (operators/asof.py): one shuffle on user_id,
    JVM-only, vs DuckDB's native ``ASOF JOIN``.
    """
    purchases = _purchases(spark, sf_dir)
    matched = asof_join(
        purchases,
        _views(spark, sf_dir),
        on="t_ms",
        by=["user_id"],
        right_cols=["view_id", "view_ms", "view_value"],
        right_tie="view_id",
    )
    return matched.filter(F.col("view_id").isNotNull()).select(
        "user_id",
        "purchase_id",
        F.col("t_ms").alias("purchase_ms"),
        "view_id",
        "view_ms",
        (F.col("t_ms") - F.col("view_ms")).alias("gap_ms"),
        "view_value",
    )


@query(
    "views_before_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, epoch_ms(ts) AS v_ms, value
      FROM events WHERE event_type = 'view'
    ), p AS (
      SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS p_ms
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.user_id,
           p.purchase_id,
           p.p_ms                 AS purchase_ms,
           count(*)               AS n_views_1h,
           round(sum(v.value), 2) AS sum_view_value
    FROM p JOIN v
      ON p.user_id = v.user_id
     AND v.v_ms >= p.p_ms - 3600000
     AND v.v_ms <  p.p_ms
    GROUP BY p.user_id, p.purchase_id, p.p_ms
    """,
)
def q_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: views in the hour before each purchase, aggregated
    per purchase (inner — purchases with zero prior-hour views drop).

    Bucketed interval join (operators/rangejoin.py): time quantized to
    1 h buckets → equi-join on (user_id, bucket) → exact range refine.
    Never a nested-loop theta join; the oracle states the same
    inequality join declaratively.
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_ms").alias("p_ms"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts_ms").alias("v_ms"),
        F.col("value").alias("view_value"),
    )
    pairs = interval_join_buckets(
        purchases,
        views,
        by=["user_id"],
        left_time="p_ms",
        right_time="v_ms",
        lookback=_HOUR_MS,
    )
    return pairs.groupBy("user_id", "purchase_id", "p_ms").agg(
        F.count(F.lit(1)).alias("n_views_1h"),
        F.round(F.sum("view_value"), 2).alias("sum_view_value"),
    ).select(
        "user_id",
        "purchase_id",
        F.col("p_ms").alias("purchase_ms"),
        "n_views_1h",
        "sum_view_value",
    )


@query(
    "scd2_user_state",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ns(ts) AS seq, event_id FROM events
    ),
    l AS (
      SELECT *, lag(event_type) OVER (PARTITION BY user_id
                                      ORDER BY seq, event_id) AS prev
      FROM e
    ),
    fl AS (
      SELECT *, CASE WHEN prev IS NULL OR prev != event_type
                     THEN 1 ELSE 0 END AS chg
      FROM l
    ),
    r AS (
      SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY seq, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM fl
    ),
    runs AS (
      SELECT user_id, run, min(event_type) AS event_type,
             min(seq) AS valid_from, count(*) AS n_events
      FROM r GROUP BY user_id, run
    )
    SELECT user_id, event_type, valid_from,
           coalesce(lead(valid_from) OVER (PARTITION BY user_id
                                           ORDER BY valid_from), -1) AS valid_to,
           n_events
    FROM runs
    """,
)
def q_scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 reconstruction (operators/cdc.scd2_intervals): each
    user's event_type runs collapsed to validity intervals
    [valid_from, valid_to) in ns — gaps-and-islands with one exchange
    (all three window passes share the user_id partitioning)."""
    from post_modern_stack_spark.operators.cdc import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    out = scd2_intervals(ev, ["user_id"], "event_type", "ts_ns", ["event_id"])
    # open runs emit valid_to = -1 (not NULL): a NULL in a numeric
    # column round-trips as NaN through pandas and NaN != NaN in
    # engine-comparison hashers — the operator itself keeps NULL
    return out.select(
        "user_id",
        "event_type",
        "valid_from",
        F.coalesce("valid_to", F.lit(-1)).alias("valid_to"),
        "n_events",
    )


@query(
    "m4_downsample",
    oracle="""
    WITH keyed AS (
        SELECT event_type,
               epoch_ms(ts) // 3600000 AS bucket,
               value,
               epoch_ns(ts)::HUGEINT * 1000000000000 + event_id AS ord
        FROM events
    )
    SELECT event_type,
           bucket,
           count(*) AS n,
           min(value) AS v_min,
           max(value) AS v_max,
           arg_min(value, ord) AS v_first,
           arg_max(value, ord) AS v_last
    FROM keyed
    GROUP BY event_type, bucket
    """,
)
def q_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (min/max/first/last per pixel
    bucket — the error-free line-chart reduction from Jugel et al.,
    VLDB'14): hourly buckets per event_type series. One hash agg, no
    window sort; first/last ride min_by/max_by on a zero-padded
    (ts_ns, event_id) string key so ties break identically in any
    engine and under any partitioning.
    """
    ev = load_table(spark, sf_dir, "events")
    ordk = F.concat(
        F.lpad(F.col("ts_ns").cast("string"), 20, "0"),
        F.lpad(F.col("event_id").cast("string"), 12, "0"),
    )
    return (
        ev.select(
            "event_type",
            (F.col("ts_ms") / F.lit(3600000)).cast("bigint").alias("bucket"),
            "value",
            ordk.alias("ord"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.min_by("value", "ord").alias("v_first"),
            F.max_by("value", "ord").alias("v_last"),
        )
    )


@query(
    "time_weighted_avg",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               value,
               epoch_ms(ts) AS t,
               lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                                        ORDER BY epoch_ms(ts), event_id)
                   AS t_next
        FROM events
    )
    SELECT user_id,
           round(sum(CAST(round(value * 100) AS BIGINT) * (t_next - t))
                 / 100.0 / sum(t_next - t), 4) AS twap,
           count(*) AS n_intervals
    FROM seq
    WHERE t_next IS NOT NULL AND t_next > t
    GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP) per user — the irregular-sampling
    average where each observation is weighted by how long it was
    current (hold-until-next semantics, the financial/sensor
    aggregation plain avg() gets wrong on uneven gaps). One shuffle:
    the lead() window and the final agg share the user_id key."""
    ev = load_table(spark, sf_dir, "events")
    seq = ev.select(
        "user_id", "value", F.col("ts_ms").alias("t"), "event_id"
    ).withColumn(
        "t_next",
        F.lead("t").over(Window.partitionBy("user_id").orderBy("t", "event_id")),
    )
    dur = F.col("t_next") - F.col("t")
    return (
        seq.filter(F.col("t_next").isNotNull() & (dur > 0))
        .groupBy("user_id")
        .agg(
            # exact integer cents x ms weights: the weighted mean is a
            # ratio of exact integers (scaled by 100), so the rounding
            # is deterministic on both engines
            F.round(sum128(cents("value") * dur) / 100.0 / F.sum(dur), 4).alias(
                "twap"
            ),
            F.count(F.lit(1)).alias("n_intervals"),
        )
    )


@query(
    "counter_rate",
    oracle="""
    WITH seq AS (
        SELECT user_id,
               value,
               epoch_ms(ts) AS t,
               lag(value) OVER w AS prev_v,
               lag(epoch_ms(ts)) OVER w AS prev_t
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    deltas AS (
        SELECT user_id,
               value,
               CASE WHEN value >= prev_v THEN value - prev_v ELSE value END
                   AS delta,
               (t - prev_t) / 1000.0 AS dt_s
        FROM seq
        WHERE prev_t IS NOT NULL AND t > prev_t
    )
    SELECT user_id,
           round(sum(delta) / sum(dt_s), 6) AS rate_per_s,
           CAST(sum(CASE WHEN delta = value THEN 1 ELSE 0 END) AS BIGINT)
               AS n_resets
    FROM deltas
    GROUP BY user_id
    """,
)
def q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter rate with reset handling (the PromQL
    ``rate()`` contract): per consecutive sample pair, the increase is
    ``v - prev`` unless the counter went backwards — a process restart
    — in which case the post-reset value itself counts. Aggregated to
    a per-user events/sec rate plus a reset count. lag() window and
    final agg share one user_id exchange."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seq = ev.select(
        "user_id", "value", F.col("ts_ms").alias("t"), "event_id"
    ).select(
        "user_id",
        "value",
        "t",
        F.lag("value").over(w.orderBy("t", "event_id")).alias("prev_v"),
        F.lag("t").over(w.orderBy("t", "event_id")).alias("prev_t"),
    )
    delta = F.when(
        F.col("value") >= F.col("prev_v"), F.col("value") - F.col("prev_v")
    ).otherwise(F.col("value"))
    dt_s = (F.col("t") - F.col("prev_t")) / 1000.0
    return (
        seq.filter(F.col("prev_t").isNotNull() & (F.col("t") > F.col("prev_t")))
        .select("user_id", delta.alias("delta"), dt_s.alias("dt_s"), "value")
        .groupBy("user_id")
        .agg(
            F.round(F.sum("delta") / F.sum("dt_s"), 6).alias("rate_per_s"),
            F.sum((F.col("delta") == F.col("value")).cast("bigint")).alias(
                "n_resets"
            ),
        )
    )


@query(
    "linear_attribution",
    oracle="""
    WITH v AS (
        SELECT user_id, event_id AS view_id, epoch_ms(ts) AS v_ms
        FROM events WHERE event_type = 'view'
    ),
    p AS (
        SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS p_ms, value
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT p.user_id, p.purchase_id, p.value, v.view_id,
               count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
        FROM p JOIN v
          ON p.user_id = v.user_id
         AND v.v_ms >= p.p_ms - 3600000
         AND v.v_ms <  p.p_ms
    )
    SELECT user_id,
           count(DISTINCT purchase_id) AS n_purchases,
           count(*)                    AS n_touches,
           round(sum(value / n_touches), 4) AS attributed_value
    FROM touches
    GROUP BY user_id
    """,
)
def q_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: each purchase's value splits
    equally across every view in its prior hour (the marketing model
    between last-touch — the as-of join — and position-weighted). The
    touch set comes from the bucketed interval join (never a
    nested-loop theta join); the per-purchase touch count is a window
    over the join output partitioned by the join's own key, so no
    extra fact pass."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts_ms").alias("p_ms"),
        "value",
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts_ms").alias("v_ms"),
        F.col("event_id").alias("view_id"),
    )
    touches = interval_join_buckets(
        purchases,
        views,
        by=["user_id"],
        left_time="p_ms",
        right_time="v_ms",
        lookback=_HOUR_MS,
    )
    n_touches = F.count(F.lit(1)).over(Window.partitionBy("purchase_id"))
    return (
        touches.withColumn("n_touches", n_touches)
        .groupBy("user_id")
        .agg(
            F.countDistinct("purchase_id").alias("n_purchases"),
            F.count(F.lit(1)).alias("n_touches"),
            F.round(F.sum(F.col("value") / F.col("n_touches")), 4).alias(
                "attributed_value"
            ),
        )
    )


@query(
    "holt_forecast",
    oracle="""
    WITH RECURSIVE daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               round(sum(value), 2) AS v
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    series AS (
        SELECT event_type, list(v ORDER BY day) AS vals FROM daily
        GROUP BY event_type
    ),
    fit(event_type, i, l, t) AS (
        SELECT event_type, 1, vals[1]::DOUBLE, 0.0::DOUBLE FROM series
        UNION ALL
        SELECT f.event_type, f.i + 1,
               0.5 * s.vals[f.i + 1] + 0.5 * (f.l + f.t),
               0.3 * ((0.5 * s.vals[f.i + 1] + 0.5 * (f.l + f.t)) - f.l)
               + 0.7 * f.t
        FROM fit f JOIN series s USING (event_type)
        WHERE f.i < len(s.vals)
    )
    SELECT f.event_type,
           f.i AS n_days,
           round(f.l, 4) AS level,
           round(f.t, 4) AS trend,
           round(f.l + f.t, 4) AS forecast_next
    FROM fit f JOIN series s USING (event_type)
    WHERE f.i = len(s.vals)
    """,
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear exponential smoothing (α=0.5, β=0.3) over each
    event type's daily value series, forecasting the next day — the
    sequential recurrence that no window frame expresses, run as an
    in-array fold with a (level, trend) STRUCT accumulator (the EWMA
    idiom generalized to a 2-state recurrence). The oracle states the
    same recurrence as a RECURSIVE CTE over the series index — DuckDB's
    chained struct list_reduce was observed to diverge from its own
    single-step semantics, so the recursion is the trustworthy twin;
    identical IEEE op sequence, exact match. Series
    collapse to (type, day) grain before any collection, so the folded
    arrays are days-long regardless of fact size."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("v")
    )
    series = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "v"))), lambda s: s["v"]
        ).alias("vals")
    )
    a, b = 0.5, 0.3
    init = F.struct(
        F.element_at("vals", 1).cast("double").alias("l"),
        F.lit(0.0).alias("t"),
    )
    rest = F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0)))

    def step(acc, x):
        new_l = a * x.cast("double") + (1 - a) * (acc["l"] + acc["t"])
        new_t = b * (new_l - acc["l"]) + (1 - b) * acc["t"]
        return F.struct(new_l.alias("l"), new_t.alias("t"))

    fitted = series.select(
        "event_type",
        F.size("vals").alias("n_days"),
        F.aggregate(rest, init, step).alias("s"),
    )
    return fitted.select(
        "event_type",
        "n_days",
        F.round(F.col("s.l"), 4).alias("level"),
        F.round(F.col("s.t"), 4).alias("trend"),
        F.round(F.col("s.l") + F.col("s.t"), 4).alias("forecast_next"),
    )


@query(
    "weekly_seasonality",
    oracle="""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS day,
               dayofweek(CAST(ts AS DATE)) + 1 AS dow,
               sum(CAST(round(value * 100) AS BIGINT)) AS v_c
        FROM events GROUP BY 1, 2
    ),
    base AS (
        SELECT sum(v_c) / CAST(count(*) AS DOUBLE) AS overall_c FROM daily
    )
    SELECT dow,
           count(*) AS n_days,
           round(sum(v_c) / 100.0 / count(*), 2) AS avg_value,
           round(sum(v_c) / CAST(count(*) AS DOUBLE) / base.overall_c, 6)
               AS seasonal_index
    FROM daily, base
    GROUP BY dow, base.overall_c
    """,
)
def q_weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices (avg daily total per weekday vs
    the overall daily mean) — the multiplicative-decomposition seasonal
    component, and the sanity input to any forecast. Day-grain
    aggregation first, so the index math runs on ≤ |days| rows; the
    overall mean is a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    # day totals on exact integer cents → every downstream mean/ratio
    # is a deterministic quotient of exact integers (NOTES_r5 landmine)
    daily = ev.groupBy(
        F.to_date("ts").alias("day"), F.dayofweek(F.to_date("ts")).alias("dow")
    ).agg(F.sum(cents("value")).alias("v_c"))
    # explicit sum/count, not avg(): avg over longs accumulates as
    # double on both engines, re-introducing merge-order noise
    base = daily.agg(
        (F.sum("v_c") / F.count(F.lit(1)).cast("double")).alias("overall_c")
    )
    return (
        daily.crossJoin(F.broadcast(base))
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.round(F.sum("v_c") / 100.0 / F.count(F.lit(1)), 2).alias("avg_value"),
            F.round(
                F.sum("v_c") / F.count(F.lit(1)).cast("double") / F.first("overall_c"),
                6,
            ).alias("seasonal_index"),
        )
    )


@query(
    "scd2_intervals",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id,
             lag(event_type) OVER w AS prev_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
    ),
    changes AS (
      SELECT user_id, event_type, ts_ms, event_id
      FROM e WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type,
           ts_ms AS valid_from,
           lead(ts_ms) OVER w2 AS valid_to,
           (lead(ts_ms) OVER w2 IS NULL)::INT AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
    """,
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse each user's
    event stream to change rows (event_type transitions) and emit
    validity intervals [valid_from, valid_to) with an is_current flag
    — the warehouse dimension-versioning pattern built from an
    append-only log. Two windows over ONE (user) partitioning: the
    change-detect lag and the interval lead reuse the same exchange
    (Catalyst folds them into one sort+window pass). Both windows
    tie-break on event_id (ADVICE round-3): two change rows at the
    same ts_ms would otherwise make lead() nondeterministic across
    engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts_ms", "event_id")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts_ms").alias("valid_from"),
        F.lead("ts_ms").over(w2).alias("valid_to"),
        F.lead("ts_ms").over(w2).isNull().cast("int").alias("is_current"),
    )
