"""The NEP (next-event-prediction) pipeline — full reference-flow parity
(reference src/my_dbt_flow.py: start → run_transformation → get_dataset
→ [train/test/deploy are out of engine scope, SURVEY.md §2 non-goals]).

Stages over one SparkSession, parquet-checkpointed per stage:
ingest → transform (model registry: events_exploded → session_events)
→ extract(start, end, api_key) → split (90/10 by time) → encode
(vocab + pad) → metrics (stats + quality checks + HR@10 baseline).

The engine stops at the padded-int-array boundary where
``toPandas()``/Arrow hands off to any ML library (the reference's
train_model equivalent consumes exactly this shape,
my_dbt_flow.py:318-340).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from post_modern_stack_spark.functions import pad_sequence
from post_modern_stack_spark.operators import metrics as M
from post_modern_stack_spark.operators import shaping, vocab
from post_modern_stack_spark.operators.sessionize import (
    events_exploded,
    session_events,
)
from post_modern_stack_spark.plans.pipeline import (
    ModelRegistry,
    PipelineRunner,
    validate_start,
)

MAX_LEN = 20  # reference my_dbt_flow.py:308


def build_registry() -> ModelRegistry:
    """The two-model dbt DAG (reference src/dbt/models/metaflow/)."""
    reg = ModelRegistry()

    @reg.register("events_exploded")
    def _m1(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
        return events_exploded(t["raw_events"])

    @reg.register("session_events", deps=["events_exploded"])
    def _m2(spark: SparkSession, t: dict[str, DataFrame]) -> DataFrame:
        return session_events(t["events_exploded"])

    return reg


def extract_training_set(
    sessions: DataFrame,
    api_key: str,
    start_date: str,
    end_date: str,
    min_len: int = 3,
) -> DataFrame:
    """Parameterized training-set extraction (reference
    my_dbt_flow.py:234-252): tenant filter, half-open date window,
    ARRAY_SIZE > 2, ordered by session_date ("sessions are ordered!").
    """
    return (
        sessions.filter(F.col("api_key") == F.lit(api_key))
        .filter(
            (F.col("session_date") > F.lit(start_date).cast("date"))
            & (F.col("session_date") <= F.lit(end_date).cast("date"))
        )
        .filter(F.size("interactions") >= min_len)
        .orderBy("session_date")
    )


def run_nep_flow(
    spark: SparkSession,
    raw_events: DataFrame,
    run_dir: str,
    run_id: str,
    api_key: str,
    start_date: str,
    end_date: str,
    train_frac: float = 0.9,
    max_len: int = MAX_LEN,
    resume: bool = False,
) -> dict:
    """Execute the full flow; returns stage artifacts + metric rows.

    ``resume=True`` (Metaflow ``resume`` parity): stages whose
    checkpoint is already complete under this run_id are read back
    instead of recomputed — see ``PipelineRunner``."""
    # start (I2): fail-fast validation + engine probe
    info = validate_start(spark, [], start_date, end_date)

    runner = PipelineRunner(spark, run_dir, run_id, resume=resume)
    reg = build_registry()
    runner.write_manifest(reg.manifest())

    # run_transformation (dbt-run parity): build models as views
    built = reg.run(spark, {"raw_events": raw_events})
    sessions = runner.checkpoint("session_events", built["session_events"])

    # dbt test parity: unique + not_null on the session key must hold
    quality = M.data_quality_checks(sessions, "session_id").collect()[0]
    assert quality["session_id_duplicates"] == 0, "dbt test: unique SESSION_ID"
    assert quality["session_id_nulls"] == 0, "dbt test: not_null SESSION_ID"

    # get_dataset: extract → split → x/y → encode → pad
    extracted = runner.checkpoint(
        "extracted", extract_training_set(sessions, api_key, start_date, end_date)
    )
    assert extracted.count() > 0, "empty dataset (reference my_dbt_flow.py:255)"

    split = shaping.split_by_time(extracted, ["session_date", "session_id"])
    shaped = shaping.xy_pairs(split, "interactions")

    vb = vocab.build_vocab(
        shaped.filter(F.col("split") == "train"), "x"
    )  # vocab from train inputs only (reference fits tokenizer on x_train)
    encoded = (
        vocab.encode(shaped, vb, "x", "x_enc")
        .join(
            F.broadcast(vb.select(F.col("token").alias("y"), "token_id")),
            "y",
            "left",
        )
        .withColumn(
            "y_enc", F.coalesce(F.col("token_id"), F.lit(vocab.UNK_ID)).cast("int")
        )
        # label = token_id - 1 (the reference's off-by-one trap,
        # my_dbt_flow.py:339-340 — SURVEY.md §7 watch-list 5)
        .withColumn("y_label", F.col("y_enc") - 1)
        .withColumn("x_padded", pad_sequence("x_enc", max_len, 0))
        .drop("token_id")
    )
    dataset = runner.checkpoint("dataset", encoded)

    # test_model analog: metrics as dataflow (G1/G2/G3)
    sess_for_stats = dataset.withColumn("user_id", F.col("session_id"))
    stats_row = M.dataset_stats(sess_for_stats, "interactions").collect()[0]
    metric_rows = [
        ("n_sessions", float(stats_row["n_sessions"])),
        ("avg_session_len", float(stats_row["avg_session_len"])),
        ("n_train", float(dataset.filter(F.col("split") == "train").count())),
        ("n_test", float(dataset.filter(F.col("split") == "test").count())),
        ("vocab_size", float(vb.count())),
    ]
    metrics_df = spark.createDataFrame(metric_rows, ["name", "value"])
    runner.checkpoint("metrics", metrics_df)

    return {
        "info": info,
        "run_dir": runner.base,
        "stages": [r.name for r in runner.results],
        "stage_rows": {r.name: r.rows for r in runner.results},
        "resumed_stages": [r.name for r in runner.results if r.resumed],
        "manifest": reg.manifest(),
        "metrics": dict(metric_rows),
    }
