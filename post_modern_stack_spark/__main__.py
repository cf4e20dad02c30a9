"""CLI — the reference's ``python my_dbt_flow.py run`` analog
(reference README.md:109) plus catalog utilities.

    python -m post_modern_stack_spark run [--sf-dir D] [--out DIR]
        synthesize a reference-shaped raw log from the sf-dir events
        table, then execute the full NEP pipeline (ingest → transform →
        extract → split → encode → metrics) with checkpoints under
        --out.
    python -m post_modern_stack_spark queries
        list the catalog (name, oracle-paired or rows-only).
    python -m post_modern_stack_spark query NAME [--sf-dir D] [-n N]
        run one catalog query and show N rows.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile

from pyspark.sql import functions as F


def _synthesize_raw_log(spark, sf_dir: str, out: str, api_key: str) -> str:
    """Driver events → reference-shaped nested sessions → two ETL loads
    (so latest-ETL selection is exercised) → append-only parquet log."""
    from post_modern_stack_spark.registry import load_table
    from post_modern_stack_spark.sources import ingest

    ev = load_table(spark, sf_dir, "events")
    sessions = (
        ev.select(
            "user_id",
            F.struct(
                F.lit("event_product").alias("event_type"),
                F.concat(F.lit("url-"), F.col("event_id")).alias("hashed_url"),
                F.when(F.col("event_type") == "purchase", "purchase")
                .when(F.col("event_type") == "click", "add")
                .otherwise("detail")
                .alias("product_action"),
                F.get_json_object("props", "$.k").alias("product_sku"),
                F.col("ts_ms").cast("string").alias("server_timestamp_epoch_ms"),
                F.col("user_id").cast("string").alias("session_id"),
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.collect_list("e").alias("events"))
    )
    path = out + "/raw_events"
    ingest.ingest_events(sessions, path, api_key, etl_id="load-1", etl_timestamp_ms=1_000)
    ingest.ingest_events(sessions, path, api_key, etl_id="load-2", etl_timestamp_ms=2_000)
    return path


def cmd_run(args) -> int:
    from post_modern_stack_spark.plans.nep_flow import run_nep_flow
    from post_modern_stack_spark.session import get_spark
    from post_modern_stack_spark.sources import ingest

    spark = get_spark(app_name="pmss-run")
    spark.sparkContext.setLogLevel("ERROR")
    out = args.out or tempfile.mkdtemp(prefix="pmss-run-")
    raw_path = _synthesize_raw_log(spark, args.sf_dir, out, args.api_key)
    result = run_nep_flow(
        spark,
        ingest.read_raw_events(spark, raw_path),
        out + "/runs",
        args.run_id,
        api_key=args.api_key,
        start_date=args.start_date,
        end_date=args.end_date,
    )
    print(json.dumps(
        {
            "run_dir": result["run_dir"],
            "stages": result["stages"],
            "model_dag": result["manifest"]["order"],
            "metrics": result["metrics"],
            "spark_version": result["info"]["spark_version"],
        },
        indent=2,
    ))
    return 0


def cmd_queries(_args) -> int:
    import __spark_entry__ as entry_mod

    oracles = entry_mod.oracle_sql()
    for name in entry_mod.queries():
        kind = "oracle" if name in oracles else "rows-only"
        print(f"{name:32s} {kind}")
    return 0


def cmd_query(args) -> int:
    import __spark_entry__ as entry_mod
    from post_modern_stack_spark.session import get_spark

    qs = entry_mod.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; see `queries`", file=sys.stderr)
        return 2
    spark = get_spark(app_name="pmss-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = qs[args.name](spark, args.sf_dir)
    df.show(args.n, truncate=80)
    if args.explain:
        df.explain("formatted")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="post_modern_stack_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="execute the full NEP pipeline")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    runp.add_argument("--out", default=None)
    runp.add_argument("--run-id", default="run-1")
    runp.add_argument("--api-key", default="tenant-1")
    runp.add_argument("--start-date", default="2023-12-31")
    runp.add_argument("--end-date", default="2024-12-31")
    runp.set_defaults(fn=cmd_run)

    qsp = sub.add_parser("queries", help="list catalog queries")
    qsp.set_defaults(fn=cmd_queries)

    qp = sub.add_parser("query", help="run one catalog query")
    qp.add_argument("name")
    qp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    qp.add_argument("-n", type=int, default=20)
    qp.add_argument("--explain", action="store_true")
    qp.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
