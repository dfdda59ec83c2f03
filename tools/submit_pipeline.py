"""spark-submit entry point for the pipeline.

Cluster usage (the production shape; north_rule contract):

    zip -r otelcol_spark.zip opentelemetry_collector_spark
    spark-submit --master <cluster> \
        --py-files otelcol_spark.zip \
        tools/submit_pipeline.py \
        --sf-dir <input dir> --out-dir <output dir> --run-id run42

Sandbox evidence: spark-submit --master 'local[N]' with the same
flags. The script builds NO SparkSession config of its own beyond app
name — master/executors/memory come from spark-submit, as they must on
a real cluster.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--parse-method", default="native", choices=["native", "arrow"])
    # tri-state: explicit flags override the feature gates below; when
    # absent, engine.saltedAggregation / engine.singlePassFanout decide
    # (BETA gates are default-ON, matching featuregate stage semantics)
    ap.add_argument("--salted", action=argparse.BooleanOptionalAction, default=None)
    ap.add_argument(
        "--single-pass", action=argparse.BooleanOptionalAction, default=None,
        help="write all sinks in one partitionBy(sink) pass "
             "(default: the engine.singlePassFanout gate)",
    )
    ap.add_argument("--logs-level", default="info",
                    help="service.telemetry logs level (driver log verbosity)")
    ap.add_argument("--metrics-level", default="normal",
                    help="service.telemetry metrics level; 'none' suppresses "
                         "the obsreport metrics + status tables")
    ap.add_argument("--time-partition", default=None, choices=["hour", "day"],
                    help="lay per-sink tables out in event-time partitions "
                         "(Iceberg hour()/day() transform analog; implies "
                         "per-sink units, not single-pass)")
    ap.add_argument("--set", action="append", default=[], dest="sets",
                    metavar="KEY=VALUE",
                    help="telemetry-config override, e.g. "
                         "--set service.telemetry.metrics.level=none "
                         "(otelcol --set analog; highest precedence)")
    ap.add_argument("--feature-gates", default="",
                    help="comma-separated gate ids, '-' prefix disables "
                         "(featuregate flag syntax, e.g. 'engine.arrowParse,"
                         "-engine.singlePassFanout')")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("otelcol-spark-pipeline").getOrCreate()

    from opentelemetry_collector_spark.plans import config as cfg_mod
    from opentelemetry_collector_spark.plans import pipeline, runner

    from opentelemetry_collector_spark.plans import featuregate

    if args.feature_gates:
        featuregate.REGISTRY.apply_flags(args.feature_gates)
    # gates are consulted only where the CLI flag is absent — explicit
    # flags win, so --feature-gates is never a silent no-op and
    # --salted/--single-pass keep their direct meaning
    salted = (
        args.salted
        if args.salted is not None
        else featuregate.REGISTRY.is_enabled("engine.saltedAggregation")
    )
    single_pass = (
        args.single_pass
        if args.single_pass is not None
        else featuregate.REGISTRY.is_enabled("engine.singlePassFanout")
    )
    telemetry_raw = {
        "service": {"telemetry": {"logs": {"level": args.logs_level},
                                  "metrics": {"level": args.metrics_level}}}
    }
    if args.sets:
        telemetry_raw = cfg_mod.apply_set_overrides(telemetry_raw, args.sets)
    telemetry = cfg_mod.load_telemetry(telemetry_raw)
    # logs level drives driver/executor log verbosity (zap-config analog)
    spark.sparkContext.setLogLevel(telemetry.logs_level.upper())
    cfg = pipeline.PipelineConfig(parse_method=args.parse_method, salted=salted)
    if args.time_partition:
        if args.single_pass:
            ap.error("--time-partition requires per-sink units; "
                     "drop --single-pass")
        single_pass = False  # gate-default single-pass yields to time layout
    paths = runner.run_pipeline(
        spark, args.sf_dir, args.out_dir, run_id=args.run_id, cfg=cfg,
        telemetry=telemetry, single_pass=single_pass,
        time_partition=args.time_partition,
    )
    counts = {s: spark.read.parquet(p).count() for s, p in paths.items()}
    print("PIPELINE_RESULT " + json.dumps({"run_id": args.run_id, "sink_rows": counts}))
    spark.stop()


if __name__ == "__main__":
    main()
