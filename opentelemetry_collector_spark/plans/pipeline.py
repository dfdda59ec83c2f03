"""The flagship DAG: parse → enrich → route → aggregate.

The reference builds its DAG from config in reverse topological order
(service/internal/graph/graph.go:78-97, 297-375) and pushes data by
synchronous ConsumeLogs calls; here the same composition is lazy
DataFrame chaining and Catalyst is the planner. Stage boundaries mirror
the collector pipeline:

    receiver (table scan)            sources/tables.read_transcripts
    → parse processor                functions/parse.with_parsed
    → enrich processor               operators/enrich.enrich
    → routing connector              operators/route.with_sink
    → batch/aggregate + exporters    operators/aggregate, sinks/writers

``build`` returns the routed frame (pre-fan-out) plus the aggregate,
leaving actions (writes) to the caller — the collector's StartAll
analog lives in sinks/writers.fan_out_write and state/checkpoint.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from opentelemetry_collector_spark.functions import parse
from opentelemetry_collector_spark.operators import aggregate, enrich, route
from opentelemetry_collector_spark.sources import tables


@dataclass(frozen=True)
class PipelineConfig:
    parse_method: str = "native"  # 'native' (Catalyst) or 'arrow' (pandas UDF)
    routes: tuple[route.Route, ...] = tuple(route.DEFAULT_ROUTES)
    window: str = "1 hour"
    salted: bool = False
    salt_buckets: int = 16
    extra: dict = field(default_factory=dict)


def routed_frame(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig | None = None
) -> DataFrame:
    """parse → enrich → route, no action taken."""
    cfg = cfg or PipelineConfig()
    df = tables.read_transcripts(spark, sf_dir)
    df = parse.with_parsed(df, method=cfg.parse_method)
    df = enrich.enrich_with_defaults(df, spark)
    df = route.with_sink(df, list(cfg.routes))
    return df


def aggregate_frame(routed: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    cfg = cfg or PipelineConfig()
    if cfg.salted:
        return aggregate.salted_sink_window_counts(
            routed, cfg.window, cfg.salt_buckets
        )
    return aggregate.sink_window_counts(routed, cfg.window)


def flagship(
    spark: SparkSession, sf_dir: str, cfg: PipelineConfig | None = None
) -> DataFrame:
    """End-to-end: per-sink / per-conv / hourly turn counts."""
    return aggregate_frame(routed_frame(spark, sf_dir, cfg), cfg)
