"""Driver contract for the spark-graft builder (PySpark target).

queries() entries map 1:1 to SURVEY.md §2 operators; each has a DuckDB
oracle in oracle_sql() unless genuinely non-SQL-expressible. Both
engines read the SAME transcript fixture parquet bytes
(/root/repo/fixtures/<sf>/transcripts.parquet), generated
deterministically by opentelemetry_collector_spark.fixtures (seed 42).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark import fixtures
from opentelemetry_collector_spark.functions import parse as parse_mod
from opentelemetry_collector_spark.operators import (
    aggregate as agg_mod,
    batch as batch_mod,
    enrich as enrich_mod,
    filter as filter_mod,
    order as order_mod,
    route as route_mod,
)
from opentelemetry_collector_spark.plans import pipeline
from opentelemetry_collector_spark.sources import tables

ORACLE_SF_DIR = "/root/testdata/sf0.01"  # driver runs correctness at sf0.01


def _transcripts_cte() -> str:
    path = fixtures.ensure_transcripts(ORACLE_SF_DIR)
    return f"WITH transcripts AS (SELECT * FROM read_parquet('{path}'))"


def _parsed_cte() -> str:
    frag = parse_mod.oracle_parse_fragment("transcripts")
    path = fixtures.ensure_transcripts(ORACLE_SF_DIR)
    return (
        f"WITH transcripts AS (SELECT * FROM read_parquet('{path}')), "
        f"parsed AS (SELECT transcripts.*, {frag} FROM transcripts)"
    )


def _routed_cte() -> str:
    sink = route_mod.oracle_sink_fragment()
    return f"{_parsed_cte()}, routed AS (SELECT parsed.*, {sink} AS sink FROM parsed)"


def _dims_cte() -> str:
    rp, tp = fixtures.ensure_dims()
    return (
        f"role_dim AS (SELECT * FROM read_parquet('{rp}')), "
        f"tool_dim AS (SELECT * FROM read_parquet('{tp}'))"
    )


# ---------------------------------------------------------------- queries

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse→enrich→route→aggregate at sf0.001."""
    return pipeline.flagship(spark, "/root/testdata/sf0.001")


def _q_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.flagship(spark, sf_dir)


def _q_pipeline_e2e_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.flagship(
        spark, sf_dir, pipeline.PipelineConfig(salted=True)
    )


def _q_pipeline_e2e_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.flagship(
        spark, sf_dir, pipeline.PipelineConfig(parse_method="arrow")
    )


def _q_parse_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tables.read_transcripts(spark, sf_dir)
    return parse_mod.with_parsed(df, "native").select(
        "conv_id", "turn_idx", "level", "svc", "latency_ms", "req_id", "msg", "valid"
    )


def _q_parse_turns_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tables.read_transcripts(spark, sf_dir)
    return parse_mod.with_parsed(df, "arrow").select(
        "conv_id", "turn_idx", "level", "svc", "latency_ms", "req_id", "msg", "valid"
    )


def _q_ordered_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tables.read_transcripts(spark, sf_dir)
    return order_mod.with_turn_order(df).select(
        "conv_id", "turn_idx", "turn_seq", "text"
    )


def _q_enrich_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tables.read_transcripts(spark, sf_dir)
    out = enrich_mod.enrich_with_defaults(df, spark)
    return out.select(
        "conv_id", "turn_idx", "role", "tool",
        "role_kind", "is_human", "tool_family", "sink_hint",
    )


def _q_routed_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.routed_frame(spark, sf_dir).select("sink", "conv_id", "turn_idx")


def _q_route_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_mod.sink_counts(pipeline.routed_frame(spark, sf_dir))


def _q_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg_mod.latency_stats(pipeline.routed_frame(spark, sf_dir))


def _q_quarantine_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    routed = pipeline.routed_frame(spark, sf_dir)
    return routed.filter(F.col("sink") == route_mod.QUARANTINE_SINK).select(
        "conv_id", "turn_idx", "text"
    )


def _q_filter_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tables.read_transcripts(spark, sf_dir)
    fs = filter_mod.FilterSet(column="role", strict=("tool", "system"))
    return filter_mod.include(df, fs).select("conv_id", "turn_idx", "role")


def _q_filter_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tables.read_transcripts(spark, sf_dir)
    fs = filter_mod.FilterSet(column="text", regexp=(r"^\[ERROR\]",))
    return filter_mod.include(df, fs).select("conv_id", "turn_idx")


def _q_batch_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = tables.read_transcripts(spark, sf_dir)
    return batch_mod.batch_counts(df, send_batch_size=512)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pipeline_e2e": _q_pipeline_e2e,
        "pipeline_e2e_salted": _q_pipeline_e2e_salted,
        "pipeline_e2e_arrow": _q_pipeline_e2e_arrow,
        "parse_turns": _q_parse_turns,
        "parse_turns_arrow": _q_parse_turns_arrow,
        "ordered_turns": _q_ordered_turns,
        "enrich_lookup": _q_enrich_lookup,
        "routed_rows": _q_routed_rows,
        "route_counts": _q_route_counts,
        "latency_stats": _q_latency_stats,
        "quarantine_rows": _q_quarantine_rows,
        "filter_strict": _q_filter_strict,
        "filter_regexp": _q_filter_regexp,
        "batch_counts": _q_batch_counts,
    }


# ---------------------------------------------------------------- oracles

def oracle_sql() -> dict[str, str]:
    parse_sel = (
        "SELECT conv_id, turn_idx, level, svc, latency_ms, req_id, msg, valid "
        "FROM parsed"
    )
    e2e = f"""{_routed_cte()}
    SELECT sink, conv_id, date_trunc('hour', ts) AS window_start,
           cast(count(*) AS bigint) AS n_turns
    FROM routed GROUP BY 1, 2, 3"""
    return {
        "pipeline_e2e": e2e,
        "pipeline_e2e_salted": e2e,
        "pipeline_e2e_arrow": e2e,
        "parse_turns": f"{_parsed_cte()} {parse_sel}",
        "parse_turns_arrow": f"{_parsed_cte()} {parse_sel}",
        "ordered_turns": f"""{_transcripts_cte()}
            SELECT conv_id, turn_idx,
                   cast(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
                        AS int) AS turn_seq,
                   text
            FROM transcripts""",
        "enrich_lookup": f"""{_transcripts_cte()}, {_dims_cte()}
            SELECT t.conv_id, t.turn_idx, t.role, t.tool,
                   r.role_kind, r.is_human, d.tool_family, d.sink_hint
            FROM transcripts t
            LEFT JOIN role_dim r USING (role)
            LEFT JOIN tool_dim d USING (tool)""",
        "routed_rows": f"{_routed_cte()} SELECT sink, conv_id, turn_idx FROM routed",
        "route_counts": f"""{_routed_cte()}
            SELECT sink, cast(count(*) AS bigint) AS n_rows
            FROM routed GROUP BY 1""",
        "latency_stats": f"""{_routed_cte()}
            SELECT sink, svc, cast(count(*) AS bigint) AS n,
                   cast(sum(latency_ms) AS bigint) AS latency_sum,
                   min(latency_ms) AS latency_min,
                   max(latency_ms) AS latency_max
            FROM routed WHERE valid GROUP BY 1, 2""",
        "quarantine_rows": f"""{_routed_cte()}
            SELECT conv_id, turn_idx, text FROM routed
            WHERE sink = '{route_mod.QUARANTINE_SINK}'""",
        "filter_strict": f"""{_transcripts_cte()}
            SELECT conv_id, turn_idx, role FROM transcripts
            WHERE role IN ('tool', 'system')""",
        "filter_regexp": f"""{_transcripts_cte()}
            SELECT conv_id, turn_idx FROM transcripts
            WHERE regexp_matches(text, '^\\[ERROR\\]')""",
        "batch_counts": f"""{_transcripts_cte()}, seqd AS (
            SELECT role, tool,
                   cast(floor((row_number() OVER (
                       PARTITION BY role, tool
                       ORDER BY conv_id, turn_idx) - 1) / 512) AS bigint)
                   AS batch_id
            FROM transcripts)
            SELECT role, tool, batch_id, cast(count(*) AS bigint) AS n_rows
            FROM seqd GROUP BY 1, 2, 3""",
    }
