"""Enrich stage: broadcast lookup joins on role and tool.

Mirrors the collector's attributes/resource-processor pattern — in-row
attribute enrichment from small reference data. The reference does this
with per-record Go map writes; in Spark the idiomatic form is a
broadcast hash join against tiny dimension tables: no shuffle of the
fact side, JVM-side, codegen-friendly — exactly what survives a 100×
scale-up (the dim stays O(10) rows regardless of fact size).

Left joins are total over the fixture dims (tool_dim includes the
empty-string row) but remain LEFT so unknown values pass through with
nulls rather than dropping rows — the collector never drops on enrich.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark import fixtures


def load_dims(spark: SparkSession) -> tuple[DataFrame, DataFrame]:
    role_path, tool_path = fixtures.ensure_dims()
    return spark.read.parquet(role_path), spark.read.parquet(tool_path)


def enrich(
    df: DataFrame, role_dim: DataFrame, tool_dim: DataFrame
) -> DataFrame:
    """Broadcast-join role_kind/is_human and tool_family/sink_hint in."""
    return df.join(F.broadcast(role_dim), on="role", how="left").join(
        F.broadcast(tool_dim), on="tool", how="left"
    )


def enrich_with_defaults(df: DataFrame, spark: SparkSession) -> DataFrame:
    role_dim, tool_dim = load_dims(spark)
    return enrich(df, role_dim, tool_dim)
