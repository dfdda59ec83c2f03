"""Metrics & traces signal shapes over the transcript stream.

The reference carries three signal types. Our pipeline input is
logs-shaped; this module provides the pmetric/ptrace mappings:

- **temporality conversion** (pdata/pmetric/aggregation_temporality.go):
  delta→cumulative is a running sum over (series, time) — a window
  cumsum; cumulative→delta is value - lag(value). These are the two
  real computations behind the enum.
- **histogram datapoints** (pdata/pmetric/generated_histogramdatapoint.go):
  explicit-bounds bucketing of the parsed latency attribute → per-series
  bucket counts + sum/min/max.
- **exponential histogram** (pdata/pmetric/generated_exponentialhistogramdatapoint.go):
  scale-0 base-2 buckets: index = floor(log2(value)).
- **spans from turns** (pdata/ptrace/generated_span.go:53-199): each
  tool turn becomes a span — TraceID from conv_id (16-byte hex),
  SpanID from (conv_id, turn_idx) (8-byte hex), kind from role,
  start/end timestamps.

All pure Catalyst; every one has a DuckDB-oracle-checkable shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BOUNDS = (10, 100, 500, 1000, 5000)


# ----------------------------------------------------- temporality

def delta_to_cumulative(
    df: DataFrame,
    series_keys: tuple[str, ...] = ("svc",),
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """AGGREGATION_TEMPORALITY_DELTA → CUMULATIVE: running sum per series."""
    w = (
        Window.partitionBy(*series_keys)
        .orderBy(F.col(time_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn("cumulative", F.sum(value_col).over(w))


def cumulative_to_delta(
    df: DataFrame,
    series_keys: tuple[str, ...] = ("svc",),
    time_col: str = "ts",
    value_col: str = "cumulative",
) -> DataFrame:
    """CUMULATIVE → DELTA: first point of a series keeps its value
    (reset semantics: a fresh cumulative series starts at its value)."""
    w = Window.partitionBy(*series_keys).orderBy(F.col(time_col))
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(
        "delta", F.col(value_col) - F.coalesce(prev, F.lit(0))
    )


# ------------------------------------------------------- histograms

def histogram_datapoints(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
    bounds: tuple[int, ...] = DEFAULT_BOUNDS,
) -> DataFrame:
    """Explicit-bounds histogram: bucket i = count(value ≤ bounds[i]),
    overflow bucket last — the HistogramDataPoint contract."""
    v = F.col(value_col)
    bucket = F.lit(len(bounds))  # overflow
    for i in reversed(range(len(bounds))):
        bucket = F.when(v <= bounds[i], F.lit(i)).otherwise(bucket)
    return (
        df.filter(v.isNotNull())
        .withColumn("bucket_idx", bucket.cast("int"))
        .groupBy(*series_keys, "bucket_idx")
        .agg(
            F.count(F.lit(1)).alias("bucket_count"),
            F.sum(v).cast("long").alias("value_sum"),
            F.min(v).alias("value_min"),
            F.max(v).alias("value_max"),
        )
    )


def exp_histogram_datapoints(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
) -> DataFrame:
    """Scale-0 exponential histogram, OTel bucket contract: buckets are
    lower-EXCLUSIVE / upper-INCLUSIVE, index = ceil(log2(v)) - 1 (the
    reference's MapToIndex; floor(log2) would put exact powers of two —
    common for integer latencies — one bucket too high). Zero values
    are the separate zerocount bucket."""
    v = F.col(value_col)
    idx = (F.ceil(F.log2(v)) - 1).cast("int")
    return (
        df.filter(v.isNotNull())
        .withColumn("bucket_idx", F.when(v > 0, idx).otherwise(F.lit(None)))
        .groupBy(*series_keys, "bucket_idx")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


def summary_datapoints(
    df: DataFrame,
    value_col: str = "latency_ms",
    series_keys: tuple[str, ...] = ("svc",),
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """SummaryDataPoint: exact interpolated quantiles per series."""
    v = F.col(value_col)
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(v).cast("long").alias("value_sum")]
    for q in quantiles:
        aggs.append(
            F.round(F.expr(f"percentile({value_col}, {q})"), 4).alias(
                f"q{str(q).replace('0.', '')}"
            )
        )
    return df.filter(v.isNotNull()).groupBy(*series_keys).agg(*aggs)


# ----------------------------------------------------------- traces

def spans_from_turns(parsed: DataFrame) -> DataFrame:
    """Tool turns → ptrace.Span rows.

    TraceID = md5(conv_id) (32 hex = 16 bytes), SpanID = first 16 hex
    of md5(conv_id:turn_idx) (8 bytes), parent = previous tool turn in
    the conversation, kind mirrors SpanKind (client for tool calls).
    """
    spans = parsed.filter(F.col("role") == "tool").select(
        F.md5(F.col("conv_id")).alias("trace_id"),
        F.substring(
            F.md5(F.concat_ws(":", F.col("conv_id"), F.col("turn_idx"))), 1, 16
        ).alias("span_id"),
        F.col("conv_id"),
        F.col("turn_idx"),
        # NB: concat (not concat_ws) — concat_ws silently skips NULL
        # operands and their separators; both sides coalesced so a NULL
        # in either never nulls the whole name
        F.concat(
            F.coalesce(F.col("tool"), F.lit("")),
            F.lit("/"),
            F.coalesce(F.col("svc"), F.lit("")),
        ).alias("name"),
        F.lit("SPAN_KIND_CLIENT").alias("kind"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.make_interval(secs=F.coalesce(F.col("latency_ms"), F.lit(0)) / 1000.0)).alias("end_ts"),
        F.when(F.col("level") == "ERROR", F.lit("STATUS_CODE_ERROR"))
        .otherwise(F.lit("STATUS_CODE_OK"))
        .alias("status"),
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return spans.withColumn("parent_span_id", F.lag("span_id").over(w))
