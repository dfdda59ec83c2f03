"""Aggregate stage: per-sink counts by conv_id and time window.

The reference's only aggregations are counting semantics
(receiver/receiverhelper/obsreport.go:181-201, per-edge item counters
service/internal/obsconsumer/logs.go:52-70, batch-size distributions
exporter/exporterhelper/documentation.md:49-57). The north-star
pipeline's aggregate stage generalizes that to
groupBy(sink, conv_id, window(ts, 1 hour)).count() — a Catalyst hash
aggregate with map-side partial aggregation for free.

Scale note: keys are (sink, conv_id, hour) — cardinality ≈ number of
conversations, heavily skewed by hot conv_ids. Partial aggregation
collapses each hot key map-side before the shuffle, so the reducer-side
skew is bounded by (hours × sinks) per conv; AQE skew handling plus the
optional salted two-phase variant (salted_sink_window_counts) cover the
extreme tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_window_counts(df: DataFrame, window: str = "1 hour") -> DataFrame:
    """Per-sink, per-conversation, hourly turn counts."""
    return (
        df.groupBy(
            "sink",
            "conv_id",
            F.window("ts", window).start.alias("window_start"),
        )
        .agg(F.count(F.lit(1)).alias("n_turns"))
    )


def salted_sink_window_counts(
    df: DataFrame, window: str = "1 hour", salt_buckets: int = 16
) -> DataFrame:
    """Two-phase (salted) variant for pathological hot keys.

    Measured finding (BENCH/BASELINE.md): for *algebraic* aggregates
    like count, map-side partial aggregation already collapses a hot
    conv_id to ≤(windows × sinks) rows per task before the shuffle, so
    plain == salted even when one conv owns 30% of 6M rows. Salting
    earns its keep for non-combinable aggregations (collect_list/
    collect_set state) and skewed *joins*; it is kept here as the
    documented escape hatch and for parity with the north_star contract.

    Phase 1 aggregates (key, salt) — spreads one hot key over
    ``salt_buckets`` reducers; phase 2 sums the partials. The salt is a
    pure function of row columns (turn_idx) so replays stay
    deterministic. Results are identical to sink_window_counts
    (equality-tested).
    """
    salted = df.withColumn("_salt", F.pmod(F.col("turn_idx"), F.lit(salt_buckets)))
    p1 = salted.groupBy(
        "sink",
        "conv_id",
        F.window("ts", window).start.alias("window_start"),
        "_salt",
    ).agg(F.count(F.lit(1)).alias("_partial"))
    return (
        p1.groupBy("sink", "conv_id", "window_start")
        .agg(F.sum("_partial").cast("long").alias("n_turns"))
    )


def sink_counts(df: DataFrame) -> DataFrame:
    """Total routed rows per sink (routing-correctness headline)."""
    return df.groupBy("sink").agg(F.count(F.lit(1)).alias("n_rows"))


def latency_stats(df: DataFrame) -> DataFrame:
    """Value-level rollup over the parsed latency attribute per sink+svc.

    (The reference keeps value aggregation in contrib; this is the
    metrics-shaped output of our logs pipeline.)
    """
    return (
        df.filter(F.col("valid"))
        .groupBy("sink", "svc")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("latency_ms").alias("latency_sum"),
            F.min("latency_ms").alias("latency_min"),
            F.max("latency_ms").alias("latency_max"),
        )
    )
