"""Metric/trace signal shapes: temporality round-trip, histogram
invariants, span topology (pmetric/ptrace analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import parse, signals


def test_temporality_roundtrip(spark, sf_dir):
    """delta → cumulative → delta recovers the original values."""
    from opentelemetry_collector_spark.sources import tables

    ev = tables.read_table(spark, sf_dir, "events")
    cum = signals.delta_to_cumulative(
        ev, series_keys=("event_type",), time_col="event_id", value_col="value"
    )
    back = signals.cumulative_to_delta(
        cum, series_keys=("event_type",), time_col="event_id", value_col="cumulative"
    )
    bad = back.filter(F.abs(F.col("delta") - F.col("value")) > 1e-9)
    assert bad.count() == 0


def test_histogram_counts_total(transcripts):
    parsed = parse.with_parsed(transcripts, "native")
    h = signals.histogram_datapoints(parsed)
    total = h.agg(F.sum("bucket_count")).collect()[0][0]
    assert total == parsed.filter(F.col("latency_ms").isNotNull()).count()
    # bucket indices within range
    idx = [r["bucket_idx"] for r in h.select("bucket_idx").distinct().collect()]
    assert all(0 <= i <= len(signals.DEFAULT_BOUNDS) for i in idx)


def test_exp_histogram_bucket_semantics(transcripts):
    parsed = parse.with_parsed(transcripts, "native")
    h = signals.exp_histogram_datapoints(parsed)
    # OTel contract: bucket k covers (2^k, 2^(k+1)] — lower-exclusive,
    # upper-inclusive, so exact powers of two land in the LOWER bucket
    ref = (
        parsed.filter(F.col("latency_ms") > 0)
        .withColumn("k", (F.ceil(F.log2("latency_ms")) - 1).cast("int"))
        .groupBy(F.col("svc").alias("r_svc"), "k")
        .count()
    )
    joined = ref.join(
        h, (ref.k == h.bucket_idx) & (ref.r_svc == h.svc)
    ).filter(F.col("count") != F.col("bucket_count"))
    assert joined.count() == 0


def test_spans_topology(transcripts):
    parsed = parse.with_parsed(transcripts, "native")
    spans = signals.spans_from_turns(parsed).cache()
    n_tool = parsed.filter(F.col("role") == "tool").count()
    assert spans.count() == n_tool
    # ids well-formed
    bad = spans.filter(
        (F.length("trace_id") != 32) | (F.length("span_id") != 16)
    )
    assert bad.count() == 0
    # one trace per conversation; parent chain stays inside the trace
    assert (
        spans.select("conv_id", "trace_id").distinct().count()
        == spans.select("conv_id").distinct().count()
    )
    # span end >= start (latency is non-negative)
    assert spans.filter(F.col("end_ts") < F.col("start_ts")).count() == 0
    # first span of each conversation has no parent
    first = spans.groupBy("conv_id").agg(F.min("turn_idx").alias("turn_idx")).join(
        spans, ["conv_id", "turn_idx"]
    )
    assert first.filter(F.col("parent_span_id").isNotNull()).count() == 0
    spans.unpersist()


def test_retry_commit_backoff():
    from opentelemetry_collector_spark.sinks import writers

    sleeps: list[float] = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 4:
            raise RuntimeError("transient")
        return "ok"

    cfg = writers.RetryConfig(initial_interval=0.1, multiplier=2.0, max_interval=1.0)
    assert writers.retry_commit(flaky, cfg, sleep=sleeps.append) == "ok"
    assert sleeps == [0.1, 0.2, 0.4]  # exponential backoff

    def permanent():
        raise writers.PermanentError("schema mismatch")

    import pytest

    with pytest.raises(writers.PermanentError):
        writers.retry_commit(permanent, cfg, sleep=sleeps.append)
    assert len(sleeps) == 3  # permanent error: no retry sleeps added

    def always_fails():
        raise RuntimeError("down")

    tight = writers.RetryConfig(initial_interval=0.5, multiplier=2.0, max_elapsed=1.0)
    with pytest.raises(RuntimeError, match="down"):
        writers.retry_commit(always_fails, tight, sleep=lambda s: None)
