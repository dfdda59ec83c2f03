"""End-to-end pipeline: order, enrich, aggregate invariants + plan hygiene."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators import aggregate, enrich, order, route
from opentelemetry_collector_spark.plans import pipeline


def test_turn_order_matches_turn_idx(transcripts):
    """turn_idx is dense per conv → stable seq must equal turn_idx + 1."""
    seq = order.with_turn_order(transcripts)
    assert seq.filter(F.col("turn_seq") != F.col("turn_idx") + 1).count() == 0


def test_enrich_total_and_broadcast(spark, transcripts):
    out = enrich.enrich_with_defaults(transcripts, spark)
    assert out.filter(F.col("role_kind").isNull()).count() == 0
    assert out.filter(F.col("tool_family").isNull()).count() == 0
    assert out.count() == transcripts.count()  # left joins never drop
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_salted_equals_plain(spark, sf_dir):
    routed = pipeline.routed_frame(spark, sf_dir)
    plain = aggregate.sink_window_counts(routed)
    salted = aggregate.salted_sink_window_counts(routed, salt_buckets=8)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_aggregate_preserves_total(spark, sf_dir, transcripts):
    agg = pipeline.flagship(spark, sf_dir)
    assert agg.agg(F.sum("n_turns")).collect()[0][0] == transcripts.count()


def test_flagship_plan_native_no_python(spark, sf_dir):
    import contextlib
    import io

    df = pipeline.flagship(spark, sf_dir)
    df.collect()  # finalize the AQE plan before inspecting it
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "codegen id" in plan  # whole-stage codegen spans present
    assert "PushedFilters" in plan  # scan-level pushdown intact


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    missing = [k for k in os_ if k not in qs]
    assert not missing
