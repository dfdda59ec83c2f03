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


def test_asof_enrich_semantics(spark):
    """SCD-2 as-of: greatest valid_from <= ts wins, boundary inclusive,
    NULL before the first version and for unknown keys."""
    import datetime as dt

    from opentelemetry_collector_spark.operators import enrich

    def us(s):
        return int(dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)

    versions = [
        ("python", us("2025-01-01T00:00:00"), "v1", 1),
        ("python", us("2025-01-01T06:00:00"), "v2", 2),
    ]
    rows = [
        ("c", 0, "python", dt.datetime(2025, 1, 1, 5, 59, 59)),
        ("c", 1, "python", dt.datetime(2025, 1, 1, 6, 0, 0)),  # boundary → v2
        ("c", 2, "python", dt.datetime(2024, 12, 31, 0, 0, 0)),  # pre-v1 → NULL
        ("c", 3, "ghost", dt.datetime(2025, 1, 1, 12, 0, 0)),  # unknown key
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, tool string, ts timestamp")
    out = {
        r["turn_idx"]: (r["tool_version"], r["cost_tier"])
        for r in enrich.asof_enrich(df, versions, ("tool_version", "cost_tier")).collect()
    }
    assert out[0] == ("v1", 1)
    assert out[1] == ("v2", 2)  # >= is inclusive (matches DuckDB ASOF)
    assert out[2] == (None, None)
    assert out[3] == (None, None)


def test_asof_enrich_zero_shuffle(spark, sf_dir):
    """The literal-map as-of lookup must add NO exchange and NO join —
    pure map-side expression over the scan."""
    from opentelemetry_collector_spark.operators import enrich
    from opentelemetry_collector_spark.sources import tables

    df = tables.read_transcripts(spark, sf_dir)
    out = enrich.asof_enrich(
        df, enrich.load_versioned_tool_dim(), ("tool_version", "cost_tier")
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan[:500]
