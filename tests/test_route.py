"""Routing connector semantics: first-match-wins, quarantine, fan-out
partition (connector/logs_router.go + internal/fanoutconsumer)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import parse
from opentelemetry_collector_spark.operators import route


def _routed(transcripts):
    return route.with_sink(parse.with_parsed(transcripts, "native"))


def test_quarantine_first(transcripts):
    routed = _routed(transcripts)
    assert (
        routed.filter(~F.col("valid"))
        .filter(F.col("sink") != route.QUARANTINE_SINK)
        .count()
        == 0
    )


def test_first_match_wins(transcripts):
    """A valid tool/python row with level=ERROR must hit sink_py (rule
    order), never sink_err."""
    routed = _routed(transcripts)
    both = routed.filter(
        F.col("valid")
        & (F.col("role") == "tool")
        & (F.col("tool") == "python")
        & (F.col("level") == "ERROR")
    )
    assert both.count() > 0
    assert both.filter(F.col("sink") != "sink_py").count() == 0


def test_fallthrough_default(transcripts):
    routed = _routed(transcripts)
    rest = routed.filter(
        F.col("valid")
        & ~((F.col("role") == "tool") & (F.col("tool") == "python"))
        & (F.col("role") != "assistant")
        & (F.col("level") != "ERROR")
    )
    assert rest.filter(F.col("sink") != route.DEFAULT_SINK).count() == 0


def test_fan_out_partitions_input(transcripts):
    """Per-sink frames are disjoint and cover the input exactly
    (fanoutconsumer: every row delivered to exactly one selected sink)."""
    frames = route.fan_out(parse.with_parsed(transcripts, "native"))
    routed = frames.pop("__routed__")
    total = transcripts.count()
    sizes = {s: f.count() for s, f in frames.items()}
    assert sum(sizes.values()) == total
    # disjoint by construction (sink is a single-valued column); spot-check
    ids = None
    for f in frames.values():
        cur = f.select("conv_id", "turn_idx")
        ids = cur if ids is None else ids.unionByName(cur)
    assert ids.distinct().count() == total
    routed.unpersist()


def test_routing_is_pure_function_of_columns(transcripts):
    """Same input → same sink regardless of partitioning (replay-stable)."""
    parsed = parse.with_parsed(transcripts, "native")
    a = route.with_sink(parsed).select("conv_id", "turn_idx", "sink")
    b = route.with_sink(parsed.repartition(13)).select("conv_id", "turn_idx", "sink")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
