"""Pipeline-graph validation (service/internal/graph/graph_test.go analog)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans.graph import GraphError, PipelineGraph


def _linear() -> PipelineGraph:
    g = PipelineGraph()
    g.add("otlp_in", "receiver")
    g.add("parse", "processor")
    g.add("routecon", "connector")
    g.add("sink_py", "exporter")
    g.add("sink_llm", "exporter")
    g.connect("otlp_in", "parse")
    g.connect("parse", "routecon")
    g.connect("routecon", "sink_py")
    g.connect("routecon", "sink_llm")
    return g


def test_valid_topology_orders_upstream_first():
    order = _linear().validate()
    assert order.index("otlp_in") < order.index("parse") < order.index("routecon")


def test_cycle_detected():
    g = _linear()
    g.add("p2", "processor")
    g.connect("routecon", "p2")
    # p2 → parse closes a cycle parse → routecon → p2 → parse
    g.edges.append(("p2", "parse"))
    with pytest.raises(GraphError, match="cycle"):
        g.validate()


def test_bad_edges_rejected():
    g = _linear()
    with pytest.raises(GraphError, match="cannot have downstream"):
        g.connect("sink_py", "parse")
    with pytest.raises(GraphError, match="cannot be a downstream"):
        g.connect("parse", "otlp_in")
    with pytest.raises(GraphError, match="unknown component"):
        g.connect("parse", "nope")


def test_orphans_rejected():
    g = PipelineGraph()
    g.add("r", "receiver")
    g.add("e", "exporter")
    with pytest.raises(GraphError, match="feeds no pipeline"):
        g.validate()


def test_duplicate_name_rejected():
    g = PipelineGraph()
    g.add("x", "receiver")
    with pytest.raises(GraphError, match="duplicate"):
        g.add("x", "processor")
