"""Component status lifecycle (component/componentstatus +
service/internal/graph/graph.go:442-488 StartAll/StopAll reports)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.sinks.writers import PermanentError
from opentelemetry_collector_spark.state import status as S


def test_happy_lifecycle_and_aggregate():
    r = S.StatusReporter()
    out = S.run_reported(r, "exporter/a", lambda: 42)
    assert out == 42
    assert r.current["exporter/a"] == S.OK
    assert r.aggregate() == S.OK
    S.stop_all(r)
    assert r.current["exporter/a"] == S.STOPPED
    kinds = [e[2] for e in r.events]
    assert kinds == [S.STARTING, S.OK, S.STOPPING, S.STOPPED]
    assert [e[0] for e in r.events] == [1, 2, 3, 4]  # dense seq, no clock


def test_permanent_error_reported_and_raised():
    r = S.StatusReporter()

    def boom():
        raise PermanentError("bad payload")

    with pytest.raises(PermanentError):
        S.run_reported(r, "exporter/a", boom)
    assert r.current["exporter/a"] == S.PERMANENT_ERROR
    assert r.aggregate() == S.PERMANENT_ERROR
    # most-severe-wins aggregation across components
    S.run_reported(r, "exporter/b", lambda: None)
    assert r.aggregate() == S.PERMANENT_ERROR


def test_recoverable_error_then_ok():
    r = S.StatusReporter()
    with pytest.raises(RuntimeError):
        S.run_reported(r, "exporter/a", lambda: (_ for _ in ()).throw(RuntimeError("x")))
    assert r.current["exporter/a"] == S.RECOVERABLE_ERROR
    S.run_reported(r, "exporter/a", lambda: None)  # retry succeeds
    assert r.current["exporter/a"] == S.OK


def test_invalid_transitions_rejected():
    r = S.StatusReporter()
    with pytest.raises(S.StatusTransitionError):
        r.report("c", S.OK)  # must start via Starting
    r.report("c", S.STARTING)
    r.report("c", S.PERMANENT_ERROR)
    with pytest.raises(S.StatusTransitionError):
        r.report("c", S.OK)  # permanent error cannot self-heal
    r.report("c", S.STOPPING)
    r.report("c", S.STOPPED)
    with pytest.raises(S.StatusTransitionError):
        r.report("c", S.STARTING)  # stopped is terminal


def test_runner_writes_status_table(spark, sf_dir, tmp_path):
    from opentelemetry_collector_spark.plans import runner

    out = str(tmp_path / "st")
    runner.run_pipeline(spark, sf_dir, out, run_id="r1")
    df = spark.read.parquet(f"{out}/run_id=r1/status")
    rows = [(r["component"], r["status"]) for r in df.orderBy("seq").collect()]
    comps = {c for c, _ in rows}
    assert all(c.startswith("exporter/") for c in comps) and len(comps) == 5
    for c in comps:
        assert (c, S.STARTING) in rows and (c, S.OK) in rows
        assert (c, S.STOPPED) in rows
