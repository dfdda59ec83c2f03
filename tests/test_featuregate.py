"""Feature gate registry semantics (featuregate/registry.go:55-96)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans import featuregate as fg


def _reg():
    r = fg.Registry()
    r.register("x.alpha", fg.ALPHA, "a")
    r.register("x.beta", fg.BETA, "b")
    r.register("x.stable", fg.STABLE, "s")
    r.register("x.dep", fg.DEPRECATED, "d")
    return r


def test_stage_defaults():
    r = _reg()
    assert not r.is_enabled("x.alpha")
    assert r.is_enabled("x.beta")
    assert r.is_enabled("x.stable")
    assert not r.is_enabled("x.dep")


def test_set_rules():
    r = _reg()
    r.set("x.alpha", True)
    assert r.is_enabled("x.alpha")
    with pytest.raises(fg.GateError, match="stable"):
        r.set("x.stable", False)
    with pytest.raises(fg.GateError, match="deprecated"):
        r.set("x.dep", True)
    with pytest.raises(fg.GateError, match="no such"):
        r.set("ghost", True)


def test_must_register():
    r = _reg()
    with pytest.raises(fg.GateError, match="already registered"):
        r.register("x.alpha", fg.ALPHA)
    with pytest.raises(fg.GateError, match="stage"):
        r.register("x.new", "gamma")


def test_flag_syntax():
    r = _reg()
    r.apply_flags("x.alpha,-x.beta, +x.alpha")
    assert r.is_enabled("x.alpha") and not r.is_enabled("x.beta")


def test_gate_controls_config_default(spark, sf_dir):
    """The parse processor's default method follows engine.arrowParse
    when the config omits it; explicit config wins over the gate."""
    from opentelemetry_collector_spark.plans import config as cfg_mod

    raw = {
        "receivers": {"transcripts": {}},
        "processors": {"parse": {}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {"processors": ["parse"]}}},
    }
    fg.REGISTRY.set("engine.arrowParse", True)
    try:
        df = cfg_mod.build_frame(spark, cfg_mod.load_spec(raw), sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "ArrowEvalPython" in plan or "PythonUDF" in plan
    finally:
        fg.REGISTRY.set("engine.arrowParse", False)
    df2 = cfg_mod.build_frame(spark, cfg_mod.load_spec(raw), sf_dir)
    plan2 = df2._jdf.queryExecution().optimizedPlan().toString()
    assert "PythonUDF" not in plan2
