"""Config-driven pipeline assembly (otelcol config lifecycle analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans import config as cfg_mod
from opentelemetry_collector_spark.plans import pipeline

RAW = {
    "receivers": {"transcripts": {}},
    "processors": {
        "parse": {"method": "native"},
        "enrich": {},
        "route": {},
    },
    "exporters": {"parquet/sinks": {}},
    "service": {"pipelines": {"logs": {"processors": ["parse", "enrich", "route"]}}},
}


def test_config_pipeline_matches_handwritten(spark, sf_dir):
    spec = cfg_mod.load_spec(RAW)
    got = cfg_mod.build_frame(spark, spec, sf_dir).select("conv_id", "turn_idx", "sink")
    want = pipeline.routed_frame(spark, sf_dir).select("conv_id", "turn_idx", "sink")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_unknown_component_rejected():
    bad = dict(RAW, processors={"frobnicate": {}})
    bad["service"] = {"pipelines": {"logs": {"processors": ["frobnicate"]}}}
    with pytest.raises(cfg_mod.ConfigError, match="frobnicate"):
        cfg_mod.load_spec(bad)


def test_missing_sections_rejected():
    with pytest.raises(cfg_mod.ConfigError, match="no receivers"):
        cfg_mod.load_spec({"exporters": {"nop": {}}})
    with pytest.raises(cfg_mod.ConfigError, match="no exporters"):
        cfg_mod.load_spec({"receivers": {"nop": {}}})


def test_undeclared_processor_in_pipeline_rejected():
    bad = dict(RAW)
    bad["service"] = {"pipelines": {"logs": {"processors": ["parse", "ghost"]}}}
    with pytest.raises(cfg_mod.ConfigError, match="ghost"):
        cfg_mod.load_spec(bad)


def test_env_expansion(monkeypatch):
    monkeypatch.setenv("OTEL_METHOD", "arrow")
    raw = cfg_mod.expand_env({"a": "${env:OTEL_METHOD}", "b": "${env:MISSING:-dflt}"})
    assert raw == {"a": "arrow", "b": "dflt"}


def test_configured_filter_and_batch(spark, sf_dir):
    raw = {
        "receivers": {"transcripts": {}},
        "processors": {
            "filter/errors": {"column": "text", "regexp": [r"^\[ERROR\]"]},
            "batch": {"send_batch_size": 64, "shard_keys": ["role"]},
        },
        "exporters": {"debug": {}},
        "service": {
            "pipelines": {"logs": {"processors": ["filter/errors", "batch"]}}
        },
    }
    df = cfg_mod.build_frame(spark, cfg_mod.load_spec(raw), sf_dir)
    assert df.filter(~F.col("text").startswith("[ERROR]")).count() == 0
    assert df.groupBy("role", "batch_id").count().agg(F.max("count")).collect()[0][0] <= 64


def test_route_without_parse_stage(spark, sf_dir):
    """A pipeline that routes raw (unparsed) rows must route, not fail
    on the missing `valid` column (ADVICE: the reference router has no
    parse coupling)."""
    raw = {
        "receivers": {"transcripts": {}},
        "processors": {
            "route": {
                "routes": [
                    {
                        "route_id": "r_tool",
                        "predicate": "role = 'tool'",
                        "sink": "sink_tools",
                    }
                ]
            }
        },
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {"processors": ["route"]}}},
    }
    df = cfg_mod.build_frame(spark, cfg_mod.load_spec(raw), sf_dir)
    sinks = {r["sink"] for r in df.select("sink").distinct().collect()}
    assert "sink_quarantine" not in sinks and "sink_default" in sinks


def test_config_metadata_cardinality_limit(spark, sf_dir):
    from opentelemetry_collector_spark.operators import batch as batch_mod

    raw = {
        "receivers": {"transcripts": {}},
        "processors": {
            "batch": {"shard_keys": ["conv_id"], "metadata_cardinality_limit": 5}
        },
        "exporters": {"debug": {}},
        "service": {"pipelines": {"logs": {"processors": ["batch"]}}},
    }
    with pytest.raises(batch_mod.CardinalityLimitError):
        cfg_mod.build_frame(spark, cfg_mod.load_spec(raw), sf_dir)


# --------------------------------------------- multi-pipeline + connectors

def _two_pipeline_raw():
    return {
        "receivers": {"transcripts": {}},
        "processors": {"parse": {}, "route": {}},
        "connectors": {"count/sink": {"group_by": ["sink"]}},
        "exporters": {"nop": {}, "debug": {}},
        "service": {
            "pipelines": {
                "logs": {
                    "receivers": ["transcripts"],
                    "processors": ["parse", "route"],
                    "exporters": ["count/sink", "nop"],
                },
                "metrics": {
                    "receivers": ["count/sink"],
                    "exporters": ["debug"],
                },
            }
        },
    }


def test_multi_pipeline_count_connector(spark, sf_dir):
    spec = cfg_mod.load_service(_two_pipeline_raw())
    frames = cfg_mod.build_service_frames(spark, spec, sf_dir)
    assert set(frames) == {"logs", "metrics"}
    logs_n = frames["logs"].count()
    metrics = {r["sink"]: r["n"] for r in frames["metrics"].collect()}
    assert sum(metrics.values()) == logs_n  # count connector conserves rows
    assert "sink_quarantine" in metrics


def test_forward_connector_fans_in(spark, sf_dir):
    """Two pipelines exporting into one forward connector: the consumer
    sees the union (forward.go:77-90)."""
    raw = {
        "receivers": {"transcripts": {}, "transcripts/b": {}},
        "processors": {},
        "connectors": {"forward": {}},
        "exporters": {"debug": {}},
        "service": {
            "pipelines": {
                "logs/in_a": {"receivers": ["transcripts"], "exporters": ["forward"]},
                "logs/in_b": {"receivers": ["transcripts/b"], "exporters": ["forward"]},
                "logs/out": {"receivers": ["forward"], "exporters": ["debug"]},
            }
        },
    }
    frames = cfg_mod.build_service_frames(spark, cfg_mod.load_service(raw), sf_dir)
    assert frames["logs/out"].count() == frames["logs/in_a"].count() + frames["logs/in_b"].count()


def test_half_wired_connector_rejected():
    raw = _two_pipeline_raw()
    raw["service"]["pipelines"]["metrics"]["receivers"] = ["transcripts"]
    with pytest.raises(cfg_mod.ConfigError, match="connector 'count/sink'"):
        cfg_mod.load_service(raw)


def test_connector_cycle_rejected(spark, sf_dir):
    raw = {
        "receivers": {"transcripts": {}},
        "processors": {},
        "connectors": {"forward/a": {}, "forward/b": {}},
        "exporters": {"debug": {}},
        "service": {
            "pipelines": {
                "logs/p1": {"receivers": ["transcripts", "forward/b"], "exporters": ["forward/a"]},
                "logs/p2": {"receivers": ["forward/a"], "exporters": ["forward/b", "debug"]},
            }
        },
    }
    from opentelemetry_collector_spark.plans.graph import GraphError

    with pytest.raises((cfg_mod.ConfigError, GraphError), match="cycle"):
        cfg_mod.build_service_frames(spark, cfg_mod.load_service(raw), sf_dir)


def test_undeclared_pipeline_refs_rejected():
    raw = _two_pipeline_raw()
    raw["service"]["pipelines"]["logs"]["processors"] = ["parse", "ghost"]
    with pytest.raises(cfg_mod.ConfigError, match="ghost"):
        cfg_mod.load_service(raw)


# ------------------------------------------------------- service.telemetry

def test_telemetry_config_levels():
    t = cfg_mod.load_telemetry(
        {"service": {"telemetry": {"logs": {"level": "DEBUG"},
                                   "metrics": {"level": "detailed"}}}}
    )
    assert t.logs_level == "debug" and t.metrics_level == "detailed"
    assert t.write_metrics
    assert cfg_mod.load_telemetry({}) == cfg_mod.TelemetryConfig()
    with pytest.raises(cfg_mod.ConfigError, match="telemetry metrics level"):
        cfg_mod.load_telemetry({"service": {"telemetry": {"metrics": {"level": "max"}}}})
    with pytest.raises(cfg_mod.ConfigError, match="telemetry logs level"):
        cfg_mod.load_telemetry({"service": {"telemetry": {"logs": {"level": "trace"}}}})


def test_telemetry_none_suppresses_self_telemetry(spark, sf_dir, tmp_path):
    from pathlib import Path

    from opentelemetry_collector_spark.plans import runner

    out = str(tmp_path / "t")
    runner.run_pipeline(
        spark, sf_dir, out, run_id="r1",
        telemetry=cfg_mod.TelemetryConfig(metrics_level="none"),
    )
    assert not (Path(out) / "run_id=r1" / "metrics").exists()
    assert not (Path(out) / "run_id=r1" / "status").exists()
    assert (Path(out) / "run_id=r1" / "agg").exists()  # data unaffected


def test_telemetry_in_service_spec_and_null_subsections():
    raw = _two_pipeline_raw()
    raw["service"]["telemetry"] = {"metrics": {"level": "none"}, "logs": None}
    spec = cfg_mod.load_service(raw)
    assert spec.telemetry.metrics_level == "none" and not spec.telemetry.write_metrics
    assert spec.telemetry.logs_level == "info"  # YAML-null subsection → default


def test_pipeline_ids_are_signal_typed():
    """pipeline/pipeline.go ID semantics: signal[/name], unknown
    signals are config errors."""
    raw = {
        "receivers": {"transcripts": {}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {
            "telemetry": {"receivers": ["transcripts"], "exporters": ["debug"]},
        }},
    }
    with pytest.raises(cfg_mod.ConfigError, match="unknown signal"):
        cfg_mod.load_service(raw)
    raw["service"]["pipelines"] = {
        "logs/custom": {"receivers": ["transcripts"], "exporters": ["debug"]},
    }
    assert "logs/custom" in cfg_mod.load_service(raw).pipelines


def test_profiles_pipeline_gated(monkeypatch):
    """service/pipelines/config.go: profiles pipelines need the alpha
    service.profilesSupport gate."""
    from opentelemetry_collector_spark.plans import featuregate

    raw = {
        "receivers": {"transcripts": {}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {
            "profiles": {"receivers": ["transcripts"], "exporters": ["debug"]},
        }},
    }
    with pytest.raises(cfg_mod.ConfigError, match="profilesSupport"):
        cfg_mod.load_service(raw)
    monkeypatch.setattr(
        featuregate, "REGISTRY", featuregate.default_registry()
    )
    featuregate.REGISTRY.set("service.profilesSupport", True)
    assert "profiles" in cfg_mod.load_service(raw).pipelines


def test_duplicate_processor_in_pipeline_rejected():
    raw = {
        "receivers": {"transcripts": {}},
        "processors": {"parse": {}},
        "exporters": {"debug": {}},
        "service": {"pipelines": {
            "logs": {
                "receivers": ["transcripts"],
                "processors": ["parse", "parse"],
                "exporters": ["debug"],
            },
        }},
    }
    with pytest.raises(cfg_mod.ConfigError, match="more than once"):
        cfg_mod.load_service(raw)


def test_set_overrides():
    """--set flag semantics (otelcol/flags.go): typed YAML values,
    maps join, scalars/arrays override, last entry wins."""
    raw = {"processors": {"batch": {"size": 10, "keep": True}}}
    out = cfg_mod.apply_set_overrides(
        raw,
        [
            "processors.batch.size=100",
            "processors.filter.column=role",
            "service.telemetry.logs.level=debug",
            "processors.batch.size=200",
        ],
    )
    assert out["processors"]["batch"] == {"size": 200, "keep": True}
    assert out["processors"]["filter"] == {"column": "role"}
    assert out["service"]["telemetry"]["logs"]["level"] == "debug"
    assert raw["processors"]["batch"]["size"] == 10  # input untouched
    with pytest.raises(cfg_mod.ConfigError, match="key=value"):
        cfg_mod.apply_set_overrides({}, ["novalue"])


def test_merge_configs_later_wins_and_gate(monkeypatch):
    """Multi---config merge: maps join recursively, later scalar wins;
    lists replace by default and append+dedup under the
    confmap.enableMergeAppendOption gate (conf.go mergeAppend)."""
    from opentelemetry_collector_spark.plans import featuregate

    # isolate from the shared global registry for BOTH halves
    monkeypatch.setattr(featuregate, "REGISTRY", featuregate.default_registry())
    a = {"exporters": {"debug": {"verbosity": "basic"}},
         "service": {"pipelines": {"logs": {"receivers": ["transcripts"]}}}}
    b = {"exporters": {"debug": {"sample": 5}},
         "service": {"pipelines": {"logs": {"receivers": ["nop"]}}}}
    out = cfg_mod.merge_configs([a, b])
    assert out["exporters"]["debug"] == {"verbosity": "basic", "sample": 5}
    assert out["service"]["pipelines"]["logs"]["receivers"] == ["nop"]  # replace
    featuregate.REGISTRY.set("confmap.enableMergeAppendOption", True)
    out2 = cfg_mod.merge_configs([a, b, {"service": {"pipelines": {"logs": {
        "receivers": ["transcripts"]}}}}])
    # append + dedup: transcripts appears once despite two sources
    assert out2["service"]["pipelines"]["logs"]["receivers"] == [
        "transcripts", "nop"
    ]
