"""YAML file config provider (confmap fileprovider analog)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans import config as cfg_mod

YAML_DOC = """
receivers:
  transcripts: {}
processors:
  parse:
    method: native
  filter/errs:
    column: text
    regexp: ['^\\[ERROR\\]']
  route: {}
exporters:
  parquet/sinks: {}
service:
  pipelines:
    logs:
      processors: [parse, filter/errs, route]
"""


def test_yaml_file_provider(tmp_path, spark, sf_dir):
    p = tmp_path / "otel-config.yaml"
    p.write_text(YAML_DOC)
    spec = cfg_mod.load_yaml(str(p))
    assert spec.pipeline == ["parse", "filter/errs", "route"]
    df = cfg_mod.build_frame(spark, spec, sf_dir)
    rows = df.limit(5).collect()
    assert rows and all(r["sink"] is not None for r in rows)
    assert all(r["text"].startswith("[ERROR]") for r in rows)


def test_yaml_empty_file(tmp_path):
    import pytest

    p = tmp_path / "empty.yaml"
    p.write_text("")
    with pytest.raises(cfg_mod.ConfigError, match="no receivers"):
        cfg_mod.load_yaml(str(p))


# ------------------------------------------------- confmap ${scheme:ref}

def test_nested_scheme_resolution(tmp_path, monkeypatch):
    """file → env → value chain: a retrieved value containing URIs is
    itself resolved (resolver.go:134-164)."""
    monkeypatch.setenv("OTEL_BATCH", "512")
    inner = tmp_path / "batch.yaml"
    inner.write_text("send_batch_size: ${env:OTEL_BATCH}\n")
    raw = {"processors": {"batch": f"${{file:{inner}}}"}}
    out = cfg_mod.resolve_config(raw)
    # whole-string file URI keeps the YAML type (a map), env ref inside
    # resolves to the int-parsed-as-string value
    assert out == {"processors": {"batch": {"send_batch_size": "512"}}}


def test_yaml_provider_inline_typed():
    out = cfg_mod.resolve_config({"a": "${yaml:[1, 2, 3]}", "b": "${yaml:true}"})
    assert out == {"a": [1, 2, 3], "b": True}


def test_http_provider(tmp_path):
    """httpprovider analog against a local server (no external net)."""
    import http.server
    import threading

    (tmp_path / "cfg.yaml").write_text("mode: remote\n")
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(tmp_path), **kw
    )
    srv = http.server.HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        out = cfg_mod.resolve_config(
            {"svc": f"${{http://127.0.0.1:{port}/cfg.yaml}}"}
        )
        assert out == {"svc": {"mode": "remote"}}
    finally:
        srv.shutdown()


def test_escape_and_defaults(monkeypatch):
    monkeypatch.delenv("OTEL_MISSING", raising=False)
    out = cfg_mod.resolve_config(
        {"a": "$${env:NOT_EXPANDED}", "b": "${env:OTEL_MISSING:-fallback}",
         "c": "x-${env:OTEL_MISSING}-y"}
    )
    assert out == {"a": "${env:NOT_EXPANDED}", "b": "fallback", "c": "x--y"}


def test_unknown_scheme_and_cycle(tmp_path):
    import pytest

    with pytest.raises(cfg_mod.ConfigError, match="scheme"):
        cfg_mod.resolve_config({"a": "${bogus:ref}"})
    cyc = tmp_path / "cyc.yaml"
    cyc.write_text(f"self: ${{file:{cyc}}}\n")
    with pytest.raises(cfg_mod.ConfigError, match="recursive"):
        cfg_mod.resolve_config({"a": f"${{file:{cyc}}}"})


def test_composite_embedded_in_string_rejected():
    import pytest

    with pytest.raises(cfg_mod.ConfigError, match="composite"):
        cfg_mod.resolve_config({"a": "prefix-${yaml:[1,2]}"})


def test_escape_inside_retrieved_value_survives(monkeypatch):
    """A $$-escape produced by an inner resolution must stay literal —
    the substituted text is not re-scanned for URIs."""
    monkeypatch.setenv("OTEL_A", "$${env:SECRET}")
    monkeypatch.setenv("SECRET", "leaked")
    out = cfg_mod.resolve_config({"v": "prefix ${env:OTEL_A} suffix"})
    assert out == {"v": "prefix ${env:SECRET} suffix"}
    # retrieved values that hold REAL URIs still expand recursively
    monkeypatch.setenv("OTEL_B", "${env:SECRET}")
    assert cfg_mod.resolve_config({"v": "x-${env:OTEL_B}"}) == {"v": "x-leaked"}


def test_unused_declared_components_allowed(spark, sf_dir):
    """Declared-but-unreferenced receivers/exporters are legal config
    (the reference simply does not instantiate them)."""
    raw = {
        "receivers": {"transcripts": {}, "transcripts/unused": {}},
        "processors": {},
        "exporters": {"debug": {}, "nop": {}},
        "service": {
            "pipelines": {
                "logs": {"receivers": ["transcripts"], "exporters": ["debug"]}
            }
        },
    }
    frames = cfg_mod.build_service_frames(spark, cfg_mod.load_service(raw), sf_dir)
    assert frames["logs"].count() > 0


def test_validate_config_cli(tmp_path):
    """otelcol validate analog: exit 0 on valid, 1 + readable error on
    invalid, 2 on unreadable."""
    import subprocess
    import sys

    good = tmp_path / "good.yaml"
    good.write_text(
        "receivers: {transcripts: {}}\n"
        "exporters: {debug: {}}\n"
        "service:\n  pipelines:\n    logs:\n"
        "      receivers: [transcripts]\n      exporters: [debug]\n"
    )
    bad = tmp_path / "bad.yaml"
    bad.write_text(
        "receivers: {transcripts: {}}\n"
        "exporters: {debug: {}}\n"
        "connectors: {forward: {}}\n"
        "service:\n  pipelines:\n    logs:\n"
        "      receivers: [transcripts]\n      exporters: [forward]\n"
    )

    def run(*args):
        return subprocess.run(
            [sys.executable, "tools/validate_config.py", *args],
            capture_output=True, text=True, cwd="/root/repo",
        )

    ok = run(str(good))
    assert ok.returncode == 0 and "valid" in ok.stdout
    err = run(str(bad))
    assert err.returncode == 1 and "connector 'forward'" in err.stderr
    assert run(str(tmp_path / "missing.yaml")).returncode == 2


def test_null_service_section_is_config_error():
    """A null `service:` (or scalar pipelines) must raise ConfigError,
    not AttributeError — validate_config promises a readable message."""
    import pytest

    from opentelemetry_collector_spark.plans import config as cfg_mod

    with pytest.raises(cfg_mod.ConfigError):
        cfg_mod.load_service({"receivers": {"transcripts": {}}, "service": None})
    with pytest.raises(cfg_mod.ConfigError):
        cfg_mod.load_service({"service": {"pipelines": "oops"}})
    with pytest.raises(cfg_mod.ConfigError):
        cfg_mod.load_service({"service": "scalar"})


def test_resolver_scheme_allowlist(tmp_path, monkeypatch):
    """allowed_schemes gates providers during RECURSIVE expansion: an
    env value smuggling ${file:…} must be refused when file is
    disabled, and resolve normally when enabled."""
    import pytest

    from opentelemetry_collector_spark.plans import config as cfg_mod

    p = tmp_path / "x.yaml"
    p.write_text("42")
    monkeypatch.setenv("SMUGGLE", "${file:" + str(p) + "}")
    raw = {"a": "${env:SMUGGLE}"}
    assert cfg_mod.resolve_config(raw) == {"a": 42}
    with pytest.raises(cfg_mod.ConfigError, match="disabled"):
        cfg_mod.resolve_config(raw, frozenset({"env", "yaml"}))


def test_list_components_cli():
    """`otelcol components` analog: inventory covers every registry."""
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "list_components",
        pathlib.Path(__file__).resolve().parents[1] / "tools" / "list_components.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    inv = mod.component_inventory()
    assert set(inv) >= {"receivers", "processors", "exporters", "connectors", "featuregates"}
    assert "transcripts" in inv["receivers"] and "forward" in inv["connectors"]
    assert inv["featuregates"]["engine.singlePassFanout"]["stage"] == "beta"


def test_converters_apply_in_order_after_resolution():
    """confmap.Converter contract (confmap/converter.go:38): the
    ordered list runs AFTER provider resolution, each converter seeing
    the previous one's output."""
    calls = []

    def first(conf):
        calls.append("first")
        assert conf["a"] == "resolved"  # providers already ran
        return {**conf, "b": 1}

    def second(conf):
        calls.append("second")
        assert conf["b"] == 1  # sees first's output
        return {**conf, "c": 2}

    import os

    os.environ["OTEL_CONV_T"] = "resolved"
    try:
        out = cfg_mod.resolve_config(
            {"a": "${env:OTEL_CONV_T}"}, converters=(first, second)
        )
    finally:
        del os.environ["OTEL_CONV_T"]
    assert calls == ["first", "second"]
    assert out == {"a": "resolved", "b": 1, "c": 2}


def test_converter_errors_name_the_converter():
    def boom(conf):
        raise KeyError("nope")

    with pytest.raises(cfg_mod.ConfigError, match="boom.*KeyError"):
        cfg_mod.resolve_config({}, converters=(boom,))

    def wrong_type(conf):
        return ["not", "a", "dict"]

    with pytest.raises(cfg_mod.ConfigError, match="wrong_type.*list"):
        cfg_mod.resolve_config({}, converters=(wrong_type,))


def test_rename_key_converter_rewrites_legacy_keys():
    conv = cfg_mod.rename_key_converter("processors", "max_size", "send_batch_size")
    out = conv({"processors": {"batch": {"max_size": 10}, "parse": {}}})
    assert out["processors"]["batch"] == {"send_batch_size": 10}
    with pytest.raises(cfg_mod.ConfigError, match="both"):
        conv({"processors": {"batch": {"max_size": 1, "send_batch_size": 2}}})
    # usable end-to-end through load_spec
    spec = cfg_mod.load_spec(
        {
            "receivers": {"transcripts": {}},
            "processors": {"parse": {}},
            "exporters": {"nop": {}},
        },
        converters=(conv,),
    )
    assert spec.pipeline == ["parse"]


def test_redact_secrets_converter_masks_only_secretish_keys():
    out = cfg_mod.redact_secrets_converter(
        {
            "exporters": {
                "parquet": {"path": "/data", "s3_secret_key": "hunter2"},
                "http": {"auth_token": 12345, "timeout": 30},
            }
        }
    )
    assert out["exporters"]["parquet"]["s3_secret_key"] == "[REDACTED]"
    assert out["exporters"]["http"]["auth_token"] == "[REDACTED]"
    assert out["exporters"]["parquet"]["path"] == "/data"
    assert out["exporters"]["http"]["timeout"] == 30
