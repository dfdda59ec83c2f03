"""YAML file config provider (confmap fileprovider analog)."""

from __future__ import annotations

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
