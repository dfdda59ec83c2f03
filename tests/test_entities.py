"""Entity signal (functions/entities.py): EntityRef key-partitioning
semantics over resource attribute maps
(pdata/xpdata/entity/generated_entityref.go:46-100, entity_map.go)."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import entities


REFS = (
    entities.EntityRef("service", "https://s/1", ("svc",)),
    entities.EntityRef("host", "https://s/1", ("host", "region"), ("os",)),
)


def _resources(spark):
    return spark.createDataFrame(
        [
            ({"svc": "api", "host": "h1", "region": "eu", "os": "linux"},),
            ({"svc": "api", "host": "h2"},),  # region missing → no host entity
            ({"host": "h3", "region": "us"},),  # svc missing → no service entity
        ],
        "attributes map<string,string>",
    )


def test_entity_map_partitions_and_completeness(spark):
    rows = entities.entity_map(_resources(spark), REFS).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["entity_type"], []).append(r)
    # service: resources 1 and 2 (resource 3 lacks svc)
    assert len(by_type["service"]) == 2
    assert all(set(r["id_attrs"]) == {"svc"} for r in by_type["service"])
    # host: resources 1 and 3 only — resource 2 misses one of TWO id
    # keys, and partial identity must not produce an entity
    assert len(by_type["host"]) == 2
    assert all(
        set(r["id_attrs"]) == {"host", "region"} for r in by_type["host"]
    )
    # description view is best-effort: present on resource 1, empty on 3
    descr = {r["id_attrs"]["host"]: dict(r["descr_attrs"]) for r in by_type["host"]}
    assert descr == {"h1": {"os": "linux"}, "h3": {}}
    assert all(r["entity_schema_url"] == "https://s/1" for r in rows)


def test_empty_id_keys_rejected(spark):
    """EntityRef() defaults id_keys to (); the completeness check would
    be vacuously true for it (0 == 0), so entity_map must refuse."""
    import pytest

    with pytest.raises(ValueError, match="no id_keys"):
        entities.entity_map(
            _resources(spark), (entities.EntityRef("service"),)
        )


def test_entity_map_keeps_non_attr_columns(spark):
    df = _resources(spark).withColumn("rid", F.monotonically_increasing_id())
    out = entities.entity_map(df, REFS)
    assert "rid" in out.columns and "attributes" not in out.columns
