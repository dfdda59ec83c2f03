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


# ------------------------------------------------------- write path (r6)


def _wp_resources(spark):
    return spark.createDataFrame(
        [({"conv_id": "c1", "svc": "api"},), ({"conv_id": "c2"},)],
        "attributes map<string,string>",
    )


def _wp_refs():
    return (
        entities.EntityRef("service", "", ("svc",)),
        entities.EntityRef("conversation", "", ("conv_id",), ("svc",)),
    )


def test_put_entity_attribute_writes_through_and_claims_key(spark):
    """PutStr (entity_attribute_map.go:75-81): insert-or-update into
    the SHARED map + key-list claim; the new description attribute is
    visible through the entity view afterwards."""
    res, refs = entities.put_entity_attribute(
        _wp_resources(spark), _wp_refs(), "service", "svc.tier",
        F.upper(F.col("attributes")["svc"]), kind="description",
    )
    svc_ref = [r for r in refs if r.type == "service"][0]
    assert svc_ref.description_keys == ("svc.tier",)
    rows = {r["attributes"].get("conv_id"): r["attributes"] for r in res.collect()}
    assert rows["c1"]["svc.tier"] == "API"
    assert rows["c2"]["svc.tier"] is None  # upper(NULL) writes NULL
    em = entities.entity_map(res, refs, attrs_col="attributes")
    svc_rows = [r for r in em.collect() if r["entity_type"] == "service"]
    assert svc_rows and svc_rows[0]["descr_attrs"]["svc.tier"] == "API"


def test_put_entity_attribute_destructive_vs_safe(spark):
    """The reference Put is destructive across entities (its WARNING);
    safe=True is the CanPut-guarded idiom — a key owned by another
    entity survives untouched on every row."""
    res, refs = entities.put_entity_attribute(
        _wp_resources(spark), _wp_refs(), "service", "conv_id",
        F.lit("HIJACK"), kind="description", safe=True,
    )
    vals = sorted(
        r["attributes"]["conv_id"] for r in res.collect()
    )
    assert vals == ["c1", "c2"]  # safe: blocked everywhere
    res2, _ = entities.put_entity_attribute(
        _wp_resources(spark), _wp_refs(), "service", "conv_id",
        F.lit("HIJACK"), kind="description", safe=False,
    )
    assert {r["attributes"]["conv_id"] for r in res2.collect()} == {"HIJACK"}


def test_put_entity_attribute_update_existing_owned_key(spark):
    """Insert-or-UPDATE: putting an already-owned key replaces the
    value (and the key list gains no duplicate)."""
    res, refs = entities.put_entity_attribute(
        _wp_resources(spark), _wp_refs(), "conversation", "svc",
        F.lit("patched"), kind="description", safe=True,
    )
    conv_ref = [r for r in refs if r.type == "conversation"][0]
    assert conv_ref.description_keys == ("svc",)
    assert {r["attributes"]["svc"] for r in res.collect()} == {"patched"}


def test_remove_entity_attribute_unowned_is_noop(spark):
    """Remove (entity_attribute_map.go:83-99): a key outside the
    entity's key list never touches the shared map — unlike Put,
    removing another entity's attribute through this view is
    impossible."""
    res, refs = entities.remove_entity_attribute(
        _wp_resources(spark), _wp_refs(), "service", "conv_id"
    )
    assert refs == _wp_refs()
    assert sorted(
        r["attributes"].get("conv_id") for r in res.collect()
    ) == ["c1", "c2"]
    # owned key: leaves both the map and the key list
    res2, refs2 = entities.remove_entity_attribute(
        _wp_resources(spark), _wp_refs(), "conversation", "svc"
    )
    conv_ref = [r for r in refs2 if r.type == "conversation"][0]
    assert conv_ref.description_keys == ()
    assert all("svc" not in r["attributes"] for r in res2.collect())


def test_can_put_predicate(spark):
    """CanPut truth table: owned key → True; free key → True; key held
    by the shared map but not owned → False."""
    res = _wp_resources(spark)
    refs = _wp_refs()
    got = res.select(
        entities.can_put(refs, "service", "svc").alias("owned"),
        entities.can_put(refs, "service", "brand.new").alias("free"),
        entities.can_put(refs, "service", "conv_id").alias("held"),
    ).collect()
    assert all(r["owned"] and r["free"] and not r["held"] for r in got)


def test_put_entity_attribute_inserts_into_null_map(spark):
    """A NULL attribute map behaves like the reference's empty map (r6
    review): PutStr inserts rather than silently no-opping while the
    key list already claimed the key."""
    res = spark.createDataFrame(
        [(None,), ({"conv_id": "c1"},)], "attributes map<string,string>"
    )
    out, _refs = entities.put_entity_attribute(
        res, _wp_refs(), "service", "svc.tier", F.lit("t0"),
        kind="description",
    )
    got = [r["attributes"] for r in out.collect()]
    assert all(a is not None and a["svc.tier"] == "t0" for a in got)
