"""Profiles signal (pdata/pprofile analog): hot-functions star query."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import profiles


def _mini_tables(spark):
    functions = spark.createDataFrame(
        [(0, "main", "main.go"), (1, "work", "work.go"), (2, "leafy", "leaf.go")],
        "function_id int, name string, filename string",
    )
    locations = spark.createDataFrame(
        [(0, 0, 10), (1, 1, 20), (2, 2, 30), (3, 2, 31)],
        "location_id int, function_id int, line int",
    )
    # stack 0: leafy←work←main; stack 1: work←main; stack 2 recursive
    # leafy←leafy←main (total must count leafy ONCE per sample)
    stacks = spark.createDataFrame(
        [(0, [2, 1, 0]), (1, [1, 0]), (2, [2, 3, 0])],
        "stack_id int, location_ids array<int>",
    )
    samples = spark.createDataFrame(
        [(0, 0, 0, 100), (1, 0, 1, 10), (2, 0, 2, 1000)],
        "sample_id long, profile_id int, stack_id int, value long",
    )
    return samples, stacks, locations, functions


def test_hot_functions_self_total_semantics(spark):
    samples, stacks, locations, functions = _mini_tables(spark)
    rows = {
        r["name"]: r
        for r in profiles.hot_functions(samples, stacks, locations, functions, k=10).collect()
    }
    # main: never a leaf, appears in all samples
    assert rows["main"]["self_ns"] == 0 and rows["main"]["total_ns"] == 1110
    assert rows["main"]["n_samples"] == 3
    # work: leaf of sample 1 only; in samples 0 and 1
    assert rows["work"]["self_ns"] == 10 and rows["work"]["total_ns"] == 110
    # leafy: leaf of samples 0 and 2; recursion in sample 2 counted once
    assert rows["leafy"]["self_ns"] == 1100 and rows["leafy"]["total_ns"] == 1100
    assert rows["leafy"]["n_samples"] == 2


def test_hot_functions_topk_deterministic(spark):
    samples, stacks, locations, functions = _mini_tables(spark)
    top = profiles.hot_functions(samples, stacks, locations, functions, k=1).collect()
    assert len(top) == 1 and top[0]["name"] == "leafy"


def test_hot_functions_plan_broadcasts_dims(spark):
    """All three dictionary joins must be broadcasts — the fact table
    is the only large input and must never shuffle on a dim key."""
    t = profiles.read_profile_tables(spark)
    df = profiles.hot_functions(t["samples"], t["stacks"], t["locations"], t["functions"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_fixture_deterministic(spark):
    paths = profiles.read_profile_tables(spark)
    n = paths["samples"].count()
    assert n == 4000
    # every stack's every location resolves to a function (no orphans)
    ex = (
        paths["stacks"].select(F.explode("location_ids").alias("location_id"))
        .join(paths["locations"], "location_id", "left_anti")
    )
    assert ex.count() == 0


def _link_tables(spark):
    links = spark.createDataFrame(
        [(0, None, None), (1, "aa" * 16, "bb" * 8), (2, "cc" * 16, "dd" * 8)],
        "link_id int, trace_id string, span_id string",
    )
    # sample 0 unlinked (LinkIndex 0, sample.go:24); 1+2 → link 1; 3 → link 2
    samples = spark.createDataFrame(
        [
            (0, 0, 0, 100, 0, [1]),
            (1, 0, 0, 7, 1, [1, 9]),
            (2, 0, 1, 5, 1, [2]),
            (3, 0, 2, 40, 2, [1, 13]),
        ],
        "sample_id long, profile_id int, stack_id int, value long, "
        "link_id int, attribute_ids array<int>",
    )
    return samples, links


def test_span_hotspots_linkindex_zero_excluded(spark):
    _, stacks, locations, functions = _mini_tables(spark)
    samples, links = _link_tables(spark)
    rows = {
        (r["trace_id"], r["span_id"]): r
        for r in profiles.span_hotspots(
            samples, links, stacks, locations, functions
        ).collect()
    }
    assert len(rows) == 2  # unlinked sample 0 (100ns) contributes nowhere
    a = rows[("aa" * 16, "bb" * 8)]
    # samples 1 (leaf leafy, 7) + 2 (leaf work, 5)
    assert a["n_samples"] == 2 and a["total_ns"] == 12
    assert a["top_leaf_fn"] == "leafy" and a["top_leaf_self_ns"] == 7
    b = rows[("cc" * 16, "dd" * 8)]
    assert b["n_samples"] == 1 and b["total_ns"] == 40
    assert b["top_leaf_fn"] == "leafy"  # stack 2 leaf is location 2 → leafy


def test_span_hotspots_dangling_link_is_loud(spark):
    """A sample whose link_id misses the LinkTable must raise, not
    silently vanish from the span totals — the same loud-guard policy
    as the stack/location/function dims (r5 review)."""
    import pytest

    _, stacks, locations, functions = _mini_tables(spark)
    samples, links = _link_tables(spark)
    dangling = samples.union(
        spark.createDataFrame(
            [(9, 0, 0, 11, 7, [1])], samples.schema  # link 7 not in links
        )
    )
    with pytest.raises(Exception, match="link_id missing from LinkTable"):
        profiles.span_hotspots(
            dangling, links, stacks, locations, functions
        ).collect()


def test_span_hotspots_null_id_link_row_is_loud_and_named(spark):
    """A LinkTable row that EXISTS but carries a NULL trace_id must
    raise with the malformed-row message, not the missing-row one
    (r5 review: the sentinel-only guard misattributed this case and
    sent operators chasing a nonexistent join bug)."""
    import pytest

    _, stacks, locations, functions = _mini_tables(spark)
    samples, links = _link_tables(spark)
    bad_links = links.union(
        spark.createDataFrame(
            [(7, None, "ee" * 8)], "link_id int, trace_id string, span_id string"
        )
    )
    with_bad = samples.union(
        spark.createDataFrame(
            [(9, 0, 0, 11, 7, [1])], samples.schema
        )
    )
    with pytest.raises(Exception, match="NULL trace_id: link_id 7"):
        profiles.span_hotspots(
            with_bad, bad_links, stacks, locations, functions
        ).collect()


def test_attr_units_rollup(spark):
    samples, _ = _link_tables(spark)
    attributes = spark.createDataFrame(
        [
            (0, "", None, None, None),
            (1, "thread.name", "worker-1", None, None),
            (2, "thread.name", "worker-2", None, None),
            (9, "memory.allocated", None, 4096, "bytes"),
            (13, "gc.pause", None, 3, "ms"),
        ],
        "attr_id int, key string, str_value string, int_value long, unit string",
    )
    rows = {
        (r["key"], r["unit"]): r
        for r in profiles.attr_units(samples, attributes).collect()
    }
    t = rows[("thread.name", None)]
    assert t["n_incidences"] == 4 and t["n_values"] == 2 and t["total_int"] is None
    m = rows[("memory.allocated", "bytes")]
    assert m["n_incidences"] == 1 and m["total_int"] == 4096
    g = rows[("gc.pause", "ms")]
    assert g["n_incidences"] == 1 and g["total_int"] == 3


def test_links_fixture_dictionary_zero_reserved(spark):
    t = profiles.read_profile_tables(spark)
    z = t["links"].filter(F.col("link_id") == 0).collect()
    assert len(z) == 1 and z[0]["trace_id"] is None and z[0]["span_id"] is None
    za = t["attributes"].filter(F.col("attr_id") == 0).collect()
    assert len(za) == 1 and za[0]["key"] == ""
    # sample attribute indices never reference the reserved empty row
    bad = t["samples"].select(
        F.explode("attribute_ids").alias("attr_id")
    ).filter(F.col("attr_id") == 0)
    assert bad.count() == 0


# ------------------------------------------------- OTLP/JSON envelope (r6)


def test_profiles_otlp_envelope_presence_edges(spark):
    """Sample-level proto3 presence (generated_proto_sample.go):
    linkIndex 0 (= the reserved unlinked entry, sample.go:24) and an
    EMPTY attributeIndices are ABSENT from the document; both come back
    as their zero forms (link_id 0, '' signature). stackIndex rides
    +1-shifted around the reserved slot 0."""
    import json

    from opentelemetry_collector_spark.functions import profiles_otlp

    rows = [
        (0, 7, 3, 100, "2025-01-01 00:00:00", 2, [1, 4]),
        (1, 7, 5, 200, "2025-01-01 00:00:01", 0, []),
    ]
    samples = spark.createDataFrame(
        rows,
        "sample_id long, profile_id int, stack_id int, value long, "
        "ts string, link_id int, attribute_ids array<int>",
    )
    nested = profiles_otlp.nest_profiles_to_otlp(samples)
    doc = json.loads(nested.first()["otlp_json"])
    prof = doc["scopeProfiles"][0]["profiles"][0]
    s0, s1 = prof["samples"]
    assert s0["stackIndex"] == 4 and s0["linkIndex"] == 2
    assert s0["attributeIndices"] == [1, 4]
    assert "linkIndex" not in s1 and "attributeIndices" not in s1
    assert s1["stackIndex"] == 6
    assert prof["durationNano"] == 1_000_000_000
    assert len(prof["profileId"]) == 32  # 16-byte id, hex
    back = {
        r["stack_id"]: r
        for r in profiles_otlp.flatten_profiles_from_otlp(nested).collect()
    }
    assert back[3]["link_id"] == 2 and back[3]["attr_sig"] == "1,4"
    assert back[5]["link_id"] == 0 and back[5]["attr_sig"] == ""
    assert back[3]["value"] == 100 and back[5]["value"] == 200


def test_profiles_dictionary_document_shape_and_reserved_rows(spark):
    """The dictionary document (generated_profilesdictionary.go:52-85):
    slot 0 of every table is the reserved zero entry
    (dictionary_helpers.go); stringTable[0] is ''; all cross-table refs
    resolve — every functionIndex/locationIndex/strindex lands inside
    its table."""
    import json

    from opentelemetry_collector_spark.functions import profiles, profiles_otlp

    t = profiles.read_profile_tables(spark)
    nested = profiles_otlp.nest_dictionary_to_otlp(
        t["functions"], t["locations"], t["stacks"],
        t["links"], t["attributes"], t["mappings"],
    )
    d = json.loads(nested.first()["otlp_json"])
    n_fn = t["functions"].count()
    assert len(d["functionTable"]) == n_fn + 1  # reserved slot 0
    assert d["functionTable"][0] == {}
    assert d["locationTable"][0] == {} and d["stackTable"][0] == {}
    assert d["stringTable"][0] == ""
    assert d["stringTable"][1:5] == ["samples", "count", "cpu", "nanoseconds"]
    # linkTable/attributeTable/mappingTable carry the fixture's own
    # reserved rows (no extra slot prepended)
    assert len(d["linkTable"]) == t["links"].count()
    assert "traceId" not in d["linkTable"][0]
    assert len(d["mappingTable"]) == t["mappings"].count()
    # every ref resolves
    n_str = len(d["stringTable"])
    for fn in d["functionTable"][1:]:
        assert 0 < fn["nameStrindex"] < n_str
        assert 0 < fn["filenameStrindex"] < n_str
    n_loc = len(d["locationTable"])
    for st in d["stackTable"][1:]:
        for li in st["locationIndices"]:
            assert 0 < li < n_loc
    for loc in d["locationTable"][1:]:
        assert 0 < loc["lines"][0]["functionIndex"] <= n_fn
        assert loc.get("mappingIndex", 0) < len(d["mappingTable"])
    # strings referenced from the attribute table resolve too
    for a in d["attributeTable"][1:]:
        assert 0 < a["keyStrindex"] < n_str


def test_profiles_dictionary_loud_bound(spark, monkeypatch):
    """A dictionary table past DICT_MAX_ROWS must fail the job loud
    (silent truncation corrupts every index in the payload)."""
    import pytest

    from opentelemetry_collector_spark.functions import profiles, profiles_otlp

    t = profiles.read_profile_tables(spark)
    monkeypatch.setattr(profiles_otlp, "DICT_MAX_ROWS", 3)
    nested = profiles_otlp.nest_dictionary_to_otlp(
        t["functions"], t["locations"], t["stacks"],
        t["links"], t["attributes"], t["mappings"],
    )
    with pytest.raises(Exception, match="exceeds"):
        nested.collect()


def test_mapping_rollup_reserved_row_aggregates_unknown_frames(spark):
    """mapping_rollup keeps the reserved unknown-mapping row (id 0) as
    the symbolization-coverage bucket, and total_ns counts a mapping
    once per sample even when several frames share it."""
    from opentelemetry_collector_spark.functions import profiles

    t = profiles.read_profile_tables(spark)
    out = profiles.mapping_rollup(
        t["samples"], t["stacks"], t["locations"], t["mappings"]
    ).collect()
    by_id = {r["mapping_id"]: r for r in out}
    assert 0 in by_id and by_id[0]["filename"] is None
    assert by_id[0]["n_samples"] > 0
    total_value = t["samples"].groupBy().sum("value").first()[0]
    for r in out:
        assert r["self_ns"] <= r["total_ns"] <= total_value
