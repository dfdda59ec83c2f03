"""pcommon.Value typed-union semantics
(pdata/pcommon/value.go:200-277, map.go:65-319 analog)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions import pvalue as V


@pytest.fixture(scope="module")
def row(spark):
    def build(attrs_col, *extra):
        return (
            spark.range(1)
            .select(attrs_col.alias("attrs"), *extra)
            .collect()[0]
        )

    return build


def _attrs():
    return V.typed_attrs(
        name=V.v_str(F.lit("svc-a")),
        n=V.v_int(F.lit(42)),
        ratio=V.v_double(F.lit(2.5)),
        flag=V.v_bool(F.lit(True)),
        tags=V.v_slice(F.to_json(F.array(F.lit("a"), F.lit("b")))),
        blob=V.v_bytes(F.lit(b"\x00\x01")),
    )


def test_typed_getters_happy_path(row):
    a = _attrs()
    r = row(
        a,
        V.get_str(a, "name").alias("s"),
        V.get_int(a, "n").alias("i"),
        V.get_double(a, "ratio").alias("d"),
        V.get_bool(a, "flag").alias("b"),
        V.get_type(a, "tags").alias("t"),
    )
    assert (r["s"], r["i"], r["d"], r["b"], r["t"]) == ("svc-a", 42, 2.5, True, "slice")


def test_zero_values_on_mismatch_and_absence(row):
    """Str() on an Int → ''; Int() on a Str → 0; absent key → zero value
    and Type() == empty (value.go:200-277)."""
    a = _attrs()
    r = row(
        a,
        V.get_str(a, "n").alias("s_mis"),
        V.get_int(a, "name").alias("i_mis"),
        V.get_double(a, "flag").alias("d_mis"),
        V.get_bool(a, "ratio").alias("b_mis"),
        V.get_int(a, "absent").alias("i_abs"),
        V.get_type(a, "absent").alias("t_abs"),
    )
    assert (r["s_mis"], r["i_mis"], r["d_mis"], r["b_mis"]) == ("", 0, 0.0, False)
    assert r["i_abs"] == 0 and r["t_abs"] == "empty"


def test_put_replaces_any_type(row):
    """PutInt over an existing Str entry replaces value AND type
    (map.go:107-160 upsert)."""
    a = V.put(_attrs(), "name", V.v_int(F.lit(9)))
    r = row(
        a,
        V.get_int(a, "name").alias("i"),
        V.get_str(a, "name").alias("s"),
        F.size(a).alias("n"),
    )
    assert r["i"] == 9 and r["s"] == "" and r["n"] == 6  # no duplicate key


def test_remove_and_as_string(row):
    a = V.remove(_attrs(), "blob")
    r = row(
        a,
        F.size(a).alias("n"),
        V.as_string(F.element_at(a, "n")).alias("s_int"),
        V.as_string(F.element_at(a, "flag")).alias("s_bool"),
        V.as_string(F.element_at(a, "tags")).alias("s_slice"),
    )
    assert r["n"] == 5
    assert r["s_int"] == "42"
    assert r["s_bool"] == "true"
    assert r["s_slice"] == '["a","b"]'


def test_raw_json_round_trip(row):
    """AsRaw → FromRaw is lossless for every type tag."""
    a = _attrs()
    back = V.from_raw_json(V.as_raw_json(a))
    r = row(
        a,
        V.as_raw_json(back).alias("j2"),
        V.as_raw_json(a).alias("j1"),
        V.get_int(back, "n").alias("i"),
        V.get_type(back, "blob").alias("bt"),
    )
    assert r["j1"] == r["j2"]
    assert r["i"] == 42 and r["bt"] == "bytes"


def test_get_str_null_payload_zero_value(row):
    """A str-tagged entry with a NULL payload returns '' (the zero
    value), consistent with the int/double/bool getters."""
    a = V.typed_attrs(s=V.v_str(F.lit(None)), i=V.v_int(F.lit(None)))
    r = row(a, V.get_str(a, "s").alias("s"), V.get_int(a, "i").alias("i"))
    assert r["s"] == "" and r["i"] == 0
