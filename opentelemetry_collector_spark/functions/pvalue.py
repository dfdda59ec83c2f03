"""Typed attribute values: the pcommon.Value dynamic union, Spark-first.

The reference's pcommon.Value is a 7-typed tagged union
(pdata/pcommon/value.go:18-29: Empty/Str/Int/Double/Bool/Map/Slice/
Bytes) with typed accessors that return ZERO VALUES on type mismatch
(value.go:200-277: Str() → "", Int() → 0, Double() → 0.0, Bool() →
false) and AsRaw/FromRaw round-trips. Here the union is a Catalyst
struct column — no UDFs:

    struct<t:string, s:string, i:long, d:double, b:boolean, j:string>

``t`` is the type tag ('str','int','double','bool','slice','map',
'bytes','empty'); exactly one payload field is non-null; ``j`` holds
the JSON encoding for the composite kinds (slice/map) and base64 for
bytes. An attributes map is MapType(string, VALUE) and every map op is
the same map_filter/map_concat algebra as the string-map surface
(operators/transform.py), so Put* keeps the reference's
replace-any-existing-type upsert semantics (pdata/pcommon/map.go:
107-160).

AsRaw → JSON is the tagged-union encoding via to_json (lossless round
trip with from_json); AsString mirrors value.go:388 display
stringification.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

VALUE_DDL = "struct<t:string, s:string, i:long, d:double, b:boolean, j:string>"
ATTRS_DDL = f"map<string, {VALUE_DDL}>"

_FIELDS = ("s", "i", "d", "b", "j")
_FIELD_TYPE = {"s": "string", "i": "long", "d": "double", "b": "boolean", "j": "string"}


def _mk(tag: str, **payload: Column) -> Column:
    cols = [F.lit(tag).alias("t")]
    for f in _FIELDS:
        c = payload.get(f)
        cols.append(
            (c if c is not None else F.lit(None)).cast(_FIELD_TYPE[f]).alias(f)
        )
    return F.struct(*cols)


def v_str(c: Column) -> Column:
    return _mk("str", s=c)


def v_int(c: Column) -> Column:
    return _mk("int", i=c)


def v_double(c: Column) -> Column:
    return _mk("double", d=c)


def v_bool(c: Column) -> Column:
    return _mk("bool", b=c)


def v_slice(json_array: Column) -> Column:
    """Slice value; payload is its JSON encoding (e.g. to_json(array))."""
    return _mk("slice", j=json_array)


def v_map(json_object: Column) -> Column:
    """Nested-map value; payload is its JSON encoding."""
    return _mk("map", j=json_object)


def v_bytes(binary: Column) -> Column:
    """Bytes value; payload is base64 (the OTLP/JSON bytes encoding)."""
    return _mk("bytes", j=F.base64(binary))


def v_empty() -> Column:
    return _mk("empty")


def typed_attrs(**entries: Column) -> Column:
    """Build a typed attributes map from key → value-struct columns."""
    pairs: list[Column] = []
    for k, v in entries.items():
        pairs.extend([F.lit(k), v])
    return F.create_map(*pairs)


# --------------------------------------------------------------- map ops

def put(attrs: Column, key: str, value: Column) -> Column:
    """PutStr/PutInt/PutDouble/… — upsert replacing ANY existing type
    under the key (map.go:107-160)."""
    new = F.create_map(F.lit(key), value)
    return F.map_concat(F.map_filter(attrs, lambda k, v: k != key), new)


def remove(attrs: Column, key: str) -> Column:
    return F.map_filter(attrs, lambda k, v: k != key)


# ---------------------------------------------------------- typed getters
# Each mirrors the reference accessor contract: absent key OR wrong type
# tag → the Go zero value (value.go:200-277), never NULL and never error.

def _entry(attrs: Column, key: str) -> Column:
    return F.element_at(attrs, key)


def get_type(attrs: Column, key: str) -> Column:
    """Value.Type(); 'empty' when the key is absent."""
    v = _entry(attrs, key)
    return F.coalesce(v["t"], F.lit("empty"))


def get_str(attrs: Column, key: str) -> Column:
    # coalesce like the sibling getters: a str-tagged entry whose
    # payload is NULL still returns the zero value, never NULL
    v = _entry(attrs, key)
    return F.coalesce(F.when(v["t"] == "str", v["s"]), F.lit(""))


def get_int(attrs: Column, key: str) -> Column:
    v = _entry(attrs, key)
    return F.coalesce(
        F.when(v["t"] == "int", v["i"]), F.lit(0).cast("long")
    )


def get_double(attrs: Column, key: str) -> Column:
    v = _entry(attrs, key)
    return F.coalesce(
        F.when(v["t"] == "double", v["d"]), F.lit(0.0)
    )


def get_bool(attrs: Column, key: str) -> Column:
    v = _entry(attrs, key)
    return F.coalesce(F.when(v["t"] == "bool", v["b"]), F.lit(False))


# ------------------------------------------------------------- encodings

def as_string(v: Column) -> Column:
    """Value.AsString (value.go:388): scalars formatted, composites as
    their JSON, bytes as base64, empty → ''."""
    return (
        F.when(v["t"] == "str", v["s"])
        .when(v["t"] == "int", v["i"].cast("string"))
        .when(v["t"] == "double", v["d"].cast("string"))
        .when(v["t"] == "bool", v["b"].cast("string"))
        .when(v["t"].isin("slice", "map", "bytes"), v["j"])
        .otherwise(F.lit(""))
    )


def as_raw_json(attrs: Column) -> Column:
    """Map.AsRaw as JSON — the tagged-union encoding (lossless:
    from_raw_json(as_raw_json(m)) == m)."""
    return F.to_json(attrs)


def from_raw_json(j: Column) -> Column:
    return F.from_json(j, ATTRS_DDL)
