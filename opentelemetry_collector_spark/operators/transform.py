"""Attribute-map transforms: the pcommon.Map / attributes-processor surface.

The reference manipulates per-record attribute maps imperatively
(pdata/pcommon/map.go:65-319: Get/PutStr/PutInt/Remove/RemoveIf/
AsRaw/FromRaw; value stringification pdata/pcommon/value.go:388).
Spark-first, attributes are a MapType(string,string) column and every
operation is a Catalyst map expression — no UDFs:

    PutStr/PutInt      → map_concat (last-wins via map_zip_with)
    Remove             → map_filter on key
    RemoveIf           → map_filter on (k,v) predicate
    rename             → transform_keys
    AsRaw / FromRaw    → to_json / from_json
    Value.AsString     → cast / element access

``attrs_from_parsed`` bridges the fixed post-parse struct into the
dynamic map (the intentional divergence documented in SURVEY.md §7:
we keep a typed struct in the hot path and only materialize the map
where map semantics are required).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attrs_from_parsed(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Build an attributes map column from parsed columns (null-safe:
    null attrs are omitted, matching pcommon.Map absence semantics)."""
    cols = cols or ["level", "svc", "latency_ms", "req_id", "msg"]
    entries = []
    for c in cols:
        entries.append(
            F.when(
                F.col(c).isNotNull(),
                F.create_map(F.lit(c), F.col(c).cast("string")),
            ).otherwise(F.create_map().cast("map<string,string>"))
        )
    out = entries[0]
    for e in entries[1:]:
        out = F.map_concat(out, e)
    return df.withColumn("attrs", out)


def put(attrs: Column, key: str, value: Column) -> Column:
    """PutStr/PutInt/... — upsert semantics (existing key overwritten,
    mirroring pcommon.Map.PutStr map.go:107-115).

    remove-then-concat, NOT map_zip_with: zip merges key sets, which
    (a) keeps a stale value when the new one is NULL (coalesce) and
    (b) injects phantom key→NULL entries. A NULL value here yields an
    explicit key→NULL entry (SQL semantics; Go strings cannot be nil,
    so this case has no reference analog — documented divergence)."""
    new = F.create_map(F.lit(key), value.cast("string"))
    return F.map_concat(F.map_filter(attrs, lambda k, v: k != key), new)


def remove(attrs: Column, key: str) -> Column:
    return F.map_filter(attrs, lambda k, v: k != key)


def remove_if(attrs: Column, predicate) -> Column:
    """RemoveIf(f) — keep entries where predicate(k, v) is False."""
    return F.map_filter(attrs, lambda k, v: ~predicate(k, v))


def rename_key(attrs: Column, old: str, new: str) -> Column:
    return F.transform_keys(
        attrs, lambda k, v: F.when(k == old, F.lit(new)).otherwise(k)
    )


def get(attrs: Column, key: str) -> Column:
    """Map.Get — null when absent (Go returns ok=false)."""
    return F.element_at(attrs, key)


def hash_attr(attrs: Column, key: str) -> Column:
    """Attributes-processor 'hash' action: replace a value with its
    sha256 (PII scrubbing). transform_values touches only EXISTING
    entries — an absent key stays absent (pcommon semantics; a
    map_zip_with approach would inject a phantom key→NULL entry)."""
    return F.transform_values(
        attrs,
        lambda k, v: F.when(k == key, F.sha2(v, 256)).otherwise(v),
    )


def as_raw_json(attrs: Column) -> Column:
    """Map.AsRaw → JSON (pcommon map.go:289-300 + plog json.go)."""
    return F.to_json(attrs)


def from_raw_json(j: Column) -> Column:
    return F.from_json(j, "map<string,string>")
