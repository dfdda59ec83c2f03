"""Entity signal (experimental upstream): EntityRef + EntityMap over
resources.

Reference: pdata/xpdata/entity/generated_entityref.go:46-100 (EntityRef
= {SchemaUrl, Type, IdKeys, DescriptionKeys}), entity_map.go:12-130
(EntityMap: entities keyed by type, attribute views over the RESOURCE's
attribute map — an entity does not own attributes; its ref declares
which resource-attribute KEYS identify vs describe it).

Spark-first: entity refs are a literal array column (dozens at most —
expression-shaped is right here), the per-entity attribute views are
``map_filter`` projections of the resource attribute map, and the
explode is refs-per-resource (≤ a handful). An entity whose identifying
keys are not ALL present on the resource is not emitted — identity is
what makes an entity an entity (entity_map.go requires explicit ids on
Put; a key-matching read of an attr map can only honor that by
requiring completeness).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class EntityRef:
    """generated_entityref.go:46-100 field-for-field."""

    type: str
    schema_url: str = ""
    id_keys: tuple[str, ...] = field(default_factory=tuple)
    description_keys: tuple[str, ...] = field(default_factory=tuple)


def _refs_literal(refs: tuple[EntityRef, ...]) -> Column:
    for r in refs:
        if not r.id_keys:
            # size(∅)==size(()) would be vacuously complete, emitting an
            # identity-less entity for EVERY resource — reject up front
            raise ValueError(
                f"EntityRef {r.type!r} has no id_keys: an entity without "
                "identifying attributes is not an entity"
            )
    return F.array(
        *[
            F.struct(
                F.lit(r.type).alias("type"),
                F.lit(r.schema_url).alias("schemaUrl"),
                F.array(*[F.lit(k) for k in r.id_keys]).alias("idKeys"),
                F.array(*[F.lit(k) for k in r.description_keys]).alias(
                    "descriptionKeys"
                ),
            )
            for r in refs
        ]
    )


def entity_map(
    resources: DataFrame,
    refs: tuple[EntityRef, ...],
    attrs_col: str = "attributes",
) -> DataFrame:
    """One row per (resource, declared entity): the EntityMap read path
    (entity_map.go:69-105) — id/description attribute views are
    key-filtered projections of the resource attribute map. Rows whose
    resource lacks ANY identifying key are dropped (no identity → no
    entity); description keys are best-effort, mirroring the reference
    where description attributes are optional."""
    e = resources.withColumn("_ref", F.explode(_refs_literal(refs)))
    attrs = F.col(attrs_col)
    id_attrs = F.map_filter(
        attrs, lambda k, v: F.array_contains(F.col("_ref.idKeys"), k)
    )
    descr_attrs = F.map_filter(
        attrs, lambda k, v: F.array_contains(F.col("_ref.descriptionKeys"), k)
    )
    complete = F.size(id_attrs) == F.size("_ref.idKeys")
    return (
        e.filter(complete)
        .select(
            *[c for c in resources.columns if c != attrs_col],
            F.col("_ref.type").alias("entity_type"),
            F.col("_ref.schemaUrl").alias("entity_schema_url"),
            id_attrs.alias("id_attrs"),
            descr_attrs.alias("descr_attrs"),
        )
    )


# --------------------------------------------------------- write path (r6)


def _find_ref(refs: tuple[EntityRef, ...], entity_type: str) -> EntityRef:
    for r in refs:
        if r.type == entity_type:
            return r
    raise KeyError(f"no EntityRef of type {entity_type!r} declared")


def can_put(
    refs: tuple[EntityRef, ...],
    entity_type: str,
    key: str,
    attrs_col: str = "attributes",
) -> Column:
    """entity_attribute_map.go:44-51 CanPut as a column predicate:
    TRUE iff the key is already owned by this entity (in its id or
    description key list — a compile-time fact here, refs are literal
    config) OR the key is absent from the shared resource attribute
    map (free to claim). FALSE means the key exists in the shared map
    and belongs to another entity."""
    ref = _find_ref(refs, entity_type)
    if key in ref.id_keys or key in ref.description_keys:
        return F.lit(True)
    return ~F.map_contains_key(F.col(attrs_col), F.lit(key))


def put_entity_attribute(
    resources: DataFrame,
    refs: tuple[EntityRef, ...],
    entity_type: str,
    key: str,
    value: Column,
    kind: str = "description",
    attrs_col: str = "attributes",
    safe: bool = False,
) -> tuple[DataFrame, tuple[EntityRef, ...]]:
    """EntityAttributeMap.PutStr write-through
    (entity_attribute_map.go:67-81): insert-or-update the key in the
    SHARED resource attribute map and claim it into the entity's key
    list. The reference's Put is DESTRUCTIVE across entities (its own
    WARNING); ``safe=True`` applies the documented CanPut-guarded idiom
    instead — rows where the key belongs to another entity keep their
    original value (the key-list claim is still global, so on those
    rows the entity view surfaces the pre-existing shared value —
    identical to the reference's Get after an Append without a write).
    Returns (resources', refs'): the attribute column
    rewritten per row, and the matching ref's id/description key list
    extended (refs are config-shaped literals, so the key-list append
    is a driver-side dataclass update, exactly as cheap as it is in the
    reference's StringSlice.Append)."""
    ref = _find_ref(refs, entity_type)
    if kind not in ("id", "description"):
        raise ValueError(f"kind must be 'id' or 'description', got {kind!r}")
    # CanPut must be judged against the PRE-claim key list: after the
    # claim below the key is owned and the guard would be vacuously true
    guard = can_put(refs, entity_type, key, attrs_col)
    keys = ref.id_keys if kind == "id" else ref.description_keys
    if key not in keys:
        new_ref = EntityRef(
            ref.type,
            ref.schema_url,
            ref.id_keys + (key,) if kind == "id" else ref.id_keys,
            ref.description_keys + (key,)
            if kind == "description"
            else ref.description_keys,
        )
        refs = tuple(new_ref if r.type == entity_type else r for r in refs)
    # a NULL attribute map must behave like the reference's empty map
    # (PutStr inserts), not poison map_filter/map_concat into a silent
    # no-op while the key list already claimed the key
    map_type = resources.schema[attrs_col].dataType.simpleString()
    attrs = F.coalesce(F.col(attrs_col), F.create_map().cast(map_type))
    updated = F.map_concat(
        F.map_filter(attrs, lambda k, _v: k != F.lit(key)),
        F.create_map(F.lit(key), value),
    )
    if safe:
        updated = F.when(guard, updated).otherwise(attrs)
    return resources.withColumn(attrs_col, updated), refs


def remove_entity_attribute(
    resources: DataFrame,
    refs: tuple[EntityRef, ...],
    entity_type: str,
    key: str,
    attrs_col: str = "attributes",
) -> tuple[DataFrame, tuple[EntityRef, ...]]:
    """EntityAttributeMap.Remove (entity_attribute_map.go:83-99): a key
    NOT in the entity's key list is a no-op (the reference returns
    false without touching the shared map — removing another entity's
    attribute through this view is impossible, unlike Put); otherwise
    the key leaves both the shared map and the key list."""
    ref = _find_ref(refs, entity_type)
    if key not in ref.id_keys and key not in ref.description_keys:
        return resources, refs
    new_ref = EntityRef(
        ref.type,
        ref.schema_url,
        tuple(k for k in ref.id_keys if k != key),
        tuple(k for k in ref.description_keys if k != key),
    )
    refs = tuple(new_ref if r.type == entity_type else r for r in refs)
    pruned = F.map_filter(F.col(attrs_col), lambda k, _v: k != F.lit(key))
    return resources.withColumn(attrs_col, pruned), refs
