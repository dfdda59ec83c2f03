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
