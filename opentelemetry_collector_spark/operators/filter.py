"""Filter primitives: the reference's filterset as Catalyst predicates.

filter.CreateFilter (filter/config.go:12-74, filter/filter.go:7-11)
builds an OR-set of predicates over strings with two match types:
- strict: hash-set equality            → Column.isin(...)
- regexp: regular-expression match     → Column.rlike(...)

Both compile to native Catalyst expressions (pushdown-eligible for
strict equality), never Python. ``FilterSet.matches`` returns the OR of
all predicates; include/exclude wrappers mirror how processors in the
collector family consume a filterset.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FilterSet:
    """OR-set of strict and regexp string predicates over one column.

    An empty filterset is a config error (the reference rejects it at
    validation, filter/config.go) — accepting it would make an include
    filter silently drop every row.
    """

    column: str
    strict: tuple[str, ...] = field(default_factory=tuple)
    regexp: tuple[str, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        if not self.strict and not self.regexp:
            raise ValueError(
                f"empty filterset for column {self.column!r}: "
                "at least one strict or regexp predicate required"
            )

    def matches(self) -> Column:
        c = F.col(self.column)
        preds: list[Column] = []
        if self.strict:
            preds.append(c.isin(list(self.strict)))
        for pat in self.regexp:
            preds.append(c.rlike(pat))
        out = preds[0]
        for p in preds[1:]:
            out = out | p
        # NULL column values: three-valued logic would turn ~NULL into
        # NULL and silently drop the row on exclude; the collector's
        # contract is match-or-not, never drop-on-unknown
        return F.coalesce(out, F.lit(False))


def include(df: DataFrame, fs: FilterSet) -> DataFrame:
    return df.filter(fs.matches())


def exclude(df: DataFrame, fs: FilterSet) -> DataFrame:
    return df.filter(~fs.matches())
