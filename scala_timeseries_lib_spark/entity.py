"""Typed series identity: the reference's entity catalog
(entity/TsLabel.scala:8-12, TsId.scala:10, TimeSeriesEntityId.scala:13-26,
LabelUnitMapper.scala:11-18) re-expressed for a DataFrame engine.

In the reference a series is identified by ``TsId(entityId, label)`` and
units derive from labels through an implicit ``LabelUnitMapper``. Here the
same identity lives in the KEY COLUMNS of an entries table (SURVEY §1.3:
``series_key = (entity cols..., label)``); these classes give pipelines the
typed driver-side vocabulary, and :func:`with_units` applies a unit mapper
relationally (a literal map expression -- no join, no Python in the scan).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["TsLabel", "TsId", "LabelUnitMapper", "StaticUnitMapper",
           "SuffixUnitMapper", "with_units"]


@dataclass(frozen=True)
class TsLabel:
    """Names a signal kind ("power", "temperature_c")."""

    value: str

    def unit(self, mapper: "LabelUnitMapper") -> str | None:
        return mapper.derive_unit(self)


@dataclass(frozen=True)
class TsId:
    """Fully identifies one series: an entity plus a signal label. The
    entity id may be any hashable value (the reference leaves the
    identifying mechanism to the implementor too)."""

    entity_id: object
    label: TsLabel

    def key(self) -> tuple:
        """The (entity, label) tuple as it appears in an entries table's
        key columns."""
        return (self.entity_id, self.label.value)


class LabelUnitMapper:
    """Label -> optional unit. Implementations may use a static mapping or
    derive the unit from the label itself (LabelUnitMapper.scala:11-18)."""

    def derive_unit(self, label: TsLabel) -> str | None:
        raise NotImplementedError


class StaticUnitMapper(LabelUnitMapper):
    def __init__(self, mapping: dict[str, str]):
        self.mapping = dict(mapping)

    def derive_unit(self, label: TsLabel) -> str | None:
        return self.mapping.get(label.value)


class SuffixUnitMapper(LabelUnitMapper):
    """Derives the unit from a trailing ``_<unit>`` suffix on the label
    ("temperature_c" -> "c"); None when there is no suffix."""

    def derive_unit(self, label: TsLabel) -> str | None:
        _, sep, unit = label.value.rpartition("_")
        return unit if sep and unit else None


def with_units(
    df: DataFrame, label_col: str, mapping: dict[str, str]
) -> DataFrame:
    """Attach a ``unit`` column derived from the label column via a literal
    map expression (null for unmapped labels). The mapping is a driver-side
    catalog (small by construction -- one row per signal KIND, not per
    series), so it ships inside the plan: no join, no shuffle, no Python."""
    if not mapping:
        return df.withColumn("unit", F.lit(None).cast("string"))
    pairs = [x for k, v in sorted(mapping.items()) for x in (F.lit(k), F.lit(v))]
    return df.withColumn(
        "unit", F.element_at(F.create_map(*pairs), F.col(label_col))
    )
