"""Catalyst-visible scalar functions mirroring the reference's ETL ops
(SURVEY.md §2A)."""

from .core import (
    UNIT_MAP,
    coerce_typed,
    normalize_key,
    normalize_unit,
    parse_crucible,
    parse_date_cascade,
    parse_date_fuzzy,
    parse_epoch_seconds,
    parse_mfc,
    parse_segment,
    parse_value,
    parse_value_unit,
    parse_unit,
)

__all__ = [
    "UNIT_MAP",
    "coerce_typed",
    "normalize_key",
    "normalize_unit",
    "parse_crucible",
    "parse_date_cascade",
    "parse_date_fuzzy",
    "parse_epoch_seconds",
    "parse_mfc",
    "parse_segment",
    "parse_value",
    "parse_value_unit",
    "parse_unit",
]
