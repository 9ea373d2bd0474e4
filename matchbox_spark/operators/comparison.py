"""Comparison-condition validation (P3).

Join conditions are Spark SQL boolean expressions over aliases ``l`` and
``r``. Mirrors the reference's gate (comparison.py:10-55): predicates only,
explicit l./r. references, warn on OR (the linkers rewrite OR into unions of
single-condition joins — Catalyst will not split an OR theta-join itself, see
SURVEY §4).
"""

from __future__ import annotations

import logging
import re

logger = logging.getLogger(__name__)

_LR_REF = re.compile(r"(?i)\b[lr]\.")
_FORBIDDEN = re.compile(
    r"(?is)\b(select|insert|update|delete|union|join|from|where|group\s+by|order\s+by)\b"
)


def validate_comparison(condition: str) -> str:
    """Validate a comparison condition; returns it unchanged if acceptable."""
    cond = condition.strip()
    if not cond:
        raise ValueError("empty comparison condition")
    if ";" in cond:
        raise ValueError("comparison must be a single expression")
    if _FORBIDDEN.search(cond):
        raise ValueError(
            f"comparison must be a predicate, not a query fragment: {condition!r}"
        )
    if not _LR_REF.search(cond):
        raise ValueError(
            f"comparison must reference l.<field> and/or r.<field>: {condition!r}"
        )
    if re.search(r"(?i)\bor\b", cond):
        logger.warning(
            "OR in comparison %r can prevent efficient joins; consider passing "
            "multiple comparisons (they are OR-combined via a union of joins)",
            condition,
        )
    return cond


def is_equi_condition(condition: str) -> bool:
    """True if the condition is a conjunction of l.x = r.y equalities.

    Equi-conditions let Catalyst pick hash/sort-merge joins; anything else
    becomes a (broadcast) nested-loop theta join, which the linkers log about.
    """
    parts = re.split(r"(?i)\s+and\s+", condition.strip())
    pat = re.compile(
        r"(?is)^\(*\s*(l\.\w+|r\.\w+|[a-z_]+\((l|r)\.[^()]*\))\s*=\s*"
        r"(l\.\w+|r\.\w+|[a-z_]+\((l|r)\.[^()]*\))\s*\)*$"
    )
    return all(pat.match(p) for p in parts)
