"""Plan diagnostics: cardinality estimates and plan-shape checks.

The reference logs DuckDB's max estimated cardinality before running linker
joins as a blow-up guard (deterministic.py:177-223). Spark's analogue is the
optimizer's cost statistics: ``explain("cost")`` carries per-node
``Statistics(sizeInBytes=…, rowCount=…)``. Parsing that string costs no job —
it's driver-side plan analysis only.
"""

from __future__ import annotations

import logging
import re

from pyspark.sql import DataFrame

logger = logging.getLogger(__name__)

_ROWCOUNT = re.compile(r"rowCount=(\d+)")
_SIZE = re.compile(r"sizeInBytes=([\d.]+)\s*([EPTGMK]i?B|B)\b")

_UNIT = {
    "B": 1.0,
    "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40,
    "PiB": 2**50, "EiB": 2**60,
    "KB": 1e3, "MB": 1e6, "GB": 1e9, "TB": 1e12, "PB": 1e15, "EB": 1e18,
}


def _cost_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "cost"
    )


def estimated_max_rows(df: DataFrame) -> int:
    """Max optimizer row-count estimate across the plan (-1 if none)."""
    try:
        plan = _cost_plan(df)
    except Exception:  # noqa: BLE001  # pragma: no cover
        return -1
    counts = [int(m) for m in _ROWCOUNT.findall(plan)]
    return max(counts) if counts else -1


def estimated_max_bytes(df: DataFrame) -> float:
    """Max optimizer size estimate in bytes across the plan (-1 if none)."""
    try:
        plan = _cost_plan(df)
    except Exception:  # noqa: BLE001  # pragma: no cover
        return -1.0
    sizes = [float(v) * _UNIT.get(u, 1.0) for v, u in _SIZE.findall(plan)]
    return max(sizes) if sizes else -1.0


def warn_on_blowup(
    df: DataFrame,
    label: str,
    warn_rows: int = 100_000_000,
    warn_bytes: float = 1e12,
) -> DataFrame:
    """Log the reference-style blow-up warning when estimates look explosive.

    Pure plan analysis — never triggers a job. Returns ``df`` unchanged so it
    chains inline.
    """
    rows = estimated_max_rows(df)
    size = estimated_max_bytes(df)
    logger.info(
        "%s: estimated max cardinality %s rows / %s bytes",
        label,
        rows if rows >= 0 else "unknown",
        f"{size:.3g}" if size >= 0 else "unknown",
    )
    if rows > warn_rows or size > warn_bytes:
        logger.warning(
            "%s: plan estimates suggest a join blow-up (%d rows, %.3g bytes) — "
            "check comparison selectivity or add blocking",
            label,
            rows,
            size,
        )
    return df
