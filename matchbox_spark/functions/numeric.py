"""Cross-engine-exact numeric helpers.

The one that matters: ``ieee_round6``. Engines disagree on
``ROUND(double, 6)`` when the value sits within an ulp of a 6-dp
boundary — Spark rounds the EXACT binary expansion (Java
``BigDecimal(double).setScale(6, HALF_UP)``) while DuckDB rounds through
a float path (scale, nearbyint, unscale), so the same double can round
to different 6-dp neighbours (observed: a label-centroid mean of
0.0032135−ε rounding to 0.003213 vs 0.003214 at sf0.1). Rebuilding the
round from IEEE-exact primitives — multiply, add, floor, divide, each
individually correctly-rounded and deterministic in every IEEE-754
engine — makes both sides compute the bit-identical result from the
bit-identical input.

Semantics: round-half-up toward +inf at the 6th decimal
(``floor(x·10⁶ + 0.5)/10⁶``), not banker's rounding; NULL propagates.
Safe for |x| < 2⁵²/10⁶ ≈ 4.5e9 (beyond that x·10⁶ loses integer
resolution — far above any mean/ratio/log-prob this repo rounds).
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

#: DuckDB/ANSI-SQL body of the same recipe — interpolate the quotient
#: expression, e.g. ``IEEE_ROUND6_SQL.format(x="CAST(SUM(v) AS DOUBLE) /
#: COUNT(*)")``. Identical op order to :func:`ieee_round6` (left-assoc
#: multiply, add, floor, divide) so the double trajectories match.
IEEE_ROUND6_SQL = "FLOOR(({x}) * 1000000 + 0.5) / 1000000"


def IEEE_ROUND6_PY(x: float) -> float:
    """Python twin of :func:`ieee_round6` (identical op order on IEEE
    doubles) for values computed inside Arrow/Pandas stages — CPython
    float arithmetic is the same correctly-rounded IEEE-754, so the
    result matches the JVM/DuckDB expression bit for bit."""
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def ieee_round6(x: Column) -> Column:
    """``x`` (double) rounded half-up to 6 dp via IEEE-exact primitives.

    Use instead of ``F.round(x, 6)`` whenever the rounded value is an
    output column that a cross-engine hash compare will see AND ``x`` is
    a quotient/log whose exact value is off the 6-dp grid (means,
    ratios, log-probs). Plain ``F.round`` stays fine for values that are
    already exact 6-dp decimals (e.g. a double cast of a
    ``DECIMAL(·,6)`` sum, where rounding is an identity guard).
    """
    return F.floor(x * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
