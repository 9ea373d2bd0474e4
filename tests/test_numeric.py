"""Cross-engine pin for functions/numeric.ieee_round6.

The class this guards (found by the first full sf0.1 oracle sweep):
``ROUND(double, 6)`` of a mean/ratio disagrees between Spark (BigDecimal
HALF_UP over the exact binary expansion) and DuckDB (float-path round)
when the quotient sits within an ulp of a 6-dp boundary. ieee_round6
rebuilds the round from IEEE-exact primitives so both engines compute
bit-identical outputs from bit-identical inputs — verified here against
DuckDB running the documented SQL form over the SAME adversarial
quotients, including exact .5-at-the-7th-digit ties and the negative
log-prob range.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from matchbox_spark.functions.numeric import IEEE_ROUND6_SQL, ieee_round6

# numerator/denominator pairs whose double quotient stresses the recipe:
# exact 6-dp grid points, exact .5 ties (positive and negative), values an
# ulp off a boundary, and the magnitudes the repo actually rounds
# (centroids ~1e-3, log-probs ~-10..0, token means ~1e2).
_CASES = [
    (3213, 1_000_000),        # on the grid
    (6427, 2_000_000),        # exact tie: 0.0032135
    (-6427, 2_000_000),       # negative tie
    (-68985013, 20_000_000),  # -3.44925065 (t14-like)
    (-6898501, 2_000_000),    # -3.4492505 tie
    (1, 3),                   # repeating binary fraction
    (2, 3),
    (-1, 3),
    (102305, 997),            # token-mean magnitude
    (999999999999, 7_000_000),  # near the documented 4.5e9 envelope / 30
    (0, 5),
    (-1, 10_000_000),         # rounds to -0.0 vs 0.0 territory
]


def test_ieee_round6_matches_duckdb_bitwise(spark):
    pdf = pd.DataFrame(
        {"i": range(len(_CASES)),
         "num": [float(n) for n, _ in _CASES],
         "den": [float(d) for _, d in _CASES]}
    )
    got = (
        spark.createDataFrame(pdf)
        .select("i", ieee_round6(F.col("num") / F.col("den")).alias("r"))
        .toPandas()
        .sort_values("i")["r"]
        .tolist()
    )
    con = duckdb.connect()
    con.register("t", pdf)
    expr = IEEE_ROUND6_SQL.format(x="num / den")
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {expr} FROM t ORDER BY i"
        ).fetchall()
    ]
    # bit-level comparison (repr distinguishes -0.0 and every ulp)
    assert [v.hex() for v in got] == [v.hex() for v in want]


def test_ieee_round6_semantics(spark):
    """Half-up toward +inf at 6 dp; NULL propagates."""
    rows = (
        spark.createDataFrame(
            [(0.0032135,), (-3.4492505,), (None,)], "x double"
        )
        .select(ieee_round6(F.col("x")).alias("r"))
        .collect()
    )
    assert rows[0].r == pytest.approx(0.003214)
    assert rows[1].r == pytest.approx(-3.449250)  # toward +inf, not away-from-0
    assert rows[2].r is None
