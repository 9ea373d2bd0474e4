"""Dtype-strict oracle comparator pins (round-7 verdict item 2).

The driver hashes raw values, so a value-equal result with a mismatched
physical type (DuckDB HUGEINT -> float64 vs Spark long) still hash-FAILs.
``tools/check_oracle.compare`` must catch that class locally instead of
passing via ``900 == 900.0``.
"""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "tools")

from check_oracle import compare  # noqa: E402


def test_hugeint_vs_int64_fails_strict():
    """A DuckDB windowed SUM(BIGINT) is HUGEINT -> float64 in pandas; a
    value-equal Spark long column must be flagged, not passed."""
    con = duckdb.connect()
    oracle = con.execute(
        "SELECT k, SUM(v) OVER (ORDER BY k) AS cum"
        " FROM (VALUES (1, 100), (2, 200), (3, 300)) t(k, v)"
    ).df()
    assert oracle["cum"].dtype.kind == "f", "fixture must reproduce HUGEINT->float64"
    spark_side = pd.DataFrame(
        {"k": [1, 2, 3], "cum": pd.array([100, 300, 600], dtype="int64")}
    )
    diff = compare(spark_side, oracle)
    assert diff is not None and "dtype family" in diff


def test_cast_bigint_oracle_passes_strict():
    """The fix pattern — CAST(SUM(...) AS BIGINT) — restores dtype parity."""
    con = duckdb.connect()
    oracle = con.execute(
        "SELECT k, CAST(SUM(v) OVER (ORDER BY k) AS BIGINT) AS cum"
        " FROM (VALUES (1, 100), (2, 200), (3, 300)) t(k, v)"
    ).df()
    spark_side = pd.DataFrame(
        {"k": [1, 2, 3], "cum": pd.array([100, 300, 600], dtype="int64")}
    )
    assert compare(spark_side, oracle) is None


def test_decimal_object_vs_float_allowed():
    """Spark DECIMAL crosses as Decimal objects; DuckDB DECIMAL as float64.
    The driver stringifies both identically, so strict mode allows the pair."""
    from decimal import Decimal

    spark_side = pd.DataFrame({"k": [1, 2], "x": [Decimal("1.5"), Decimal("2.5")]})
    oracle = pd.DataFrame({"k": [1, 2], "x": [1.5, 2.5]})
    assert compare(spark_side, oracle) is None


def test_value_mismatch_still_caught():
    spark_side = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
    oracle = pd.DataFrame({"k": [1, 2], "v": [10, 21]})
    assert compare(spark_side, oracle) is not None


@pytest.mark.parametrize("a,b", [(True, 1)])
def test_bool_vs_int_fails_strict(a, b):
    spark_side = pd.DataFrame({"f": pd.array([a], dtype="bool")})
    oracle = pd.DataFrame({"f": pd.array([b], dtype="int64")})
    diff = compare(spark_side, oracle)
    assert diff is not None and "dtype family" in diff
