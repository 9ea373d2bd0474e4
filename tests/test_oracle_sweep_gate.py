"""The oracle-sweep gate must actually gate (round 8).

``tools/stress_oracle_sweep.py`` wires the full-registry dtype-strict
sweep into ``stress_all`` so a round cannot close without it. These tests
plant failures and prove the sweep machinery reports them: a value-equal
but dtype-mismatched oracle (the HUGEINT/o10 class) must fail strict
compare AND fail ``check_oracle.main`` end to end.
"""

from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

import pandas as pd
from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent


def _check_oracle():
    spec = importlib.util.spec_from_file_location(
        "check_oracle", REPO / "tools/check_oracle.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_planted_dtype_mismatch_fails_compare():
    co = _check_oracle()
    a = pd.DataFrame({"v": pd.array([1, 2, 3], dtype="int64")})
    b = pd.DataFrame({"v": pd.array([1.0, 2.0, 3.0], dtype="float64")})
    diff = co.compare(a, b)
    assert diff is not None and "dtype family" in diff
    # and the green control: matching families pass
    assert co.compare(a, a.copy()) is None


def test_planted_mismatch_fails_main_end_to_end(spark, monkeypatch):
    """check_oracle.main with a stub registry: the dtype-planted query must
    fail, the clean one must pass, exit code must be 1."""
    co = _check_oracle()

    stub = types.ModuleType("__spark_entry__")
    stub.queries = lambda: {
        "planted": lambda sp, sf: sp.range(3).select(
            F.col("id").cast("long").alias("v")
        ),
        "clean": lambda sp, sf: sp.range(3).select(
            F.col("id").cast("long").alias("v")
        ),
    }
    stub.oracle_sql = lambda: {
        # value-equal, physically DOUBLE — the o10/HUGEINT red class
        "planted": "SELECT CAST(range AS DOUBLE) AS v FROM range(3)",
        "clean": "SELECT CAST(range AS BIGINT) AS v FROM range(3)",
    }
    monkeypatch.setitem(sys.modules, "__spark_entry__", stub)
    monkeypatch.setattr(sys, "argv", ["check_oracle.py", "/root/testdata/sf0.001"])
    rc = co.main()
    assert rc == 1


def test_sweep_harness_is_registered():
    """stress_all must carry the sweep in BOTH tiers (sf0.01 quick, both
    SFs full) — the cannot-be-skipped property is the whole point."""
    spec = importlib.util.spec_from_file_location(
        "stress_all", REPO / "tools/stress_all.py"
    )
    sa = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sa)
    quick, full = sa.HARNESSES["oracle_sweep"]
    assert quick == ["/root/testdata/sf0.01"]
    assert full == ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    assert sa.TIMEOUTS["oracle_sweep"] >= 3600
