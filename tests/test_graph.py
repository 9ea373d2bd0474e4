"""k-core peeling (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.graph import k_core


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_k_core_path_dissolves(spark):
    # a pure path has no 2-core; peel depth ceil(n/2)
    e = _edges(spark, [(i, i + 1) for i in range(8)])
    assert k_core(e, k=2, rounds=5).count() == 0


def test_k_core_triangle_with_tail(spark):
    # triangle survives, tail peels; degrees are in-core degrees
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    out = {r["node"]: r["degree"] for r in k_core(e, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_extra_rounds_idempotent(spark):
    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)])
    a = sorted(map(tuple, k_core(e, k=2, rounds=3).collect()))
    b = sorted(map(tuple, k_core(e, k=2, rounds=6).collect()))
    assert a == b


def test_k_core_k3(spark):
    # K4 minus one edge has no 3-core; full K4 does
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert sorted(
        r["node"] for r in k_core(_edges(spark, k4), k=3, rounds=3).collect()
    ) == [1, 2, 3, 4]
    assert k_core(_edges(spark, k4[:-1]), k=3, rounds=4).count() == 0


def test_k_core_validation(spark):
    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        k_core(e, k=0)
    with pytest.raises(ValueError):
        k_core(e, rounds=0)


@pytest.mark.parametrize("sf", ["sf0.01", "sf0.1"])
def test_k_core_converged(spark, sf):
    """The g8 entry's fixed 6 rounds reach the fixpoint on the bounded-
    depth supplier graph (peel depth ≤ 5 by construction): round 7 output
    is identical — the fixed-round plan IS the true k-core. Checked at the
    driver-gate SF (0.01) and the bench SF (0.1)."""
    from pyspark.sql import Window

    s = spark.read.parquet(f"/root/testdata/{sf}/supplier.parquet")
    w = Window.partitionBy("s_nationkey").orderBy("s_suppkey")
    ranked = s.select(
        F.col("s_nationkey").alias("nk"),
        F.col("s_suppkey").alias("id"),
        F.row_number().over(w).alias("rn"),
    )
    l, r = ranked.alias("l"), ranked.alias("r")
    edges = l.join(
        r,
        (F.col("l.nk") == F.col("r.nk"))
        & (
            ((F.col("r.rn") == F.col("l.rn") + 1) & (F.col("l.rn") % 10 != 0))
            | (
                (F.col("r.rn") == F.col("l.rn") + 2)
                & (F.col("l.rn") % 10).isin(1, 2, 3)
            )
        ),
    ).select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
    six = sorted(map(tuple, k_core(edges, k=2, rounds=6).collect()))
    seven = sorted(map(tuple, k_core(edges, k=2, rounds=7).collect()))
    assert six == seven and len(six) > 0
