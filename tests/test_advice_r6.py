"""Regression tests for the round-5 advisory findings (ADVICE.md, r6).

Each test pins one reported defect:

1. search.rrf_fuse: top_n selection is an explicit orderBy-then-limit, so
   the returned rows are exactly the top-n by fused_rank regardless of the
   physical plan.
2. clustering.assign_to_centroids: k=1 works (F.least rejects a single
   argument, so the lone candidate struct must be returned directly).
3. clustering.semdedup: the Spark side guards zero-norm vectors (cosine
   forced to 0.0) and the d11 oracle SQL mirrors the guard, so a zero-norm
   embedding is kept (never NaN-matched) in both engines.
4. search.rrf_fuse: non-numeric document ids (UUID strings) keep their
   native type — no silent long cast nulling them into one fused group.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.clustering import (
    assign_to_centroids,
    kmeans_lloyd,
    semdedup,
)
from matchbox_spark.operators.search import rrf_fuse


def _ranked(spark, pairs, id_type="long"):
    return spark.createDataFrame(pairs, f"doc {id_type}, rank int")


def test_rrf_top_n_is_true_top_n(spark):
    # 100 candidates in one list; top_n=5 must be fused_rank 1..5 exactly
    lst = _ranked(spark, [(i, i) for i in range(1, 101)])
    got = rrf_fuse({"only": lst}, k=60, top_n=5).collect()
    assert [r["fused_rank"] for r in got] == [1, 2, 3, 4, 5]
    assert [r["doc"] for r in got] == [1, 2, 3, 4, 5]


def test_assign_single_centroid(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [3.0, 4.0])], "vec_id long, embedding array<double>"
    )
    rows = {
        r["id"]: (r["cluster"], float(r["dist"]))
        for r in assign_to_centroids(df, {0: [0.0, 0.0]}).collect()
    }
    assert rows[1] == (0, 0.0)
    assert rows[2] == (0, 25.0)
    # and the full Lloyd loop accepts k=1 too
    out = kmeans_lloyd(df, k=1, iters=2).collect()
    assert {r["cluster"] for r in out} == {0}


def test_semdedup_zero_norm_vector_kept(spark):
    # id 5 is a zero vector in a cluster with two exact duplicates; the
    # zero-norm cosine is forced to 0.0, so id 5 survives while the
    # larger-id duplicate is pruned
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (5, [0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r["id"]: r["keep"] for r in semdedup(df, k=1, threshold=0.3).collect()}
    assert got == {1: True, 2: False, 5: True}


def test_rrf_string_ids_survive(spark):
    a = _ranked(
        spark,
        [("550e8400-aaaa", 1), ("550e8400-bbbb", 2)],
        id_type="string",
    )
    b = _ranked(
        spark,
        [("550e8400-bbbb", 1), ("550e8400-cccc", 2)],
        id_type="string",
    )
    got = {r["doc"]: r["n_lists"] for r in rrf_fuse({"a": a, "b": b}).collect()}
    assert got == {
        "550e8400-aaaa": 1,
        "550e8400-bbbb": 2,
        "550e8400-cccc": 1,
    }
