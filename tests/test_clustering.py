"""k-means / SemDeDup / RRF operator contracts (operators/clustering.py,
operators/search.py:rrf_fuse) — each pinned against an independent
driver-side reference (numpy brute force / hand-computed fusion)."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.clustering import (
    assign_to_centroids,
    kmeans_lloyd,
    semdedup,
)
from matchbox_spark.operators.search import rrf_fuse


def _vec_df(spark, rng, n=40, dim=8):
    rows = [
        (i, [float(x) for x in rng.standard_normal(dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_assignment_matches_numpy_argmin(spark):
    rng = np.random.default_rng(7)
    df = _vec_df(spark, rng)
    data = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    cents = {c: list(data[c]) for c in range(4)}
    got = {
        r["id"]: r["cluster"]
        for r in assign_to_centroids(df, cents).collect()
    }
    for vid, v in data.items():
        dists = [
            (round(float(np.sum(np.round((v - np.array(cents[c])) ** 2, 12))), 12), c)
            for c in range(4)
        ]
        assert got[vid] == min(dists)[1]


def test_kmeans_covers_all_rows_and_improves(spark):
    rng = np.random.default_rng(11)
    df = _vec_df(spark, rng, n=60)
    one = kmeans_lloyd(df, k=5, iters=1).collect()
    two = kmeans_lloyd(df, k=5, iters=2).collect()
    assert len(one) == len(two) == 60
    assert {r["cluster"] for r in two} <= set(range(5))
    # Lloyd monotonicity: total inertia never increases after an update
    assert sum(r["sqdist"] for r in two) <= sum(r["sqdist"] for r in one) + 1e-6


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # duplicate seed vectors: every row ties to the lower centroid id, so
    # cluster 1 is empty after the first assignment — the update must keep
    # its previous centroid (COALESCE fallback) instead of crashing or
    # emitting a truncated centroid
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [0.0, 0.0]),
            (2, [5.0, 5.0]),
            (3, [5.1, 5.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = {r["id"]: r["cluster"] for r in kmeans_lloyd(df, k=2, iters=3).collect()}
    assert len(out) == 4
    # pass 1: everything ties into cluster 0 (cluster 1 empty; its [0,0]
    # centroid survives the update) — pass 2 onward the preserved centroid
    # wins the zero vectors back while cluster 0 converges on the 5s
    assert out == {0: 1, 1: 1, 2: 0, 3: 0}


def test_kmeans_rejects_bad_params(spark):
    rng = np.random.default_rng(3)
    df = _vec_df(spark, rng, n=10)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, iters=0)


def test_semdedup_matches_brute_force(spark):
    rng = np.random.default_rng(23)
    base = [rng.standard_normal(8) for _ in range(30)]
    # plant near-duplicates: rows 30..34 are tiny perturbations of 0..4
    planted = [base[i] + rng.standard_normal(8) * 1e-3 for i in range(5)]
    vecs = base + planted
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = {r["id"]: (r["cluster"], r["keep"]) for r in semdedup(df, k=3, threshold=0.95).collect()}
    assert len(out) == 35

    # brute-force reference with the same cluster partition
    def cos(a, b):
        return round(
            float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))), 6
        )

    arrs = {i: np.array(v) for i, v in enumerate(vecs)}
    for i, (ci, keep) in out.items():
        expect_keep = not any(
            j < i and out[j][0] == ci and cos(arrs[i], arrs[j]) >= 0.95
            for j in out
        )
        assert keep == expect_keep, i
    # every planted copy shares its original's cluster → dropped
    dropped = {i for i, (_, keep) in out.items() if not keep}
    assert {30, 31, 32, 33, 34} <= dropped


def test_rrf_fuse_exact_scores(spark):
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc long, rank int"
    )
    vec = spark.createDataFrame(
        [(3, 1), (1, 2), (9, 3)], "doc long, rank int"
    )
    out = {
        r["doc"]: (r["n_lists"], r["rrf"], r["fused_rank"])
        for r in rrf_fuse({"lex": lex, "vec": vec}, k=60).collect()
    }
    assert out[1] == (2, round(1 / 61 + 1 / 62, 9), 1)
    assert out[3] == (2, round(1 / 63 + 1 / 61, 9), 2)
    assert out[2][0] == 1 and math.isclose(out[2][1], 1 / 62, abs_tol=1e-9)
    assert out[9][0] == 1 and out[9][2] == 4
    with pytest.raises(ValueError):
        rrf_fuse({})


def test_rrf_top_n_limits(spark):
    lex = spark.createDataFrame([(i, i) for i in range(1, 8)], "doc long, rank int")
    assert rrf_fuse({"only": lex}, top_n=3).count() == 3


def test_assignment_paths_agree_across_dispatch_boundary(spark):
    """The three assignment plans agree: broadcast is BIT-identical to
    literal (decimals included); arrow picks the same cluster with a
    float64 distance within 1e-9; and auto dispatches by k around
    LITERAL_CENTROID_MAX without changing the winning clusters."""
    import random

    from matchbox_spark.operators.clustering import (
        LITERAL_CENTROID_MAX,
        assign_to_centroids,
    )

    rng = random.Random(11)
    dim, k, n = 8, LITERAL_CENTROID_MAX + 44, 120
    cents = {i: [rng.uniform(0, 5) for _ in range(dim)] for i in range(k)}
    df = spark.createDataFrame(
        [(i, [rng.uniform(0, 5) for _ in range(dim)]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    lit = {
        r["id"]: (r["dist"], r["cluster"])
        for r in assign_to_centroids(df, cents, method="literal").collect()
    }
    bc = {
        r["id"]: (r["dist"], r["cluster"])
        for r in assign_to_centroids(df, cents, method="broadcast").collect()
    }
    assert bc == lit  # bit-exact, Decimal included
    for method in ("arrow", "auto"):  # auto > bound → arrow
        ar = {
            r["id"]: (r["dist"], r["cluster"])
            for r in assign_to_centroids(df, cents, method=method).collect()
        }
        assert set(ar) == set(lit)
        for i, (d, c) in ar.items():
            assert c == lit[i][1], (method, i)
            assert abs(float(d) - float(lit[i][0])) < 1e-9, (method, i)
