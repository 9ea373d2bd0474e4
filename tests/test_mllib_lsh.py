"""MLlib-backed LSH linker tests."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def corpora(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "near the warm fire and the birds sing in the tall green trees"
    )
    left = spark.createDataFrame(
        [(1, base), (2, "spark shuffles partitions executors cluster scale compute")],
        "id long, text string",
    )
    right = spark.createDataFrame(
        [(10, base.replace("lazy dog", "lazy hound")),
         (20, "entirely unrelated database words storage buffer pool pages")],
        "id long, text string",
    )
    return left, right


def test_mllib_minhash_linker(spark, corpora):
    from matchbox_spark.operators.mllib_lsh import MLlibMinHashLinker

    left, right = corpora
    edges = MLlibMinHashLinker(
        left_id="id", right_id="id", jaccard_threshold=0.4, shingle_n=2
    ).link(left, right)
    got = {(r["left_id"], r["right_id"]): r["score"] for r in edges.collect()}
    assert (1, 10) in got and got[(1, 10)] >= 0.4
    assert (2, 20) not in got


def test_mllib_random_projection_linker(spark):
    from matchbox_spark.operators.mllib_lsh import MLlibRandomProjectionLinker

    left = spark.createDataFrame(
        [(1, [1.0, 0.2, 0.5, -0.3]), (2, [-5.0, 4.0, -3.0, 2.0])],
        "id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(10, [1.01, 0.2, 0.5, -0.3]), (20, [9.0, -9.0, 9.0, -9.0])],
        "id long, embedding array<float>",
    )
    edges = MLlibRandomProjectionLinker(
        left_id="id", right_id="id", max_l2_distance=0.5
    ).link(left, right)
    got = {(r["left_id"], r["right_id"]) for r in edges.collect()}
    assert got == {(1, 10)}
