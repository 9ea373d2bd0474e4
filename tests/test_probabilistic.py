"""Fellegi–Sunter EM linker + similarity linkers tests."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.lsh_linkers import EmbeddingLinker, MinHashLinker
from matchbox_spark.operators.probabilistic import FellegiSunterLinker


@pytest.fixture(scope="module")
def noisy_pair_data(spark):
    """Two sources over 40 entities: matching pairs agree on name ~95% and
    city ~80%; non-matching candidate pairs agree on name ~2%, city ~20%."""
    rng = random.Random(42)
    left_rows, right_rows = [], []
    cities = [f"city{c}" for c in range(5)]
    for e in range(40):
        name = f"entity-{e}"
        city = rng.choice(cities)
        zip_ = f"Z{e % 8}"  # blocking key: 8 blocks of 5 entities
        left_rows.append((e, name, city, zip_))
        r_name = name if rng.random() < 0.95 else f"entity-x{e}"
        r_city = city if rng.random() < 0.8 else rng.choice(cities)
        right_rows.append((1000 + e, r_name, r_city, zip_))
    left = spark.createDataFrame(
        left_rows, "id long, name string, city string, zip string"
    )
    right = spark.createDataFrame(
        right_rows, "id long, name string, city string, zip string"
    )
    return left, right


def test_fellegi_sunter_separates_matches(spark, noisy_pair_data):
    left, right = noisy_pair_data
    linker = FellegiSunterLinker(
        left_id="id",
        right_id="id",
        blocking_rules=["l.zip = r.zip"],
        comparisons=["l.name = r.name", "l.city = r.city"],
        threshold=0.5,
    )
    edges = linker.link(left, right)
    got = {(r["left_id"], r["right_id"]): r["score"] for r in edges.collect()}
    true_pairs = {(e, 1000 + e) for e in range(40)}
    found_true = set(got) & true_pairs
    # at threshold 0.5 EM keeps exactly the both-fields-agree pairs (city
    # agreement is near-universal among matches here, so single-field
    # disagreement is strong counter-evidence — correct FS behaviour)
    assert len(found_true) >= 30
    false_found = set(got) - true_pairs
    assert not false_found, f"false positives: {false_found}"
    assert all(0.5 <= s <= 1.0 for s in got.values())

    # a permissive threshold additionally recovers name-only-agreeing true
    # pairs without admitting any candidates agreeing on nothing
    permissive = FellegiSunterLinker(
        left_id="id",
        right_id="id",
        blocking_rules=["l.zip = r.zip"],
        comparisons=["l.name = r.name", "l.city = r.city"],
        threshold=0.05,
    )
    got2 = {
        (r["left_id"], r["right_id"]) for r in permissive.link(left, right).collect()
    }
    assert len(got2 & true_pairs) > len(found_true)

    # fitted parameters are sane: name agreement much likelier under match
    weights = {w["comparison"]: w for w in linker.match_weights()}
    assert weights["l.name = r.name"]["m"] > weights["l.name = r.name"]["u"]
    assert weights["l.name = r.name"]["match_weight"] > 1.0


def test_fellegi_sunter_requires_blocking(spark, noisy_pair_data):
    left, right = noisy_pair_data
    with pytest.raises(ValueError):
        FellegiSunterLinker(
            left_id="id", right_id="id", comparisons=["l.name = r.name"]
        ).link(left, right)


def test_minhash_linker_cross_source(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "near the warm fire and the birds sing in the tall green trees"
    )
    left = spark.createDataFrame(
        [(1, base), (2, "totally unrelated words about spark shuffles and joins here")],
        "id long, text string",
    )
    right = spark.createDataFrame(
        [(10, base.replace("lazy dog", "lazy hound")), (20, "other different content entirely about databases")],
        "id long, text string",
    )
    edges = MinHashLinker(
        left_id="id", right_id="id", num_perm=32, bands=8, threshold=0.5
    ).link(left, right)
    got = {(r["left_id"], r["right_id"]): r["score"] for r in edges.collect()}
    assert set(got) == {(1, 10)}
    assert 0.5 <= got[(1, 10)] <= 1.0


def test_embedding_linker(spark):
    left = spark.createDataFrame(
        [(1, [1.0, 0.2, 0.5, -0.3]), (2, [-0.9, 0.8, -0.1, 0.4])],
        "id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(10, [0.99, 0.21, 0.5, -0.3]), (20, [0.0, -1.0, 0.0, 1.0])],
        "id long, embedding array<float>",
    )
    edges = EmbeddingLinker(
        left_id="id", right_id="id", threshold=0.95, bucket_dims=[0, 1, 2, 3]
    ).link(left, right)
    got = {(r["left_id"], r["right_id"]) for r in edges.collect()}
    assert got == {(1, 10)}
