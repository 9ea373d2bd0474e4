"""Deduper / linker semantics tests (SURVEY §2.3, reference test strategy §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators import (
    DeterministicLinker,
    NaiveDeduper,
    WeightedDeterministicLinker,
)
from matchbox_spark.operators.comparison import validate_comparison
from matchbox_spark.operators.results import (
    ScoreError,
    best_pair_dedupe,
    normalise_scores,
    threshold_edges,
)


def _pairs(df):
    return {(r["left_id"], r["right_id"]) for r in df.collect()}


def test_naive_deduper_basic(spark):
    data = spark.createDataFrame(
        [
            (1, "alice", "a@x.com"),
            (2, "alice", "a@x.com"),
            (3, "bob", "b@x.com"),
            (4, "alice", "other@x.com"),
        ],
        "id long, name string, email string",
    )
    d = NaiveDeduper(id="id", unique_fields=["name", "email"])
    out = d.dedupe(data)
    assert _pairs(out) == {(1, 2)}
    assert out.schema["score"].dataType.simpleString() == "float"


def test_naive_deduper_true_duplicates_and_transitivity(spark):
    # three identical rows → all 3 pairs; identical data with distinct ids pairs
    data = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], "id long, v string"
    )
    out = NaiveDeduper(id="id", unique_fields=["v"]).dedupe(data)
    assert _pairs(out) == {(1, 2), (1, 3), (2, 3)}


def test_naive_deduper_same_id_distinct_rows_suppressed(spark):
    # unnested array of keys → same entity id appears twice; self-pairs dropped
    data = spark.createDataFrame([(1, "x"), (1, "x")], "id long, v string")
    out = NaiveDeduper(id="id", unique_fields=["v"]).dedupe(data)
    assert _pairs(out) == set()


def test_naive_deduper_nulls_never_match(spark):
    data = spark.createDataFrame(
        [(1, None), (2, None)], "id long, v string"
    )
    out = NaiveDeduper(id="id", unique_fields=["v"]).dedupe(data)
    assert _pairs(out) == set()


def test_deterministic_linker_or_union(spark):
    left = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "id long, name string, phone string"
    )
    right = spark.createDataFrame(
        [(10, "a", "zz"), (20, "xx", "p2"), (30, "c", "p9")],
        "id long, name string, phone string",
    )
    linker = DeterministicLinker(
        left_id="id",
        right_id="id",
        comparisons=["l.name = r.name", "l.phone = r.phone"],
    )
    out = linker.link(left, right)
    assert _pairs(out) == {(1, 10), (2, 20)}
    assert set(out.columns) == {"left_id", "right_id", "score"}


def test_deterministic_linker_sequential_rounds(spark):
    # round 1 matches (1,10); round 2 would match 1 again on phone but 1 is
    # out of the pool, so only (2,20) appears from round 2
    left = spark.createDataFrame(
        [(1, "a", "p2"), (2, "b", "p2")], "id long, name string, phone string"
    )
    right = spark.createDataFrame(
        [(10, "a", "zz"), (20, "xx", "p2")], "id long, name string, phone string"
    )
    linker = DeterministicLinker(
        left_id="id",
        right_id="id",
        comparisons=[["l.name = r.name"], ["l.phone = r.phone"]],
    )
    out = linker.link(left, right)
    assert _pairs(out) == {(1, 10), (2, 20)}


def test_weighted_linker_threshold(spark):
    left = spark.createDataFrame(
        [(1, "a", "p1"), (2, "b", "p2")], "id long, name string, phone string"
    )
    right = spark.createDataFrame(
        [(10, "a", "p1"), (20, "b", "zz")], "id long, name string, phone string"
    )
    linker = WeightedDeterministicLinker(
        left_id="id",
        right_id="id",
        weighted_comparisons=[
            {"comparison": "l.name = r.name", "weight": 1.0},
            {"comparison": "l.phone = r.phone", "weight": 1.0},
        ],
        threshold=0.8,
    )
    out = linker.link(left, right)
    assert _pairs(out) == {(1, 10)}  # (2,20) scores 0.5 < 0.8

    linker_low = WeightedDeterministicLinker(
        left_id="id",
        right_id="id",
        weighted_comparisons=[
            {"comparison": "l.name = r.name", "weight": 1.0},
            {"comparison": "l.phone = r.phone", "weight": 1.0},
        ],
        threshold=0.5,
    )
    assert _pairs(linker_low.link(left, right)) == {(1, 10), (2, 20)}


def test_comparison_validation():
    validate_comparison("l.name = r.name")
    with pytest.raises(ValueError):
        validate_comparison("name = name2")  # no l./r. refs
    with pytest.raises(ValueError):
        validate_comparison("l.a = r.a; drop table x")
    with pytest.raises(ValueError):
        validate_comparison("select 1")


def test_normalise_scores_rejects_bad(spark):
    ok = spark.createDataFrame(
        [(1, 2, 0.5)], "left_id long, right_id long, score double"
    )
    normalise_scores(ok)
    bad = spark.createDataFrame(
        [(1, 2, 1.5)], "left_id long, right_id long, score double"
    )
    with pytest.raises(ScoreError):
        normalise_scores(bad)


def test_threshold_and_best_pair(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 1, 0.7), (3, 4, 0.2)],
        "left_id long, right_id long, score float",
    )
    assert _pairs(threshold_edges(edges, 0.5)) == {(1, 2), (2, 1)}
    best = best_pair_dedupe(edges)
    rows = {(r["left_id"], r["right_id"]): r["score"] for r in best.collect()}
    assert set(rows) == {(1, 2), (3, 4)}
    assert abs(rows[(1, 2)] - 0.9) < 1e-6


def test_as_lookup_full_outer(spark):
    from matchbox_spark.operators.results import as_lookup

    a = spark.createDataFrame([(1, "a1"), (2, "a2")], "id long, key string")
    b = spark.createDataFrame([(2, "b2"), (3, "b3")], "id long, key string")
    out = as_lookup({"src_a": a, "src_b": b})
    rows = {r["id"]: (r["src_a_key"], r["src_b_key"]) for r in out.collect()}
    assert rows == {1: ("a1", None), 2: ("a2", "b2"), 3: (None, "b3")}


def test_merge_clusterings(spark):
    from matchbox_spark.operators.results import merge_clusterings

    a = spark.createDataFrame([(1, 10), (1, 11), (2, 20)], "parent_id long, child_id long")
    b = spark.createDataFrame([(9, 11), (9, 12)], "parent_id long, child_id long")
    out = merge_clusterings(a, b)
    comps = {}
    for r in out.collect():
        comps.setdefault(r["parent_id"], set()).add(r["child_id"])
    assert {frozenset(v) for v in comps.values()} == {
        frozenset({10, 11, 12}),
        frozenset({20}),
    }
    # dense deterministic labels ordered by min member
    assert sorted(comps) == [1, 2]


def test_naive_deduper_skew_guard(spark):
    rows = [(i, "degenerate") for i in range(50)] + [(100, "ok"), (101, "ok")]
    data = spark.createDataFrame(rows, "id long, v string")
    guarded = NaiveDeduper(id="id", unique_fields=["v"], max_group_size=10)
    out = guarded.dedupe(data)
    # the 50-member degenerate group is dropped; the small group survives
    assert _pairs(out) == {(100, 101)}
    # default (faithful) semantics keeps everything
    full = NaiveDeduper(id="id", unique_fields=["v"]).dedupe(data)
    assert full.count() == 50 * 49 // 2 + 1


def test_naive_chunked_equals_default(spark):
    import random

    from matchbox_spark.operators.dedupers import NaiveDeduper

    rng = random.Random(7)
    rows = [
        (i, f"grp{rng.randrange(8)}", f"seg{rng.randrange(3)}")
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, a string, b string")
    base = NaiveDeduper(id="id", unique_fields=["a", "b"]).dedupe(df)
    chunked = NaiveDeduper(
        id="id", unique_fields=["a", "b"], chunk_size=7
    ).dedupe(df)
    pa = {(r["left_id"], r["right_id"]) for r in base.collect()}
    pb = {(r["left_id"], r["right_id"]) for r in chunked.collect()}
    assert pa == pb and len(pa) > 0


def test_naive_chunked_giant_group_exact_count(spark):
    from pyspark.sql import functions as F

    from matchbox_spark.operators.dedupers import NaiveDeduper

    g = 3000  # one degenerate key: 4,498,500 pairs
    df = spark.range(g).select(
        F.col("id"), F.lit("SAME").alias("k")
    )
    out = NaiveDeduper(id="id", unique_fields=["k"], chunk_size=500).dedupe(df)
    assert out.count() == g * (g - 1) // 2


def test_naive_chunked_true_duplicate_rows(spark):
    # rows sharing an id (true duplicates) never self-pair, matching the
    # default path's semantics
    from matchbox_spark.operators.dedupers import NaiveDeduper

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (3, "y")], "id long, k string"
    )
    base = NaiveDeduper(id="id", unique_fields=["k"]).dedupe(df)
    chunked = NaiveDeduper(id="id", unique_fields=["k"], chunk_size=2).dedupe(df)
    pa = {(r["left_id"], r["right_id"]) for r in base.collect()}
    pb = {(r["left_id"], r["right_id"]) for r in chunked.collect()}
    assert pa == pb == {(1, 2)}
