"""Pins for the round-8 ADVICE fixes (applied in round 9).

1. SimHash blocking keys on ``max_hamming + 1`` contiguous chunks, so the
   pigeonhole recall guarantee is EXACT for the promised distance budget
   (two halves only covered hamming ≤ 1 — a pair differing in one bit of
   each half shared no block and was silently missed).
2. splink_sql_to_spark lexes double-quoted identifiers and single-quoted
   literals in one alternation — an apostrophe inside a quoted identifier
   (l."o'brien") no longer opens a bogus string literal.
3. Catalog.save defers snapshot GC one generation: a reader of the
   previous pointer survives a save (pinned in test_catalog_snapshot).
4. sorted_neighborhood_rank builds the null probe only when
   nulls='error' (behavior-neutral; modes still agree on the pair set).
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# 1. chunked pigeonhole blocking
# ---------------------------------------------------------------------------


def test_simhash_chunks_layout():
    from matchbox_spark.operators.dedup import simhash_chunks

    # 16 bits / max_hamming 3 → 4 chunks of 4 bits
    assert simhash_chunks(16, 3) == [(0, 4), (4, 4), (8, 4), (12, 4)]
    # uneven split: lengths differ by at most one, cover all bits
    chunks = simhash_chunks(16, 4)  # 5 chunks over 16 bits
    assert [ln for _, ln in chunks] == [4, 3, 3, 3, 3]
    assert chunks[0][0] == 0
    assert all(
        chunks[i][0] + chunks[i][1] == chunks[i + 1][0]
        for i in range(len(chunks) - 1)
    )
    assert chunks[-1][0] + chunks[-1][1] == 16
    with pytest.raises(ValueError, match="chunk must span"):
        simhash_chunks(3, 3)  # 4 chunks won't fit 3 bits


def test_simhash_blocking_catches_cross_half_splits(spark):
    """The old two-half blocking missed pairs whose 2-3 differing bits
    split across both halves; the chunked blocking must find them."""
    from matchbox_spark.operators.dedup import simhash_pairs_from_values

    sigs = [
        (1, 0x0000),  # vs 2: bits 0 and 8 differ — one in each old half
        (2, 0x0101),
        (3, 0x00FF),  # vs 1: hamming 8 — must NOT appear
        (4, 0x1011),  # vs 1: bits 0, 4, 12 differ — three chunks touched,
        #                chunk 2 (bits 8-11) identical → found at hamming 3
    ]
    sims = spark.createDataFrame(sigs, "doc long, simhash long")
    out = simhash_pairs_from_values(sims, bits=16, max_hamming=3)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert got[(1, 2)] == 2
    assert got[(1, 4)] == 3
    assert (1, 3) not in got


def test_simhash_near_duplicates_matches_brute_force(spark):
    """End-to-end recall pin: chunk blocking == brute force over the
    signature table at max_hamming=3 on a real token corpus."""
    from matchbox_spark.operators.dedup import (
        simhash_near_duplicates,
        simhash_values,
    )

    words = [f"tok{i}" for i in range(12)]
    docs = [
        (i, " ".join(words[j] for j in range(12) if (i >> (j % 7)) & 1 or j % (i % 5 + 2) == 0))
        for i in range(1, 61)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sims = {r["doc"]: r["simhash"] for r in simhash_values(df, "doc_id", "text").collect()}
    brute = {
        (a, b): bin(sims[a] ^ sims[b]).count("1")
        for a, b in itertools.combinations(sorted(sims), 2)
        if bin(sims[a] ^ sims[b]).count("1") <= 3
    }
    out = simhash_near_duplicates(df, "doc_id", "text", bits=16, max_hamming=3)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    assert got == brute
    assert brute, "corpus produced no near pairs — test has no teeth"


def test_simhash_deduper_validates_chunk_budget(spark):
    from matchbox_spark.operators.lsh_linkers import SimHashDeduper

    with pytest.raises(ValueError, match="pigeonhole chunks"):
        SimHashDeduper(id="doc_id", text_field="text", bits=4, max_hamming=4)._validate()
    # bits == max_hamming + 1 is the floor and is allowed
    SimHashDeduper(id="doc_id", text_field="text", bits=5, max_hamming=4)._validate()


def test_simhash_delta_block_keys_cover_candidate_join(spark):
    """Every chunk key the candidate join blocks on appears in
    delta_block_keys — the streaming O(touched) locality contract."""
    from matchbox_spark.operators.lsh_linkers import SimHashDeduper

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma delta"), (3, "zz yy xx")],
        "doc_id long, text string",
    )
    ded = SimHashDeduper(id="doc_id", text_field="text", bits=16, max_hamming=3)
    keys = ded.delta_block_keys(df)
    per_doc = (
        keys.groupBy("doc_id").agg(F.countDistinct("block_key").alias("n")).collect()
    )
    # 4 chunks → up to 4 distinct keys per doc (fewer only on hv collisions)
    assert all(1 <= r["n"] <= 4 for r in per_doc)
    # docs 1 and 2 are near-identical: they must share at least one key
    k1 = {r["block_key"] for r in keys.where("doc_id = 1").collect()}
    k2 = {r["block_key"] for r in keys.where("doc_id = 2").collect()}
    assert k1 & k2


# ---------------------------------------------------------------------------
# 2. quote-atomic transpile lexer
# ---------------------------------------------------------------------------


def test_apostrophe_inside_quoted_identifier():
    from matchbox_spark.operators.probabilistic import splink_sql_to_spark

    out = splink_sql_to_spark('l."o\'brien" = r."o\'brien"')
    assert out == "l.`o'brien` = r.`o'brien`"


def test_identifier_with_apostrophe_then_literal():
    """The identifier's apostrophe must not scramble the literal boundary
    that follows — validation still sees (and rejects) real code."""
    from matchbox_spark.operators.probabilistic import splink_sql_to_spark

    out = splink_sql_to_spark(
        "l.\"it's\" = 'len(' AND array_length(list_intersect(l.\"xs\", r.\"xs\")) >= 1"
    )
    assert out == (
        "l.`it's` = 'len(' AND size(array_intersect(l.`xs`, r.`xs`)) >= 1"
    )
    with pytest.raises(ValueError, match="jaccard"):
        splink_sql_to_spark('l."it\'s" = \'x\' AND jaccard(l."a", r."a") > 0.5')


def test_doubled_quote_escape_in_identifier():
    from matchbox_spark.operators.probabilistic import splink_sql_to_spark

    # "" escape undone; embedded backtick doubled (Spark's escape)
    assert splink_sql_to_spark('l."a""b" = 1') == 'l.`a"b` = 1'
    assert splink_sql_to_spark('l."a`b" = 1') == "l.`a``b` = 1"


# ---------------------------------------------------------------------------
# 4. null probe rides the counts job only in error mode
# ---------------------------------------------------------------------------


def test_snm_modes_agree_without_probe(spark):
    from matchbox_spark.operators.blocking import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "c"), (5, None)],
        "id long, k string",
    )
    first = sorted_neighborhood_pairs(df, "id", ["k"], window=2, nulls="first")
    last = sorted_neighborhood_pairs(df, "id", ["k"], window=2, nulls="last")
    # nulls-first order: 3,5,1,2,4 → pairs (3,5)(1,5)(1,2)(2,4)
    assert {(r["left_id"], r["right_id"]) for r in first.collect()} == {
        (3, 5), (1, 5), (1, 2), (2, 4)
    }
    # nulls-last order: 1,2,4,3,5 → pairs (1,2)(2,4)(3,4)(3,5)
    assert {(r["left_id"], r["right_id"]) for r in last.collect()} == {
        (1, 2), (2, 4), (3, 4), (3, 5)
    }
    with pytest.raises(ValueError, match="null value in sort key"):
        sorted_neighborhood_pairs(df, "id", ["k"], window=2, nulls="error").collect()
