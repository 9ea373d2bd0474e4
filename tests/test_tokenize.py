"""BPE merge training and encoding (operators/tokenize.py)."""

from __future__ import annotations

import pytest

from matchbox_spark.operators.tokenize import (
    bpe_encode,
    bpe_encode_arrow,
    bpe_train,
)


def test_bpe_hand_computed(spark):
    """'aaab aaab ab': merge 0 = (a,a) freq 4 (greedy overlap counts both
    positions, weighted by word freq); greedy rewrite gives aaab→[aa,a,b]
    (overlapping second match consumed); merge 1 = (a,b) freq 3; final
    corpus symbols = 2·2 + 1 = 5."""
    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    out = [tuple(r) for r in bpe_train(df, n_merges=2, top_words=10).collect()]
    assert out == [
        (-1, "__symbols__", "", 5),
        (0, "a", "a", 4),
        (1, "a", "b", 3),
    ]


def test_bpe_long_run_alternates(spark):
    """'aaaaaa' (one 6-run): island of 5 matching positions → merges at
    in-island ranks 1,3,5 → [aa,aa,aa]; pair freq counts all 5 adjacencies."""
    df = spark.createDataFrame([("aaaaaa",)], "text string")
    out = [tuple(r) for r in bpe_train(df, n_merges=1, top_words=5).collect()]
    assert out == [(-1, "__symbols__", "", 3), (0, "a", "a", 5)]


def test_bpe_tie_breaks_lexicographic(spark):
    # 'xy' and 'ab' each once: (a,b) and (x,y) tie at 1 → (a,b) wins
    df = spark.createDataFrame([("xy ab",)], "text string")
    out = [tuple(r) for r in bpe_train(df, n_merges=1, top_words=5).collect()]
    assert out[1] == (0, "a", "b", 1)


def test_bpe_encode_hand_computed(spark):
    """Encode with fixed merges [(a,a), (a,b)]: 'aaab' → pass 1 greedy
    left-to-right [aa,a,b] (overlap consumed), pass 2 merges (a,b) →
    [aa,ab]; 'ab' → [ab]."""
    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    out = {
        r["word"]: (r["freq"], list(r["syms"]))
        for r in bpe_encode(df, [("a", "a"), ("a", "b")], top_words=5).collect()
    }
    assert out == {"aaab": (2, ["aa", "ab"]), "ab": (1, ["ab"])}


def test_bpe_encode_reproduces_trainer_segmentation(spark):
    """Encoding the training corpus with the trained merges lands on the
    trainer's own final segmentation: Σ len(syms)·freq equals bpe_train's
    it = -1 row."""
    df = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ran",), ("a mat on tar",)],
        "text string",
    )
    trained = bpe_train(df, n_merges=3, top_words=20).collect()
    total = next(r["pair_freq"] for r in trained if r["it"] == -1)
    merges = [
        (r["lhs"], r["rhs"]) for r in sorted(
            (r for r in trained if r["it"] >= 0), key=lambda r: r["it"]
        )
    ]
    enc = bpe_encode(df, merges, top_words=20).collect()
    assert sum(len(r["syms"]) * r["freq"] for r in enc) == total


def test_bpe_encode_arrow_matches_relational(spark):
    """The vocab-scale Arrow path implements the identical single-pass
    rank-order semantics — row-identical to the relational path,
    including overlap (aaa), repeated application (a+a then aa+aa? no:
    once each), and merge outputs feeding later merges."""
    df = spark.createDataFrame(
        [("aaaa abab banana bandana aaab the then there",)], "text string"
    )
    merges = [("a", "a"), ("a", "b"), ("a", "n"), ("t", "h"), ("th", "e"), ("an", "an")]
    rel = {
        r["word"]: (r["freq"], list(r["syms"]))
        for r in bpe_encode(df, merges, top_words=50).collect()
    }
    arr = {
        r["word"]: (r["freq"], list(r["syms"]))
        for r in bpe_encode_arrow(df, merges, top_words=50).collect()
    }
    assert rel == arr
    # spot-check composed merges: banana → b,an,an,a → (an,an) → b,anan,a
    assert rel["banana"][1] == ["b", "anan", "a"]
    assert rel["there"][1] == ["the", "r", "e"]


def test_bpe_validation_and_exhaustion(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)
    # after merging (a,b) the single word is one symbol — no pairs remain
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=2, top_words=5)
