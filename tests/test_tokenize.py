"""BPE merge training (operators/tokenize.py)."""

from __future__ import annotations

import pytest

from matchbox_spark.operators.tokenize import bpe_train


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


def test_bpe_validation_and_exhaustion(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=0)
    # after merging (a,b) the single word is one symbol — no pairs remain
    with pytest.raises(ValueError):
        bpe_train(df, n_merges=2, top_words=5)
