"""Interpolated Kneser–Ney LM tests: hand-computed pins + contracts.

The bigram and trigram examples below are worked by hand from the Chen &
Goodman formulas (module docstring of operators/lm.py), so a regression in
any count table, discount placement, or interpolation weight shifts a
pinned probability.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.lm import (
    kn_doc_logprob,
    kn_perplexity,
    kn_prob_table,
    _gram_stream,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestKnBigram:
    # corpus: doc1 = "a b a b c", doc2 = "b c"
    # bigram stream: (a,b)x2, (b,a), (b,c)x2
    # c2: (a,b)=2 (b,a)=1 (b,c)=2 ; ctx a: c=2,types=1 ; ctx b: c=3,types=2
    # continuation unigrams (distinct left-extensions): a=1, b=1, c=1 ; nt=3
    # D=0.75:
    #   P(b|a) = (2-.75)/2 + (.75*1/2)*(1/3) = 0.75
    #   P(a|b) = (1-.75)/3 + (.75*2/3)*(1/3) = 0.25
    #   P(c|b) = (2-.75)/3 + (.75*2/3)*(1/3) = 0.5833333...
    ROWS = [(1, "a b a b c"), (2, "b c")]

    def test_hand_computed_probabilities(self, spark):
        grams = _gram_stream(_docs(spark, self.ROWS), 2, "doc_id", "text")
        p = {
            (r["g0"], r["g1"]): r["p"]
            for r in kn_prob_table(grams, 2, 0.75).collect()
        }
        assert p[("a", "b")] == pytest.approx(0.75, abs=1e-12)
        assert p[("b", "a")] == pytest.approx(0.25, abs=1e-12)
        assert p[("b", "c")] == pytest.approx(7 / 12, abs=1e-12)

    def test_doc_means(self, spark):
        out = {
            r["doc"]: r.asDict()
            for r in kn_doc_logprob(
                _docs(spark, self.ROWS), order=2
            ).collect()
        }
        assert out[1]["n_grams"] == 4
        terms1 = [0.75, 0.25, 0.75, 7 / 12]
        exp1 = sum(round(math.log(x), 6) for x in terms1) / 4
        assert out[1]["mean_logprob"] == pytest.approx(exp1, abs=2e-6)
        assert out[2]["n_grams"] == 1
        assert out[2]["mean_logprob"] == pytest.approx(
            round(math.log(7 / 12), 6), abs=2e-6
        )


class TestKnTrigram:
    # corpus: one doc "a b a b a" -> trigrams (a,b,a)x2, (b,a,b)
    # c3: (a,b,a)=2 (b,a,b)=1 ; ctx3 (a,b): c=2,n3=1 ; (b,a): c=1,n3=1
    # mid N1+(.vw): (b,a)=1, (a,b)=1 ; ctx2 a: nv=1,tv=1 ; b: nv=1,tv=1
    # uni N1+(..w): a=1, b=1 ; nt=2
    #   P2(a|b) = (1-.75)/1 + (.75*1/1)*(1/2) = 0.625   (= P2(b|a))
    #   P(a|a,b) = (2-.75)/2 + (.75*1/2)*0.625 = 0.859375
    #   P(b|b,a) = (1-.75)/1 + (.75*1/1)*0.625 = 0.71875
    ROWS = [(1, "a b a b a")]

    def test_hand_computed_probabilities(self, spark):
        grams = _gram_stream(_docs(spark, self.ROWS), 3, "doc_id", "text")
        p = {
            (r["g0"], r["g1"], r["g2"]): r["p"]
            for r in kn_prob_table(grams, 3, 0.75).collect()
        }
        assert p[("a", "b", "a")] == pytest.approx(0.859375, abs=1e-12)
        assert p[("b", "a", "b")] == pytest.approx(0.71875, abs=1e-12)

    def test_doc_mean_and_short_doc(self, spark):
        rows = self.ROWS + [(2, "too short")]  # 2 tokens < order 3
        out = {
            r["doc"]: r.asDict()
            for r in kn_doc_logprob(_docs(spark, rows), order=3).collect()
        }
        assert out[1]["n_grams"] == 3
        terms = [0.859375, 0.71875, 0.859375]
        exp = sum(round(math.log(x), 6) for x in terms) / 3
        assert out[1]["mean_logprob"] == pytest.approx(exp, abs=2e-6)
        assert out[2]["n_grams"] == 0 and out[2]["mean_logprob"] is None

    def test_perplexity_monotone(self, spark):
        # repetitive doc scores lower perplexity than a one-shot doc
        rows = [
            (1, "x y x y x y x y x y x y"),
            (2, "q w e r t u i o p s d f"),
        ]
        out = {
            r["doc"]: r["perplexity"]
            for r in kn_perplexity(_docs(spark, rows), order=3).collect()
        }
        assert out[1] < out[2]

    def test_probabilities_in_unit_interval(self, spark):
        rows = [
            (i, " ".join("abcdefg"[(i * 7 + j * 3) % 7] for j in range(12)))
            for i in range(8)
        ]
        for order in (2, 3):
            grams = _gram_stream(_docs(spark, rows), order, "doc_id", "text")
            bad = (
                kn_prob_table(grams, order, 0.75)
                .where((F.col("p") <= 0) | (F.col("p") > 1))
                .count()
            )
            assert bad == 0

    def test_invalid_args(self, spark):
        d = _docs(spark, self.ROWS)
        g = _gram_stream(d, 2, "doc_id", "text")
        with pytest.raises(ValueError, match="order"):
            kn_prob_table(g, 4, 0.75)
        with pytest.raises(ValueError, match="discount"):
            kn_prob_table(g, 2, 1.5)


def _r6(x: float) -> float:
    """The ieee_round6 recipe: FLOOR(x*1e6 + 0.5)/1e6 on IEEE doubles."""
    return math.floor(x * 1e6 + 0.5) / 1e6


class TestHeldOutScoring:
    """Round-8 train/score split (kn_score_held_out): every backoff branch
    hand-computed for order 2, then an order-4/5 cross-check against an
    independent pure-Python reference."""

    # train: d1="a b a c", d2="a b" → distinct bigrams (a,b):2 (b,a):1
    # (a,c):1 → nt=3; tab1: a:1 b:1 c:1; ctx2: a:(t=3,y=2) b:(t=1,y=1)
    TRAIN = [(1, "a b a c"), (2, "a b")]

    def _score(self, spark, rows, order=2):
        from matchbox_spark.operators.lm import kn_score_held_out

        return {
            r["doc"]: (r["n_grams"], r["mean_logprob"])
            for r in kn_score_held_out(
                _docs(spark, self.TRAIN),
                _docs(spark, rows),
                order=order,
                discount=0.75,
            ).collect()
        }

    def test_each_backoff_branch(self, spark):
        # one bigram per doc isolates each branch of the general KN form
        got = self._score(
            spark,
            [
                (10, "a b"),   # seen gram, seen context
                (11, "b x"),   # OOV word, seen context → escape mass only
                (12, "x b"),   # unseen context → pass through to unigram
                (13, "b a"),   # seen singleton gram
                (14, "a q"),   # OOV word under the bigger context
                (15, "z"),     # no grams at all
            ],
        )
        p1_b = 1 / 4  # cnt1(b)=1, nt=3 → 1/(3+1)
        p1_a = 1 / 4
        p1_unk = 1 / 4  # escape unit: 1/(nt+1)
        exp = {
            10: (2 - 0.75) / 3 + ((0.75 * 2) / 3) * p1_b,
            11: 0.0 + ((0.75 * 1) / 1) * p1_unk,
            12: p1_b,
            13: (1 - 0.75) / 1 + ((0.75 * 1) / 1) * p1_a,
            14: 0.0 + ((0.75 * 2) / 3) * p1_unk,
        }
        for doc, p in exp.items():
            n, mlp = got[doc]
            assert n == 1, doc
            assert mlp == _r6(_r6(math.log(p))), doc
        assert got[15] == (0, None)

    def test_order5_matches_independent_reference(self, spark):
        from matchbox_spark.operators.lm import kn_score_held_out

        # deterministic word-salad corpora (no RNG: content-derived)
        vocab = ["red", "blue", "green", "ox", "owl", "ant", "elk", "bee"]
        train_rows = [
            (i, " ".join(vocab[(i * 7 + 3 * k) % 8] for k in range(12)))
            for i in range(40)
        ]
        score_rows = [
            (100 + i, " ".join(
                (vocab[(i * 5 + 2 * k) % 8] if k % 6 else "novel")
                for k in range(9)
            ))
            for i in range(12)
        ]
        for order in (4, 5):
            got = {
                r["doc"]: (r["n_grams"], r["mean_logprob"])
                for r in kn_score_held_out(
                    _docs(spark, train_rows),
                    _docs(spark, score_rows),
                    order=order,
                    discount=0.75,
                ).collect()
            }
            want = _reference_kn(train_rows, score_rows, order, 0.75)
            assert got == want, f"order {order}"

    def test_validation(self, spark):
        from matchbox_spark.operators.lm import kn_score_held_out

        t = _docs(spark, self.TRAIN)
        with pytest.raises(ValueError, match="orders 2-5"):
            kn_score_held_out(t, t, order=6)
        with pytest.raises(ValueError, match="discount"):
            kn_score_held_out(t, t, order=3, discount=1.5)
        with pytest.raises(ValueError, match="unigram"):
            kn_score_held_out(t, t, unigram="words")

    def test_tokens_unigram_hand_check(self, spark):
        """KenLM-mode (unigram='tokens') order-2 hand pins: the unigram
        basis is gram-final TOKEN occurrences (b:2 a:1 c:1, NT=4), not
        distinct types (b:1 a:1 c:1, nt=3)."""
        from matchbox_spark.operators.lm import kn_score_held_out

        got = {
            r["doc"]: (r["n_grams"], r["mean_logprob"])
            for r in kn_score_held_out(
                _docs(spark, self.TRAIN),
                _docs(spark, [(10, "a b"), (11, "b x"), (12, "x b")]),
                order=2,
                discount=0.75,
                unigram="tokens",
            ).collect()
        }
        p1_b = 2 / 5  # tokens(b)=2, NT=4 → 2/(4+1)
        p1_unk = 1 / 5
        exp = {
            10: (2 - 0.75) / 3 + ((0.75 * 2) / 3) * p1_b,
            11: 0.0 + ((0.75 * 1) / 1) * p1_unk,
            12: p1_b,
        }
        for doc, p in exp.items():
            n, mlp = got[doc]
            assert n == 1, doc
            assert mlp == _r6(_r6(math.log(p))), doc

    def test_tokens_mode_matches_independent_reference(self, spark):
        from matchbox_spark.operators.lm import kn_score_held_out

        vocab = ["red", "blue", "green", "ox", "owl", "ant", "elk", "bee"]
        train_rows = [
            (i, " ".join(vocab[(i * 7 + 3 * k) % 8] for k in range(12)))
            for i in range(40)
        ]
        score_rows = [
            (100 + i, " ".join(
                (vocab[(i * 5 + 2 * k) % 8] if k % 6 else "novel")
                for k in range(9)
            ))
            for i in range(12)
        ]
        for order in (2, 4):
            got = {
                r["doc"]: (r["n_grams"], r["mean_logprob"])
                for r in kn_score_held_out(
                    _docs(spark, train_rows),
                    _docs(spark, score_rows),
                    order=order,
                    discount=0.75,
                    unigram="tokens",
                ).collect()
            }
            want = _reference_kn(
                train_rows, score_rows, order, 0.75, unigram="tokens"
            )
            assert got == want, f"order {order}"
            # the two modes genuinely differ on this corpus
            assert got != _reference_kn(train_rows, score_rows, order, 0.75)


def _reference_kn(train_rows, score_rows, order, D, unigram="types"):
    """Independent plain-Python KN held-out scorer (dicts and floats; no
    Spark) mirroring the documented model definition."""
    from collections import Counter
    from decimal import Decimal

    def grams(rows):
        out = []
        for doc_id, text in rows:
            t = text.split()
            for i in range(len(t) - order + 1):
                out.append((doc_id, tuple(t[i : i + order])))
        return out

    cN = Counter(g for _, g in grams(train_rows))
    tabs = {order: dict(cN)}
    for k in range(order - 1, 0, -1):
        c = Counter(g[order - k:] for g in cN)
        tabs[k] = dict(c)
    ctxs = {}
    for k in range(order, 1, -1):
        agg: dict = {}
        for suf, cnt in tabs[k].items():
            ctx = suf[: k - 1]
            tot, typ = agg.get(ctx, (0, 0))
            agg[ctx] = (tot + cnt, typ + 1)
        ctxs[k] = agg
    if unigram == "tokens":
        c1 = Counter()
        for g, cnt in cN.items():
            c1[g[order - 1:]] += cnt
        tabs[1] = dict(c1)
        nt = float(sum(cN.values()))
    else:
        nt = float(len(cN))

    def prob(g):
        c1 = tabs[1].get(g[order - 1:])
        p = (float(c1) if c1 is not None else 1.0) / (nt + 1.0)
        for k in range(2, order + 1):
            ctx = g[order - k : order - 1]
            hit = ctxs[k].get(ctx)
            if hit is None:
                continue
            tot, typ = hit
            ck = tabs[k].get(g[order - k:])
            full = (0.0 if ck is None else (ck - D) / tot) + ((D * typ) / tot) * p
            p = full
        return p

    per_doc: dict = {}
    for doc_id, g in grams(score_rows):
        per_doc.setdefault(doc_id, []).append(
            Decimal(str(_r6(math.log(prob(g)))))
        )
    out = {}
    for doc_id, _ in score_rows:
        terms = per_doc.get(doc_id)
        if not terms:
            out[doc_id] = (0, None)
        else:
            out[doc_id] = (
                len(terms),
                _r6(float(sum(terms)) / len(terms)),
            )
    return out
