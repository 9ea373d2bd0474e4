"""Round-4 operators: PII redaction, contamination check, BM25, fuzzy link."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from matchbox_spark.functions import text as TX
from matchbox_spark.operators.dedup import contamination_check
from matchbox_spark.operators.linkers import FuzzyLinker
from matchbox_spark.operators.search import bm25_scores


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def _redact_one(spark, text: str) -> tuple[str, int, int, int]:
    df = spark.createDataFrame([(text,)], "t string")
    counts = TX.pii_counts_exprs("t")
    row = df.select(
        TX.pii_redact_expr("t").alias("red"),
        counts["n_emails"].alias("e"),
        counts["n_ips"].alias("i"),
        counts["n_phones"].alias("p"),
    ).first()
    return row["red"], row["e"], row["i"], row["p"]


def test_pii_redact_all_three_classes(spark):
    red, e, i, p = _redact_one(
        spark,
        "mail a.b+c@sub.example.co.uk, host 192.168.1.254, tel +44 7700-900123.",
    )
    assert red == "mail <EMAIL>, host <IP>, tel <PHONE>."
    assert (e, i, p) == (1, 1, 1)


def test_pii_redact_clean_text_untouched(spark):
    text = "no pii here, just 12345 and version 1.2 of the spec"
    red, e, i, p = _redact_one(spark, text)
    assert red == text
    assert (e, i, p) == (0, 0, 0)


def test_pii_redact_multiple_and_adjacent(spark):
    red, e, i, p = _redact_one(
        spark, "a@b.io c@d.org 10.0.0.1 10.0.0.2 +1 23456789 end"
    )
    assert red == "<EMAIL> <EMAIL> <IP> <IP> <PHONE> end"
    assert (e, i, p) == (2, 2, 1)


def test_pii_phone_requires_plus_prefix(spark):
    # bare digit runs (ids, quantities) must not be redacted
    red, _, _, p = _redact_one(spark, "order 123456789012 total 999999999")
    assert red == "order 123456789012 total 999999999"
    assert p == 0


# ---------------------------------------------------------------------------
# Contamination check
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def contamination_frames(spark):
    words = [f"w{i}" for i in range(20)]
    full = " ".join(words)  # 13 distinct 8-grams
    half = " ".join(words[:10] + [f"x{i}" for i in range(10)])
    clean = " ".join(f"y{i}" for i in range(20))
    corpus = spark.createDataFrame(
        [(1, full), (2, half), (3, clean)], "doc_id long, text string"
    )
    bench = spark.createDataFrame([(99, full)], "doc_id long, text string")
    return corpus, bench


def test_contamination_fractions(spark, contamination_frames):
    corpus, bench = contamination_frames
    out = {
        r["doc"]: r
        for r in contamination_check(corpus, bench, "doc_id", "text", n=8).collect()
    }
    assert out[1]["contamination"] == 1.0  # identical to a benchmark doc
    # doc 2 shares exactly the 3 8-grams fully inside words[:10]
    assert out[2]["n_hit"] == 3
    assert out[2]["n_shingles"] == 13
    assert out[3]["contamination"] == 0.0  # disjoint vocabulary
    assert out[3]["n_hit"] == 0


def test_contamination_short_doc_dropped(spark, contamination_frames):
    _, bench = contamination_frames
    short = spark.createDataFrame([(7, "too short")], "doc_id long, text string")
    # < n tokens -> no shingles -> no report row (not a 0/0 division)
    assert contamination_check(short, bench, "doc_id", "text", n=8).count() == 0


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def test_bm25_matches_closed_form(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark shuffle"),
            (2, "spark join merge sort"),
            (3, "sort merge only here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc"]: r for r in bm25_scores(docs, "doc_id", "text", ["spark"]).collect()
    }
    assert set(rows) == {1, 2}
    n, avgdl, df = 3.0, 4.0, 2.0
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def score(tf, dl):
        return idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert rows[1]["score"] == pytest.approx(round(score(3, 4), 6), abs=1e-6)
    assert rows[2]["score"] == pytest.approx(round(score(1, 4), 6), abs=1e-6)
    assert rows[1]["score"] > rows[2]["score"]  # higher tf wins at equal dl


def test_bm25_orders_and_limits(spark):
    docs = spark.createDataFrame(
        [(i, "alpha " + "pad " * i) for i in range(1, 6)],
        "doc_id long, text string",
    )
    top = bm25_scores(docs, "doc_id", "text", ["alpha"], top_k=2).collect()
    assert len(top) == 2
    # shortest doc scores highest (length normalisation)
    assert top[0]["doc"] == 1
    assert top[0]["score"] >= top[1]["score"]


def test_bm25_rejects_empty_query(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="query term"):
        bm25_scores(docs, "doc_id", "text", [])


# ---------------------------------------------------------------------------
# FuzzyLinker
# ---------------------------------------------------------------------------


def test_fuzzy_linker_blocked_edit_distance(spark):
    left = spark.createDataFrame(
        [(1, "acme corp", "uk"), (2, "zzzz ltd", "uk"), (3, "acme corp", "fr")],
        "id long, name string, country string",
    )
    right = spark.createDataFrame(
        [(10, "acme corp", "uk"), (11, "acme gorp", "uk"), (12, "acme corp", "de")],
        "id long, name string, country string",
    )
    linker = FuzzyLinker(
        left_id="id", right_id="id", field="name", blocking=["country"],
        max_distance=1,
    )
    edges = {(r["left_id"], r["right_id"]): r["score"]
             for r in linker.link(left, right).collect()}
    # same block, distance 0 and 1; cross-country pairs blocked out
    assert set(edges) == {(1, 10), (1, 11)}
    assert edges[(1, 10)] == 1.0
    assert edges[(1, 11)] == pytest.approx(round(1.0 - 1.0 / 9.0, 6), abs=1e-6)


def test_fuzzy_linker_requires_blocking():
    with pytest.raises(ValueError, match="blocking"):
        FuzzyLinker(left_id="id", right_id="id", field="name", blocking=[])


def test_fuzzy_linker_requires_field():
    with pytest.raises(ValueError, match="field"):
        FuzzyLinker(left_id="id", right_id="id", blocking=["b"])


# ---------------------------------------------------------------------------
# C4-style line dedup
# ---------------------------------------------------------------------------


def test_dedupe_lines_keeps_first_occurrence(spark):
    from matchbox_spark.operators.curation import dedupe_lines

    docs = spark.createDataFrame(
        [
            (1, "alpha\nshared footer\nbeta"),
            (2, "gamma\nshared footer\ndelta"),
            (3, "shared footer"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in dedupe_lines(docs, "doc_id", "text").collect()}
    assert out[1]["text"] == "alpha\nshared footer\nbeta"  # first keeps all
    assert out[2]["text"] == "gamma\ndelta"  # footer dropped, order kept
    assert out[2]["n_dropped"] == 1
    assert out[3]["text"] == ""  # fully-duplicate doc collapses to empty
    assert out[3]["n_kept"] == 0 and out[3]["n_dropped"] == 1


def test_dedupe_lines_intra_doc_duplicates(spark):
    from matchbox_spark.operators.curation import dedupe_lines

    docs = spark.createDataFrame(
        [(7, "x\ny\nx\nz\nx")], "doc_id long, text string"
    )
    row = dedupe_lines(docs, "doc_id", "text").first()
    # repeated line inside ONE doc also dedupes to its first position
    assert row["text"] == "x\ny\nz"
    assert row["n_kept"] == 3 and row["n_dropped"] == 2


# ---------------------------------------------------------------------------
# Plan shapes (100x-scale lens): broadcast where a broadcast belongs,
# no cartesian anywhere
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_contamination_benchmark_side_broadcasts(spark, sf_dir):
    from pyspark.sql import functions as F

    from matchbox_spark.operators.dedup import contamination_check

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = contamination_check(
        d.where(F.col("source") != "src0"),
        d.where(F.col("source") == "src0"),
        "doc_id", "text", n=8,
    )
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bm25_stats_broadcast_no_corpus_shuffle_on_term(spark, sf_dir):
    df = bm25_scores(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        "doc_id", "text", ["hash", "merge"],
    )
    plan = _plan(df)
    # stats and per-term dfs join broadcast; only doc-keyed exchanges remain
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2
    assert "CartesianProduct" not in plan


def test_fuzzy_linker_is_hash_join_not_nested_loop(spark, sf_dir):
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    linker = FuzzyLinker(
        left_id="s_suppkey", right_id="s_suppkey", field="s_name",
        blocking=["s_nationkey"], max_distance=1,
    )
    plan = _plan(linker.link(s, s))
    # the blocking equality is the join key; levenshtein is a post-filter
    assert "Join" in plan and "CartesianProduct" not in plan
    assert "levenshtein" in plan.lower()


# ---------------------------------------------------------------------------
# Salted aggregation
# ---------------------------------------------------------------------------


def test_salted_agg_matches_plain_agg_on_skewed_data(spark):
    from matchbox_spark.operators.skew import salted_agg

    # one viral key (90% of rows) + a long tail
    rows = [(0, i, float(i % 7)) for i in range(900)]
    rows += [(k, 1000 + k * 10 + j, float(j)) for k in range(1, 21) for j in range(5)]
    df = spark.createDataFrame(rows, "key long, event long, v double")
    salted = {
        r["key"]: r
        for r in salted_agg(
            df,
            ["key"],
            {"n": ("*", "count"), "s": ("v", "sum"),
             "mn": ("v", "min"), "mx": ("v", "max")},
            n_salts=8,
            salt_expr=F.pmod(F.xxhash64("event"), F.lit(8)),
        ).collect()
    }
    plain = {
        r["key"]: r
        for r in df.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k]["n"] == plain[k]["n"]
        assert salted[k]["s"] == pytest.approx(plain[k]["s"])
        assert salted[k]["mn"] == plain[k]["mn"]
        assert salted[k]["mx"] == plain[k]["mx"]


def test_salted_agg_spreads_hot_key_across_salts(spark):
    from matchbox_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [(0, i, 1.0) for i in range(800)], "key long, event long, v double"
    )
    # the partial stage must see the hot key split into many sub-groups
    salt = F.pmod(F.xxhash64("event"), F.lit(16))
    partial = (
        df.withColumn("_salt", salt).groupBy("key", "_salt").count()
    )
    assert partial.count() == 16  # all 16 salt buckets hit for the hot key
    out = salted_agg(
        df, ["key"], {"n": ("*", "count")}, n_salts=16, salt_expr=salt
    ).first()
    assert out["n"] == 800


def test_salted_agg_rejects_non_algebraic():
    from matchbox_spark.operators.skew import salted_agg

    with pytest.raises(ValueError, match="unsupported"):
        salted_agg(None, ["k"], {"a": ("v", "avg")})


# ---------------------------------------------------------------------------
# Duplicated-span removal (MassiveText exact-substring pass)
# ---------------------------------------------------------------------------


def test_span_dedupe_excises_repeated_span(spark):
    from matchbox_spark.operators.dedup import span_dedupe

    slogan = " ".join(f"s{i}" for i in range(15))  # 15-word repeated span
    docs = spark.createDataFrame(
        [
            (1, "a b c " + slogan),
            (2, "x y z " + slogan + " tail words here"),
            (3, "totally unique text with no repeats at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc"]: r for r in span_dedupe(docs, "doc_id", "text").collect()}
    # first occurrence keeps the slogan verbatim
    assert out[1]["text"] == "a b c " + slogan
    assert out[1]["n_dropped"] == 0
    # later occurrence loses exactly the slogan, boundary words survive
    assert out[2]["text"] == "x y z tail words here"
    assert out[2]["n_dropped"] == 15
    # untouched document passes through
    assert out[3]["n_dropped"] == 0


def test_span_dedupe_short_docs_pass_through(spark):
    from matchbox_spark.operators.dedup import span_dedupe

    docs = spark.createDataFrame(
        [(1, "short doc"), (2, "short doc")], "doc_id long, text string"
    )
    out = {r["doc"]: r for r in span_dedupe(docs, "doc_id", "text").collect()}
    # under 13 tokens -> no grams -> nothing ever removed (by design: the
    # pass targets long repeated spans; exact whole-doc dedup is d1/d6)
    assert out[1]["n_dropped"] == 0 and out[2]["n_dropped"] == 0


def test_span_dedupe_fully_duplicate_doc_collapses(spark):
    from matchbox_spark.operators.dedup import span_dedupe

    body = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, body), (2, body)], "doc_id long, text string"
    )
    out = {r["doc"]: r for r in span_dedupe(docs, "doc_id", "text").collect()}
    assert out[1]["text"] == body
    assert out[2]["text"] == "" and out[2]["n_kept"] == 0


# ---------------------------------------------------------------------------
# Sliding-window chunking
# ---------------------------------------------------------------------------


def test_chunk_documents_windows_and_overlap(spark):
    from matchbox_spark.operators.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        (r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(df, "doc_id", "text", size=4, overlap=1).collect()
    )
    # stride 3: starts 0,3,6,9 -> windows [0:4],[3:7],[6:10],[9:10]
    assert chunks == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w3 w4 w5 w6", 4),
        (2, "w6 w7 w8 w9", 4),
        (3, "w9", 1),
    ]
    # consecutive chunks share exactly `overlap` tokens
    assert chunks[0][1].split()[-1] == chunks[1][1].split()[0]


def test_chunk_documents_short_and_empty(spark):
    from matchbox_spark.operators.curation import chunk_documents

    df = spark.createDataFrame(
        [(1, "only three words"), (2, "   ")], "doc_id long, text string"
    )
    out = chunk_documents(df, "doc_id", "text", size=32, overlap=8).collect()
    assert len(out) == 1  # empty doc yields no chunks
    assert out[0]["doc"] == 1 and out[0]["n_tokens"] == 3


def test_chunk_documents_validates_params(spark):
    import pytest as _pt

    from matchbox_spark.operators.curation import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pt.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", size=8, overlap=8)
