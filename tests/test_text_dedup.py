"""Tests for text analysis + large-scale dedup operators on real documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.functions import text as TX
from matchbox_spark.functions.vectors import cosine_expr
from matchbox_spark.operators import dedup as DD
from matchbox_spark.operators.similarity import ann_topk, cosine_topk


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Synthetic corpus with known near-duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "near the warm fire and the birds sing in the tall green trees"
    )
    variant = base.replace("lazy dog", "lazy hound")  # near-dup of 0
    unrelated = (
        "completely different content about spark dataframes shuffles and "
        "partitions running on large clusters with many executors"
    )
    return spark.createDataFrame(
        [(0, base), (1, base), (2, variant), (3, unrelated)],
        "doc_id long, text string",
    )


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("Hello  World foo",), ("",)], "t string")
    out = df.select(
        TX.token_count_expr("t").alias("n"),
        TX.tokens_expr("t").alias("toks"),
    ).collect()
    assert out[0]["n"] == 3 and out[0]["toks"] == ["hello", "world", "foo"]
    assert out[1]["n"] == 0


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    out = df.select(TX.word_shingles_expr("t", 3).alias("s")).collect()
    assert out[0]["s"] == ["a b c", "b c d"]
    assert out[1]["s"] == []


LANG_FIXTURE = [
    # Note: the testdata `lang` column is a random label over one shared
    # vocabulary (verified by inspection) — unrecoverable by any classifier —
    # so lang-id accuracy pins on genuine multilingual sentences instead.
    ("en", "the cat sat on a mat and it is happy for now"),
    ("en", "this is not what they said when we were there at all"),
    ("en", "all of the results have been published for review"),
    ("de", "der hund ist nicht in das haus und die katze ist zu alt"),
    ("de", "die ergebnisse werden nach der prüfung veröffentlicht"),
    ("de", "er ist mit dem zug über die große brücke gefahren"),
    ("fr", "le chat est dans la maison et les oiseaux sont pour un jour"),
    ("fr", "nous sommes dans une situation qui ne peut pas durer"),
    ("fr", "elle est venue avec son frère pour être sûre du résultat"),
    ("es", "el perro es un animal y la casa es una de los grandes"),
    ("es", "no hay nada más importante que la salud según el señor"),
    ("es", "cuando llegamos a la ciudad ya era muy tarde para todo"),
    ("pt", "o cachorro não está em casa mas a cidade é muito bonita"),
    ("pt", "não há nada que ele não possa fazer quando está feliz"),
    ("pt", "as informações são boas e estão disponíveis para todos"),
    ("it", "il cane è nella casa e anche i gatti sono più felici"),
    ("it", "non c'è niente di meglio che una giornata al mare con gli amici"),
    ("it", "questo è il momento di dire la verità alla gente del paese"),
    ("nl", "de hond is niet in het huis en de kat is ook niet te zien"),
    ("nl", "er zijn veel mensen die met de trein naar het werk gaan"),
    ("nl", "dat is een goed voorbeeld van wat er kan worden gedaan"),
    ("zh", "这是一个很好的人我们都不知道他在哪里有的是时间"),
    ("zh", "我们的朋友在北京工作了很多年现在回来了"),
    ("ja", "これはとても良い本ですが私はまだ読んでいません"),
    ("ja", "東京の天気は今日はとても良いですね"),
    ("ko", "오늘 날씨가 정말 좋아서 공원에 산책하러 갔어요"),
    ("ko", "한국어는 배우기 어렵지만 재미있는 언어입니다"),
    ("ru", "сегодня хорошая погода и мы идём гулять в парк"),
    ("ru", "это очень интересная книга о истории россии"),
    ("ar", "هذا كتاب جيد جدا ولكن لم أقرأه بعد"),
    ("ar", "الطقس جميل اليوم وسنذهب إلى الحديقة"),
    ("el", "ο καιρός είναι πολύ καλός σήμερα και πάμε στο πάρκο"),
    ("hi", "आज मौसम बहुत अच्छा है और हम पार्क जा रहे हैं"),
    ("th", "วันนี้อากาศดีมากเราจะไปเดินเล่นที่สวน"),
    ("he", "מזג האוויר יפה היום ואנחנו הולכים לפארק"),
]


def test_lang_id_accuracy_multilingual_fixture(spark):
    """Pins the heuristic's billing: ≥0.9 accuracy across 15 languages —
    script detection is decisive for the 9 non-Latin scripts; function-word
    profiles + marker characters separate the Latin pack (incl. pt vs es)."""
    df = spark.createDataFrame(LANG_FIXTURE, "lang string, text string")
    out = df.select("lang", TX.lang_id_expr("text").alias("pred")).collect()
    hits = sum(1 for r in out if r["pred"] == r["lang"])
    acc = hits / len(out)
    misses = [(r["lang"], r["pred"]) for r in out if r["pred"] != r["lang"]]
    assert acc >= 0.9, f"accuracy {acc:.2f}; misses: {misses}"
    # the non-Latin scripts must be PERFECT — the block is the discriminator
    non_latin = {"zh", "ja", "ko", "ru", "ar", "el", "hi", "th", "he"}
    for r in out:
        if r["lang"] in non_latin:
            assert r["pred"] == r["lang"], f"{r['lang']} → {r['pred']}"


def test_lang_id_undetermined_and_empty(spark):
    df = spark.createDataFrame(
        [("xq zzz qqq vvv",), ("",), ("12345 67890",)], "text string"
    )
    out = [r["p"] for r in df.select(TX.lang_id_expr("text").alias("p")).collect()]
    assert out == ["und", "und", "und"]


def test_quality_and_fingerprint(docs):
    out = docs.select(
        TX.quality_score_expr("text").alias("q"),
        TX.fingerprint_expr("text").alias("fp"),
    )
    row = out.agg(
        F.min("q").alias("qmin"), F.max("q").alias("qmax"),
        F.count(F.when(F.length("fp") == 64, 1)).alias("fps"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert 0.0 <= row["qmin"] <= row["qmax"] <= 1.0
    assert row["fps"] == row["n"]


def test_exact_dedupe(spark):
    df = spark.createDataFrame(
        [(1, "Same  text"), (2, "same text"), (3, "other")],
        "doc_id long, text string",
    )
    groups = DD.exact_duplicate_groups(df, "doc_id", "text")
    reps = {
        r["representative"]: r["n_docs"] for r in groups.collect()
    }
    assert reps == {1: 2, 3: 1}  # normalisation folds case/whitespace
    kept = DD.exact_dedupe(df, "doc_id", "text")
    assert {r["doc_id"] for r in kept.collect()} == {1, 3}


def test_ngram_jaccard_pairs(near_dup_docs):
    out = DD.ngram_jaccard_pairs(
        near_dup_docs, "doc_id", "text", n=3, threshold=0.5
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_ngram_jaccard_max_shingle_freq(spark):
    """The stop-shingle cap drops ubiquitous shingles BEFORE per-doc sizes
    are counted (the jaccard denominators must reflect the filtered edge
    list — the invariant the posting-list rewrite has to preserve)."""
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "a x y")],
        "doc_id long, text string",
    )
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=1, threshold=0.0, max_shingle_freq=2
        ).collect()
    }
    # 'a' (freq 3) drops: sizes become 2/2/2; only (1,2) share 'b' →
    # jaccard 1/(2+2-1) = 1/3; the (1,3)/(2,3) pairs vanish entirely
    assert capped == {(1, 2): round(1 / 3, 6)}
    uncapped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(
            docs, "doc_id", "text", n=1, threshold=0.0
        ).collect()
    }
    assert uncapped == {
        (1, 2): 0.5,
        (1, 3): 0.2,
        (2, 3): 0.2,
    }


def test_minhash_lsh_finds_near_dups(near_dup_docs):
    cands = DD.minhash_lsh_candidates(
        near_dup_docs, "doc_id", "text", num_perm=32, bands=8
    )
    cand_pairs = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    assert (0, 1) in cand_pairs and (0, 2) in cand_pairs

    verified = DD.minhash_dedupe_pairs(
        near_dup_docs, "doc_id", "text", num_perm=32, bands=8, threshold=0.5
    )
    vpairs = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert (0, 1) in vpairs and (0, 2) in vpairs
    assert not any(3 in p for p in vpairs)


def test_simhash_near_duplicates(near_dup_docs):
    sims = DD.simhash_values(near_dup_docs, "doc_id", "text")
    vals = {r["doc"]: r["simhash"] for r in sims.collect()}
    assert vals[0] == vals[1]  # identical docs → identical simhash
    assert 0 <= vals[0] < (1 << 16)

    out = DD.simhash_near_duplicates(
        near_dup_docs, "doc_id", "text", max_hamming=3
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs and (1, 3) not in pairs and (2, 3) not in pairs


def test_cosine_topk_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(3)
    out = cosine_topk(emb, q, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query"], []).append(r)
    for qid, nbrs in by_q.items():
        assert [r["rank"] for r in sorted(nbrs, key=lambda r: r["rank"])] == [
            1, 2, 3, 4, 5,
        ]
        scores = [r["cosine"] for r in sorted(nbrs, key=lambda r: r["rank"])]
        assert scores == sorted(scores, reverse=True)
        assert all(r["neighbor"] != qid for r in nbrs)


def test_ann_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(10)
    exact = cosine_topk(emb, q, k=5)
    approx = ann_topk(emb, q, k=5, bucket_dims=[0, 1, 2, 3])
    e = {(r["query"], r["neighbor"]) for r in exact.collect()}
    a = {(r["query"], r["neighbor"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, f"ANN recall collapsed: {recall}"


def test_embedding_near_duplicates_bucketed_vs_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.5, 0.2]),
        (1, [1.0, 0.01, 0.5, 0.2]),   # near-dup of 0
        (2, [-1.0, 0.5, -0.5, 0.9]),  # unrelated
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = DD.embedding_near_duplicates(df, "vec_id", "embedding", 0.99)
    bucketed = DD.embedding_near_duplicates(
        df, "vec_id", "embedding", 0.99, bucket_dims=[0, 1, 2, 3]
    )
    assert {(r["doc_a"], r["doc_b"]) for r in exact.collect()} == {(0, 1)}
    assert {(r["doc_a"], r["doc_b"]) for r in bucketed.collect()} == {(0, 1)}


def test_winnowing_fingerprints(spark):
    from matchbox_spark.functions.text import winnowing_fingerprints_expr

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "THE QUICK  brown fox jumps over the lazy dog"),  # normalises equal
            (3, "a completely different sentence with other words"),
            (4, "xy"),  # shorter than k
        ],
        "id long, text string",
    )
    out = {
        r["id"]: set(r["fp"])
        for r in df.select(
            "id", winnowing_fingerprints_expr("text", k=5, window=4).alias("fp")
        ).collect()
    }
    assert out[1] == out[2]  # whitespace/case-insensitive identity
    assert out[1] != out[3]
    assert out[4] == set()  # too short for any k-gram
    # guarantee: docs sharing a long substring share at least one fingerprint
    df2 = spark.createDataFrame(
        [(10, "prefix AAA the quick brown fox ZZZ"), (11, "other the quick brown fox tail")],
        "id long, text string",
    )
    o2 = {
        r["id"]: set(r["fp"])
        for r in df2.select(
            "id", winnowing_fingerprints_expr("text", k=5, window=4).alias("fp")
        ).collect()
    }
    assert o2[10] & o2[11]


def test_ivf_topk_recall(spark, sf_dir):
    from matchbox_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(10)
    exact = {(r["query"], r["neighbor"]) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {
        (r["query"], r["neighbor"])
        for r in ivf_topk(emb, q, k=5, n_lists=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall collapsed: {recall}"


def test_ivf_topk_hashed_deterministic_and_sane(spark, sf_dir):
    from matchbox_spark.operators.similarity import cosine_topk, ivf_topk_hashed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.limit(10)
    run1 = {
        (r["query"], r["neighbor"])
        for r in ivf_topk_hashed(emb, q, k=5, n_lists=8, n_probe=4).collect()
    }
    run2 = {
        (r["query"], r["neighbor"])
        for r in ivf_topk_hashed(emb, q, k=5, n_lists=8, n_probe=4).collect()
    }
    assert run1 == run2  # seedless determinism — same data, same answer
    exact = {(r["query"], r["neighbor"]) for r in cosine_topk(emb, q, k=5).collect()}
    recall = len(exact & run1) / len(exact)
    assert recall >= 0.4, f"hashed-IVF recall collapsed: {recall}"


def test_exact_cosine_pairs(spark):
    from matchbox_spark.operators.similarity import exact_cosine_pairs

    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.0]),
            (3, [0.0, 1.0]),
            (4, [0.8, 0.6]),
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in exact_cosine_pairs(df, threshold=0.7).collect()
    }
    # (1,2) identical; (1,4)/(2,4) cos=0.8; (3,4) cos=0.6 < threshold; no self
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    assert got[(1, 2)] == 1.0 and abs(got[(1, 4)] - 0.8) < 1e-9
    # dot-only path agrees on unit vectors
    dot = {
        (r["id_a"], r["id_b"])
        for r in exact_cosine_pairs(df, 0.7, assume_normalized=True).collect()
    }
    assert dot == set(got)


def test_exact_cosine_pairs_string_ids(spark):
    """UUID-style string ids order with `<` and survive end-to-end — a
    numeric cast would null them and silently drop every pair."""
    from matchbox_spark.operators.similarity import exact_cosine_pairs

    df = spark.createDataFrame(
        [
            ("b-uuid", [1.0, 0.0]),
            ("a-uuid", [1.0, 0.0]),
            ("c-uuid", [0.0, 1.0]),
        ],
        "vec_id string, embedding array<double>",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in exact_cosine_pairs(df, threshold=0.9).collect()
    }
    assert pairs == {("a-uuid", "b-uuid")}


def test_repetition_stats_handcrafted(spark):
    from matchbox_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab×3, ba×2 → top 3/5; trigrams all dup
            (2, "x y z w"),       # no repeats: top 1/3, dup 0
            (3, "solo"),          # too short: 0/0 → 0.0
        ],
        "doc_id long, text string",
    )
    got = {r["doc"]: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert got[1]["top_bigram_frac"] == 0.6
    assert got[1]["dup_trigram_frac"] == 1.0
    assert round(got[2]["top_bigram_frac"], 6) == round(1 / 3, 6)
    assert got[2]["dup_trigram_frac"] == 0.0
    assert got[3]["top_bigram_frac"] == 0.0 and got[3]["dup_trigram_frac"] == 0.0


def test_line_repetition_stats_handcrafted(spark):
    from matchbox_spark.functions.text import line_repetition_stats

    df = spark.createDataFrame(
        [
            # lines: aa,bb,aa,bb,cc (tot 5, dup 2; chars 2+2+2+2+2=10,
            # dup_chars 4); paragraphs: "aa\nbb\naa" and "bb\ncc" (unique)
            (1, "aa\nbb\naa\n\nbb\ncc"),
            # all-unique lines, one para
            (2, "xx\nyy"),
            # single line == single paragraph
            (3, "solo line"),
            # whole-paragraph duplicate: paras p×2,q (tot 3, dup 1;
            # chars 5+5+2, dup_chars 5); lines aa,bb,aa,bb,qq
            (4, "aa\nbb\n\naa\nbb\n\nqq"),
            # trailing/leading spaces trim away; blank-ish line drops
            (5, " aa \naa\n   \nbb"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc"]: r for r in line_repetition_stats(df, "doc_id", "text").collect()
    }
    assert got[1]["n_lines"] == 5
    assert got[1]["dup_line_frac"] == 0.4      # (5-3)/5
    assert got[1]["dup_line_char_frac"] == 0.4  # 4/10
    assert got[1]["dup_para_frac"] == 0.0
    assert got[2]["n_lines"] == 2
    assert got[2]["dup_line_frac"] == 0.0
    assert got[3]["n_lines"] == 1 and got[3]["dup_para_frac"] == 0.0
    assert got[4]["dup_para_frac"] == round(1 / 3, 6)
    assert got[4]["dup_para_char_frac"] == round(5 / 12, 6)
    assert got[4]["dup_line_frac"] == 0.4
    # doc 5: trimmed lines aa,aa,bb (the spaces-only line is dropped) —
    # pins that transform() gets a single-arg lambda (bare F.trim would
    # receive the element INDEX as its trim-character-set argument)
    assert got[5]["n_lines"] == 3
    assert got[5]["dup_line_frac"] == round(1 / 3, 6)


def test_minhash_capped_verification_matches_exact(near_dup_docs):
    # cap far above the doc shingle counts: sketches complete → exact path;
    # jaccard values must equal the uncapped (string-set) computation
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.minhash_dedupe_pairs(
            near_dup_docs, "doc_id", "text", num_perm=32, bands=8,
            threshold=0.5,
        ).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.minhash_dedupe_pairs(
            near_dup_docs, "doc_id", "text", num_perm=32, bands=8,
            threshold=0.5, max_verify_shingles=10_000,
        ).collect()
    }
    assert exact == capped


def test_minhash_capped_verification_long_docs(spark):
    # docs far wider than the cap: the KMV estimate must still separate a
    # planted near-dup (~0.8 true jaccard) from an unrelated doc
    words_a = [f"tok{i}" for i in range(3000)]
    words_b = words_a[:2700] + [f"alt{i}" for i in range(300)]
    words_c = [f"other{i}" for i in range(3000)]
    df = spark.createDataFrame(
        [(0, " ".join(words_a)), (1, " ".join(words_b)), (2, " ".join(words_c))],
        "doc_id long, text string",
    )
    out = DD.minhash_dedupe_pairs(
        df, "doc_id", "text", num_perm=32, bands=16, threshold=0.5,
        max_verify_shingles=256,
    )
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert (0, 1) in pairs
    assert 0.6 <= pairs[(0, 1)] <= 1.0  # KMV estimate near the true ~0.8
    assert not any(2 in p for p in pairs)


def test_int8_quantization_roundtrip_error_bound(spark, sf_dir):
    from matchbox_spark.functions.vectors import (
        dequantize_int8_expr,
        quantize_int8_expr,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(100)
    rt = e.select(
        "embedding",
        dequantize_int8_expr(quantize_int8_expr("embedding")).alias("dq"),
    )
    err = rt.select(
        F.max(
            F.aggregate(
                F.zip_with(
                    "embedding", "dq", lambda a, b: F.abs(a.cast("double") - b)
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
        ).alias("max_err")
    ).collect()[0]["max_err"]
    # half a quantisation step for in-range values
    assert err <= 0.5 / 127.0 + 1e-9


def test_relational_winnowing_equals_expr_form(spark):
    # including a degenerate doc shorter than k+window-1
    from matchbox_spark.functions.text import (
        winnowing_fingerprints,
        winnowing_fingerprints_expr,
    )

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy hound"),
            (3, "tiny"),
            (4, "sixchar"),
        ],
        "doc_id long, text string",
    )
    rel = {
        (r["doc"], r["fp"])
        for r in winnowing_fingerprints(df, "doc_id", "text").collect()
    }
    via_expr = {
        (r["doc_id"], r["fp"])
        for r in df.select(
            "doc_id",
            F.explode(winnowing_fingerprints_expr("text")).alias("fp"),
        ).collect()
    }
    assert rel == via_expr
    # shared substrings of >= k + window - 1 chars share a fingerprint
    d1 = {fp for d, fp in rel if d == 1}
    d2 = {fp for d, fp in rel if d == 2}
    assert d1 & d2


def test_ivf_pq_rerank_recall(spark, sf_dir):
    """IVF-PQ pins: (1) the exact re-rank of the ADC shortlist beats pure
    ADC ranking at identical settings; (2) rerank recall clears a floor;
    (3) kmeans-trained codebooks at m=8/codes=16 clear a higher floor —
    the quality ladder a serving deployment climbs."""
    from pyspark.sql import functions as F

    from matchbox_spark.operators.similarity import cosine_topk, ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 20 == 0)
    exact = {
        (r["query"], r["neighbor"]) for r in cosine_topk(emb, q, k=10).collect()
    }

    def recall(**kw):
        got = {
            (r["query"], r["neighbor"])
            for r in ivf_pq_topk(emb, q, k=10, **kw).collect()
        }
        return len(exact & got) / len(exact)

    adc_only = recall()
    reranked = recall(rerank=50)
    assert reranked > adc_only, (reranked, adc_only)
    assert reranked >= 0.3, reranked
    trained = recall(rerank=50, m_subspaces=8, n_codes=16, train_codebooks=True)
    assert trained >= 0.4, trained


def test_ivf_pq_code_compactness(spark, sf_dir):
    """The inverted lists carry codes, not vectors: the assigned frame's
    non-id payload is m ints + one norm (the PQ memory contract)."""
    from pyspark.sql import functions as F

    from matchbox_spark.operators.similarity import ivf_pq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") % 20 == 0)
    out = ivf_pq_topk(emb, q, k=5)
    assert out.columns == ["query", "neighbor", "approx_cosine", "rank"]
    rows = out.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query"], []).append(r["rank"])
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
