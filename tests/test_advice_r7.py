"""Pins for the round-6 ADVICE fixes (applied in round 7).

1. bloom_contains / cms_estimate verdicts join back ON THE KEY, not a
   nondeterministic monotonically_increasing_id — duplicate keys and
   shuffled probes get correct verdicts.
2. mixture_sample targets use exact decimal arithmetic (0.29·100 = 29,
   not the float-truncated 28).
3. splink_sql_to_spark rejects the type-ambiguous bare ``len(``.
4. streaming_kmv_distinct raises on awaitTermination timeout (signature
   pin only — a real timeout needs a hung source).
5. dsir_logweights emits (n_feats=0, logw=0.0) rows for bigram-less docs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_bloom_contains_duplicate_and_shuffled_probe(spark):
    """Verdicts are a pure function of the key: duplicate probe keys all
    get the same flag, present keys are NEVER false-negative even when
    the probe plan contains a shuffle."""
    from matchbox_spark.operators.sketches import bloom_build, bloom_contains

    build = spark.createDataFrame([(i,) for i in range(100)], "k long")
    bloom = bloom_build(build, "k", m_bits=4096, k_hashes=3)
    # probe with duplicates, a shuffle (repartition), and NULLs
    probe = spark.createDataFrame(
        [(i % 150,) for i in range(600)] + [(None,)] * 3, "k long"
    ).repartition(7, "k")
    out = bloom_contains(probe, bloom, "k", m_bits=4096, k_hashes=3)
    rows = out.collect()
    assert len(rows) == 603
    by_key: dict = {}
    for r in rows:
        by_key.setdefault(r["k"], set()).add(r["bloom_pass"])
    # every duplicate key agrees with itself
    assert all(len(v) == 1 for v in by_key.values())
    # no false negatives for built keys; NULL is always False
    assert all(by_key[i] == {True} for i in range(100))
    assert by_key[None] == {False}


def test_cms_estimate_duplicate_keys_consistent(spark):
    from matchbox_spark.operators.sketches import cms_build, cms_estimate

    data = spark.createDataFrame(
        [(i % 10,) for i in range(1000)], "k long"
    )
    cms = cms_build(data, "k", width=512, depth=3)
    probe = spark.createDataFrame(
        [(i % 12,) for i in range(120)], "k long"
    ).repartition(5, "k")
    out = cms_estimate(probe, cms, "k", width=512, depth=3).collect()
    assert len(out) == 120
    by_key: dict = {}
    for r in out:
        by_key.setdefault(r["k"], set()).add(r["est_count"])
    assert all(len(v) == 1 for v in by_key.values())
    # CMS never undercounts: true count of each present key is 100
    assert all(next(iter(by_key[i])) >= 100 for i in range(10))


def test_mixture_sample_non_dyadic_weight_targets(spark):
    """floor(100 · 0.29) = 29 — the float-truncated 28 is the ADVICE bug."""
    from matchbox_spark.operators.curation import mixture_sample

    docs = spark.createDataFrame(
        [(i, "a", 1) for i in range(200)],
        "doc_id long, source string, n_tokens long",
    )
    out = mixture_sample(docs, {"a": 0.29}, 100)
    # each doc is 1 token, so admitted count == target == floor(29.0)
    assert out.count() == 29


def test_splink_len_rejected():
    from matchbox_spark.operators.probabilistic import splink_sql_to_spark

    with pytest.raises(ValueError, match="ambiguous"):
        splink_sql_to_spark('len(l."name") > 3')
    # unambiguous spellings still transpile
    assert (
        "size(array_intersect"
        in splink_sql_to_spark(
            'array_length(list_intersect(l."tags", r."tags")) >= 2'
        )
    )
    assert "length(" in splink_sql_to_spark('length(l."name") > 3')


def test_streaming_kmv_timeout_contract():
    """The drain must check awaitTermination's boolean — pin the raise
    path exists (source-level check; a live hang needs an unbounded
    source)."""
    import inspect

    from matchbox_spark.streaming.sketches import streaming_kmv_distinct

    src = inspect.getsource(streaming_kmv_distinct)
    assert "if not q.awaitTermination(timeout)" in src
    assert "TimeoutError" in src


def test_dsir_short_docs_get_zero_rows(spark):
    from matchbox_spark.operators.curation import dsir_logweights

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps", "en"),
            (2, "solo", "en"),          # 1 token -> no bigrams
            (3, "", "fr"),              # 0 tokens
            (4, "der schnelle braune fuchs", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    out = dsir_logweights(docs, F.col("lang") == "en", n_buckets=64)
    rows = {r["doc"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["n_feats"] == 0 and rows[2]["logw"] == 0.0
    assert rows[3]["n_feats"] == 0 and rows[3]["logw"] == 0.0
    assert rows[1]["n_feats"] == 4
