"""Curation operators: sequence packing + stratified/quota sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.curation import (
    pack_documents,
    quota_rebalance,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_pack_documents_respects_budget_rule(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(10)], "doc_id long, n_tokens long"
    )
    out = pack_documents(
        df, "doc_id", "n_tokens", budget=250, n_shards=1,
        shard_expr=F.lit(0),
    ).orderBy("doc_id")
    rows = out.collect()
    # exclusive cumsum: docs 0,1,2 (0,100,200) → pack 0; 3,4 (300,400) →
    # pack 1; 5,6,7 → pack 2; 8,9 → pack 3
    assert [r["pack"] for r in rows] == [0, 0, 0, 1, 1, 2, 2, 2, 3, 3]
    # pack_id embeds the shard
    assert all(r["pack_id"] == r["pack"] for r in rows)


def test_pack_documents_oversized_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(0, 50), (1, 9000), (2, 50)], "doc_id long, n_tokens long"
    )
    out = {
        r["doc_id"]: r["pack"]
        for r in pack_documents(
            df, "doc_id", "n_tokens", budget=100, n_shards=1,
            shard_expr=F.lit(0),
        ).collect()
    }
    assert out[0] == 0
    assert out[1] == 0  # starts within budget (50 tokens before it)
    assert out[2] > out[1]  # the giant pushed the next doc far ahead


def test_pack_documents_partitions_all_docs(docs):
    from matchbox_spark.functions.text import token_count_expr

    d = docs.select("doc_id", token_count_expr("text").alias("n_tokens"))
    out = pack_documents(d, "doc_id", "n_tokens", budget=512, n_shards=8)
    assert out.count() == d.count()
    assert out.select("shard").distinct().count() <= 8
    # per (shard, pack) token totals: every pack except possibly the last of
    # each shard starts below budget (exclusive rule allows overflow only
    # via its final doc)
    first_tokens = (
        out.groupBy("shard", "pack")
        .agg(F.sum("n_tokens").alias("tot"), F.count("*").alias("n"))
    )
    assert first_tokens.count() > 1


def test_stratified_sample_deterministic_and_balanced(docs):
    d = docs.select("doc_id", "lang")
    a = stratified_sample(d, ["lang"], 5, "doc_id")
    b = stratified_sample(d, ["lang"], 5, "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    per = a.groupBy("lang").count().collect()
    n_langs = d.select("lang").distinct().count()
    assert len(per) == n_langs
    assert all(r["count"] <= 5 for r in per)


def test_quota_rebalance_caps_each_stratum(docs):
    d = docs.select("doc_id", "source")
    out = quota_rebalance(
        d, ["source"], {"web": 10, "wiki": 3}, "doc_id", default_quota=1
    )
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert per.get("web", 0) <= 10
    assert per.get("wiki", 0) <= 3
    for src, n in per.items():
        if src not in ("web", "wiki"):
            assert n <= 1


def test_quota_rebalance_empty_string_stratum(spark):
    # '' is a legitimate stratum key: its configured quota applies (it must
    # not fall through to default_quota)
    d = spark.createDataFrame(
        [(i, "" if i < 6 else "web") for i in range(10)],
        "doc_id long, source string",
    )
    out = quota_rebalance(
        d, ["source"], {"": 2, "web": 1}, "doc_id", default_quota=0
    )
    per = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
    assert per == {"": 2, "web": 1}
    # and an empty quota dict means every stratum uses default_quota
    none = quota_rebalance(d, ["source"], {}, "doc_id", default_quota=1)
    assert none.count() == 2


def test_quota_rebalance_subset_of_stratified(docs):
    # quota sampling with uniform quotas == stratified sampling
    d = docs.select("doc_id", "source")
    strata = [r["source"] for r in d.select("source").distinct().collect()]
    uniform = quota_rebalance(
        d, ["source"], {s: 4 for s in strata}, "doc_id"
    ).select("doc_id", "source")
    strat = stratified_sample(d, ["source"], 4, "doc_id").select(
        "doc_id", "source"
    )
    assert sorted(map(tuple, uniform.collect())) == sorted(
        map(tuple, strat.collect())
    )


def test_dsir_logweights_favours_target_like_docs(spark):
    """Documents sharing the target subset's bigrams score higher than
    off-domain documents; weights are finite and deterministic."""
    from pyspark.sql import functions as F

    from matchbox_spark.operators.curation import dsir_logweights

    rows = []
    for i in range(20):
        rows.append((i, "the quick brown fox jumps over dogs", "en"))
    for i in range(20, 40):
        rows.append((i, "der schnelle braune fuchs springt hoch", "de"))
    # raw-only docs: two resembling the target, two off-domain
    rows += [
        (100, "the quick brown fox runs", "xx"),
        (101, "quick brown fox jumps again", "xx"),
        (102, "der schnelle braune fuchs ist da", "xx"),
        (103, "ein ganz anderes thema heute", "xx"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {
        r["doc"]: r["logw"]
        for r in dsir_logweights(docs, F.col("lang") == "en").collect()
    }
    assert out[100] > out[102] and out[101] > out[103]
    run2 = {
        r["doc"]: r["logw"]
        for r in dsir_logweights(docs, F.col("lang") == "en").collect()
    }
    assert out == run2  # deterministic


def test_dsir_validation(spark):
    from pyspark.sql import functions as F

    from matchbox_spark.operators.curation import dsir_logweights

    docs = spark.createDataFrame([(1, "a b", "en")], "doc_id long, text string, lang string")
    import pytest as _pt

    with _pt.raises(ValueError):
        dsir_logweights(docs, F.col("lang") == "en", n_buckets=1)


def test_mixture_sample_budget_and_determinism(spark):
    """Per-source token targets respected (inclusive-prefix semantics),
    sources absent from weights dropped, stable under re-run."""
    import pyspark.sql.functions as F

    from matchbox_spark.operators.curation import mixture_sample

    rows = [(i, "a" if i < 50 else "b", 10) for i in range(100)] + [
        (200 + i, "c", 10) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = mixture_sample(
        df, {"a": 0.6, "b": 0.4}, token_budget=100,
        source_col="source", id_col="doc_id", tokens_col="n_tokens",
    )
    got = out.collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append(r)
    # a: target 60 → 6 docs of 10; b: target 40 → 4 docs; c dropped
    assert len(by_src["a"]) == 6 and len(by_src["b"]) == 4
    assert "c" not in by_src
    assert max(r["cum_tokens"] for r in by_src["a"]) == 60
    # deterministic: same picks on re-run
    again = sorted(map(tuple, out.collect()))
    assert sorted(map(tuple, got)) == again
    # refusal point: a doc crossing the target line excludes the tail
    big = spark.createDataFrame(
        [(1, "a", 70), (2, "a", 70), (3, "a", 10)],
        "doc_id long, source string, n_tokens long",
    )
    kept = mixture_sample(
        big, {"a": 1.0}, token_budget=100,
        source_col="source", id_col="doc_id", tokens_col="n_tokens",
    ).count()
    assert kept == 1  # first 70 fits; second crosses; tail refused

    import pytest as _pytest
    with _pytest.raises(ValueError, match="token_budget"):
        mixture_sample(df, {"a": 1.0}, -1)
    with _pytest.raises(ValueError, match="negative"):
        mixture_sample(df, {"a": -0.5}, 100)
