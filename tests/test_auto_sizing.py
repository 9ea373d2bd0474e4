"""Round-10 scale-safe defaults: the LSH-family parameters are derived
from the corpus, not shipped at the measured-degenerate demo values.

VERDICT r9 "What's wrong" #1: SimHash bits=16 goes quadratic by ~50k docs
(51× wall for 10× corpus at sf1) and 64 embedding buckets degenerate the
streaming delta to a 2.13× super-linear recompute — yet both were the
shipped defaults. These tests pin the sizing rules (small corpus keeps
demo sizing, large corpus auto-widens), the resolve-once freeze on model
instances, and the streaming guard (block keys must be batch-stable, so
auto raises in delta_block_keys until resolved)."""

from __future__ import annotations

import logging

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.dedup import (
    auto_embedding_bucket_dims,
    auto_simhash_bits,
)
from matchbox_spark.operators.lsh_linkers import (
    EmbeddingDeduper,
    EmbeddingLinker,
    SimHashDeduper,
)


# ---------------------------------------------------------------------------
# the sizing rules themselves (pure functions — the measured r9 cliffs)
# ---------------------------------------------------------------------------


def test_auto_simhash_bits_small_corpus_keeps_demo_sizing():
    # fixtures and small corpora: 4-bit chunks × (mh+1) = the 16-bit demo
    for n in (1, 10, 1000, 16384):
        assert auto_simhash_bits(n, max_hamming=3) == 16


def test_auto_simhash_bits_widens_at_the_measured_cliff():
    # the r9 sf1 probe showed 16 bits quadratic by ~50k docs — the rule
    # must have widened before then, and keep widening with the corpus
    assert auto_simhash_bits(50_000, max_hamming=3) >= 24
    assert auto_simhash_bits(600_000, max_hamming=3) >= 32  # sf1-good size
    big = auto_simhash_bits(100_000_000, max_hamming=3)
    assert big == 48  # signature cap (sha256-hex feature hash in a long)
    # monotone in corpus size
    sizes = [auto_simhash_bits(n, 3) for n in (10**3, 10**4, 10**5, 10**6)]
    assert sizes == sorted(sizes)


def test_auto_simhash_bits_respects_chunk_count():
    # every pigeonhole chunk must exist: bits >= max_hamming + 1, and the
    # per-chunk width stays >= min_chunk_bits until the 48-bit cap binds
    assert auto_simhash_bits(10, max_hamming=7) == 32  # 8 chunks × 4 bits
    assert auto_simhash_bits(10**9, max_hamming=7) == 48


def test_auto_minhash_bands_tracks_corpus():
    from matchbox_spark.operators.dedup import auto_minhash_bands

    # pinned derivations at j=0.9, 4 rows/band (docstring values):
    # bands = ceil(ln(0.01/n) / ln(1 - 0.9^4)), clamped to [8, 32]
    assert auto_minhash_bands(4_800) == 13
    assert auto_minhash_bands(360_000) == 17
    assert auto_minhash_bands(3_600_000) == 19  # the 12×300k tier sizing
    # tiny corpora keep the floor; the ceiling binds eventually
    assert auto_minhash_bands(10) == 8
    assert auto_minhash_bands(10**15) == 32
    # the measured round-13 failure: 8 fixed bands at 3.6M docs bounded
    # expected isolation at n·(1-0.9^4)^8 ≈ 690 docs (4 observed);
    # the derived 19 bands bound it below 0.01
    import math

    miss = 1 - 0.9 ** 4
    assert 3_600_000 * miss ** 8 > 1
    assert 3_600_000 * miss ** auto_minhash_bands(3_600_000) < 0.01
    with pytest.raises(ValueError):
        auto_minhash_bands(100, jaccard=1.0)


def test_auto_embedding_bucket_dims_tracks_corpus():
    # measured: 64 buckets over 36k vectors super-linear; 65,536 flat
    assert len(auto_embedding_bucket_dims(36_000, 64)) == 16
    # small fixtures keep small bucket spaces
    assert len(auto_embedding_bucket_dims(60, 64)) <= 6
    # the vector's dimensionality caps the usable sign bits
    assert auto_embedding_bucket_dims(10**9, 8) == list(range(8))
    # monotone
    ks = [len(auto_embedding_bucket_dims(n, 64)) for n in (100, 10**4, 10**6)]
    assert ks == sorted(ks)


# ---------------------------------------------------------------------------
# model-surface resolution: freeze-once, streaming guard, demo parity
# ---------------------------------------------------------------------------


@pytest.fixture()
def near_dup_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_auto_matches_pinned_demo_on_small_corpus(near_dup_docs):
    auto = SimHashDeduper(id="doc_id", text_field="text")
    got_auto = {
        (r["left_id"], r["right_id"]) for r in auto.dedupe(near_dup_docs).collect()
    }
    # 4 docs → auto resolves to the 16-bit demo width, frozen on the model
    assert auto._auto_bits == 16
    pinned = SimHashDeduper(id="doc_id", text_field="text", bits=16)
    got_pinned = {
        (r["left_id"], r["right_id"])
        for r in pinned.dedupe(near_dup_docs).collect()
    }
    assert got_auto == got_pinned and (0, 1) in got_auto


def test_simhash_auto_freezes_across_calls(near_dup_docs, spark):
    model = SimHashDeduper(id="doc_id", text_field="text")
    model.dedupe(near_dup_docs).collect()
    first = model._auto_bits
    # a later call with a different-sized frame reuses the frozen width —
    # block keys and scores stay comparable across calls on one instance
    bigger = spark.range(0, 40_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("id").cast("string")).alias("text"),
    )
    assert model._resolved_bits(bigger) == first


def test_simhash_auto_raises_in_streaming_until_resolved(near_dup_docs):
    model = SimHashDeduper(id="doc_id", text_field="text")
    with pytest.raises(ValueError, match="pin bits explicitly"):
        model.delta_block_keys(near_dup_docs)
    # once a dedupe() resolved the width, delta keys use the frozen value
    model.dedupe(near_dup_docs).collect()
    keys = model.delta_block_keys(near_dup_docs)
    # max_hamming + 1 = 4 pigeonhole chunk keys per doc
    assert keys.count() == 4 * 4


def test_simhash_degenerate_chunks_warn_not_raise(near_dup_docs, caplog):
    # ADVICE r9: bits=16, max_hamming=15 passes the pigeonhole bound but
    # leaves 1-bit chunks — a near cross-join. Legal (recall exact), loud.
    model = SimHashDeduper(
        id="doc_id", text_field="text", bits=16, max_hamming=15
    )
    with caplog.at_level(logging.WARNING, "matchbox_spark.operators.lsh_linkers"):
        model.dedupe(near_dup_docs).collect()
    assert any("cross join" in r.message for r in caplog.records)


@pytest.fixture()
def near_dup_vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.5, 0.2]),
        (1, [1.0, 0.01, 0.5, 0.2]),
        (2, [-1.0, 0.5, -0.5, 0.9]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_auto_matches_pinned_on_small_corpus(near_dup_vectors):
    auto = EmbeddingDeduper(id="vec_id", threshold=0.99)
    got = {
        (r["left_id"], r["right_id"])
        for r in auto.dedupe(near_dup_vectors).collect()
    }
    assert got == {(0, 1)}
    # 3 rows, 4-dim vectors → a small bucket space capped by the vector
    assert 1 <= len(auto._auto_dims) <= 4


def test_embedding_auto_raises_in_streaming_until_resolved(near_dup_vectors):
    model = EmbeddingDeduper(id="vec_id", threshold=0.99)
    with pytest.raises(ValueError, match="pin bucket_dims explicitly"):
        model.delta_block_keys(near_dup_vectors)
    model.dedupe(near_dup_vectors).collect()
    keys = model.delta_block_keys(near_dup_vectors)
    assert keys.count() > 0


def test_embedding_explicit_empty_dims_still_eval_only(near_dup_vectors):
    with pytest.raises(ValueError, match="evaluation-only"):
        EmbeddingDeduper(id="vec_id", bucket_dims=[]).dedupe(near_dup_vectors)


def test_embedding_linker_auto(spark):
    left = spark.createDataFrame(
        [(1, [1.0, 0.2, 0.5, -0.3]), (2, [-0.9, 0.8, -0.1, 0.4])],
        "id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(10, [0.99, 0.21, 0.5, -0.3]), (20, [0.0, -1.0, 0.0, 1.0])],
        "id long, embedding array<float>",
    )
    edges = EmbeddingLinker(
        left_id="id", right_id="id", threshold=0.95
    ).link(left, right)
    assert {(r["left_id"], r["right_id"]) for r in edges.collect()} == {(1, 10)}


def test_embedding_linker_auto_probes_both_sides(spark, caplog):
    """An all-null LEFT embedding column must not collapse the auto bucket
    space for a large right side: the dim probe reads both sides and uses
    the smaller available dimensionality (round 10 review fix)."""
    import logging
    import re

    from matchbox_spark.operators.dedup import auto_embedding_bucket_dims
    from matchbox_spark.operators.lsh_linkers import EmbeddingLinker

    n_right = 4096
    left = spark.createDataFrame(
        [(i, None) for i in range(8)], "id long, embedding array<double>"
    )
    right = spark.range(n_right).select(
        F.col("id"),
        F.array(*[(F.col("id") + d + 1.0) for d in range(16)]).alias(
            "embedding"
        ),
    )
    linker = EmbeddingLinker(left_id="id", right_id="id", threshold=0.99)
    with caplog.at_level(logging.INFO, logger="matchbox_spark"):
        linker.link(left, right).count()  # resolves + runs (no pairs match)
    msg = next(
        r.getMessage() for r in caplog.records if "auto-sized bucket_dims" in r.getMessage()
    )
    n_buckets = int(re.search(r"\((\d+) buckets", msg.replace(",", "")).group(1))
    expected = auto_embedding_bucket_dims(8 + n_right, 16)
    assert len(expected) > 3  # the corpus demands a non-degenerate space
    # the probe must have seen the RIGHT side's 16 dims, not vdim=1
    # (which would cap the space at 2 buckets)
    assert n_buckets == 1 << len(expected)


def test_catalog_ckpt_fallback_counter(spark):
    """_ckpt swallows the rare checkpoint-planning failure and returns the
    raw plan — the fallback counter must move so streaming batch-local
    frees know the stored part may still reference their frames
    (round 10 review fix)."""
    from matchbox_spark.plans.catalog import Catalog

    cat = Catalog(spark)
    df = spark.range(3).select(
        F.col("id").alias("cluster_id"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias(
            "cluster_hash"
        ),
    )

    def _boom(*args, **kwargs):
        raise RuntimeError("planning bug")

    broken = df.alias("b")
    # a plain raising callable — an object whose __getattr__ raises would
    # fail with TypeError at the *call* (implicit __call__ lookup bypasses
    # __getattr__), simulating a different failure than a planning bug
    object.__setattr__(broken, "localCheckpoint", _boom)
    before = cat._ckpt_fallbacks
    out = cat._ckpt(broken, eager=True)
    assert cat._ckpt_fallbacks == before + 1
    assert out is broken  # raw plan returned, still usable
    # and the healthy path does not move the counter
    cat._ckpt(df, eager=True)
    assert cat._ckpt_fallbacks == before + 1
