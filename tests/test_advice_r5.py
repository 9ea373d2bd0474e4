"""Regression tests for the round-4 advisory findings (ADVICE.md, r5).

Each test pins one reported defect:

1. dedupers: a NULL entity id must not forge a self-edge (x, x) — the
   reference drops such pairs via ``raw.left_id != raw.right_id``
   (naive.py:63) and the Deduper contract promises left_id < right_id.
2. dedupers: ``max_group_size`` measures the same quantity (distinct member
   ids) in the chunked and non-chunked paths, so the two stay set-identical
   under a cap.
3. curation.dedupe_lines: a regex-metacharacter separator ('.', '|') splits
   on the literal character and round-trips through reassembly.
4. skew.default_salt: identical duplicate rows of a hot key spread across
   salt buckets (a content hash would collapse them onto one and leave the
   straggler intact).
5. catalog: a FingerprintMismatchError raised by the gate leaves no cached
   RDDs behind, and insert_resolver_clusters leaks no cache entry.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.dedupers import NaiveDeduper
from matchbox_spark.operators.curation import dedupe_lines
from matchbox_spark.operators.skew import default_salt, salted_agg
from matchbox_spark.plans.catalog import Catalog, FingerprintMismatchError


def _pairs(df):
    return {(r["left_id"], r["right_id"]) for r in df.collect()}


def test_null_id_rows_never_pair(spark):
    # rows 1 and 2 share the key with a null-id row; the null must neither
    # self-edge nor pair with anything
    data = spark.createDataFrame(
        [(1, "a"), (2, "a"), (None, "a"), (None, "b"), (7, "b")],
        "id long, k string",
    )
    for settings in ({}, {"chunk_size": 2}):
        got = _pairs(
            NaiveDeduper(unique_fields=["k"], **settings).dedupe(data)
        )
        assert got == {(1, 2)}, settings
        for left, right in got:
            assert left < right


def test_max_group_size_consistent_across_paths(spark):
    # group "a" has 4 rows but only 3 distinct ids; with cap=3 BOTH paths
    # must keep it (cap measures distinct members, not raw rows)
    data = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "a"), (8, "b"), (9, "b")],
        "id long, k string",
    )
    plain = _pairs(
        NaiveDeduper(unique_fields=["k"], max_group_size=3).dedupe(data)
    )
    chunked = _pairs(
        NaiveDeduper(
            unique_fields=["k"], max_group_size=3, chunk_size=2
        ).dedupe(data)
    )
    assert plain == chunked == {(1, 2), (1, 3), (2, 3), (8, 9)}
    # with cap=2 both paths drop group "a" entirely
    plain2 = _pairs(
        NaiveDeduper(unique_fields=["k"], max_group_size=2).dedupe(data)
    )
    chunked2 = _pairs(
        NaiveDeduper(
            unique_fields=["k"], max_group_size=2, chunk_size=2
        ).dedupe(data)
    )
    assert plain2 == chunked2 == {(8, 9)}


@pytest.mark.parametrize("sep", [".", "|", "\n"])
def test_dedupe_lines_metacharacter_separator(spark, sep):
    docs = spark.createDataFrame(
        [(1, sep.join(["alpha", "beta"])), (2, sep.join(["beta", "gamma"]))],
        "doc_id long, text string",
    )
    out = {
        r["doc"]: r
        for r in dedupe_lines(docs, "doc_id", "text", sep=sep).collect()
    }
    assert out[1]["text"] == sep.join(["alpha", "beta"])
    assert out[1]["n_kept"] == 2
    assert out[2]["text"] == "gamma"  # "beta" first occurred in doc 1
    assert out[2]["n_dropped"] == 1


def test_default_salt_spreads_identical_rows(spark):
    # 2000 byte-identical rows (the viral-boilerplate shape): the default
    # salt must spread them over >1 bucket
    df = spark.range(2000).select(
        F.lit("hot").alias("k"), F.lit(1).alias("v")
    )
    n_buckets = (
        df.withColumn("_salt", default_salt(16))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_buckets > 1
    # and the salted aggregate still merges to the exact answer
    got = salted_agg(
        df, ["k"], {"n": ("*", "count"), "s": ("v", "sum")}, n_salts=16
    ).collect()
    assert len(got) == 1
    assert got[0]["n"] == 2000 and got[0]["s"] == 2000


def _n_cached(spark):
    """Count CACHE entries (Dataset persists carry plan-text names with
    newlines) — localCheckpoint RDDs ('MapPartitionsRDD') are materialised
    deltas the catalog keeps on purpose and don't count as leaks."""
    import time

    for _ in range(20):  # unpersist() is async; settle briefly
        n = sum(
            1
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if "\n" in (i.name() or "")
        )
        if n == 0:
            return 0
        time.sleep(0.1)
    return n


def test_fingerprint_mismatch_leaves_no_cache(spark):
    cat = Catalog(spark)
    idx = spark.createDataFrame(
        [(b"h1", ["k1"]), (b"h2", ["k2"])], "hash binary, keys array<string>"
    )
    before = _n_cached(spark)
    cat.insert_source_index("src", idx)
    # round 11: the bucketed-index cache is DEFERRED (the lazy id
    # assignment folds into the next action; the next catalog mutation or
    # an explicit release frees it) — it may still be live here, but an
    # explicit release must leave nothing behind
    cat._release_assign_temp()
    assert cat._assign_temp is None
    assert _n_cached(spark) == before
    # same step, different data → gate raises; no cache entry may survive
    idx2 = spark.createDataFrame(
        [(b"h3", ["k3"])], "hash binary, keys array<string>"
    )
    with pytest.raises(FingerprintMismatchError):
        cat.insert_source_index("src", idx2)
    assert _n_cached(spark) == before

    # resolver insert: no cache entry outlives the call (the old code
    # persisted `assigned` and never released it)
    assigns = spark.createDataFrame(
        [(100, 1), (100, 2)], "parent_id long, child_id long"
    )
    cat.insert_resolver_clusters("res", assigns)
    assert _n_cached(spark) == before
    # and a mismatching re-insert raises without leaking either
    assigns2 = spark.createDataFrame(
        [(200, 1)], "parent_id long, child_id long"
    )
    with pytest.raises(FingerprintMismatchError):
        cat.insert_resolver_clusters("res", assigns2)
    assert _n_cached(spark) == before


def test_merge_clusterings_dense_relabel(spark):
    from matchbox_spark.operators.results import merge_clusterings

    a = spark.createDataFrame(
        [(10, 1), (10, 2), (20, 5)], "parent_id long, child_id long"
    )
    b = spark.createDataFrame(
        [(30, 2), (30, 3), (40, 7)], "parent_id long, child_id long"
    )
    out = merge_clusterings(a, b)
    groups = {}
    for r in out.collect():
        groups.setdefault(r["parent_id"], set()).add(r["child_id"])
    # {1,2,3} merges (shared leaf 2); {5} and {7} stay singletons
    assert sorted(groups.values(), key=min) == [{1, 2, 3}, {5}, {7}]
    # dense 1..k labels ordered by min member
    assert sorted(groups) == [1, 2, 3]
    assert min(groups[1]) < min(groups[2]) < min(groups[3])


def test_model_edge_insert_survives_checkpoint_failure(spark, monkeypatch):
    """The fused fingerprint path must not hang when the eager checkpoint
    fails (obs.get would block forever): it falls back to the two-job
    fingerprint and a lazy append, producing the identical fingerprint."""
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.8)], "left_id long, right_id long, score float"
    )
    ok = Catalog(spark)
    ok.insert_model_edges("m", edges)

    broken = Catalog(spark)
    # patch the CONCRETE DataFrame class (Spark 4 exposes an abstract base
    # at pyspark.sql.DataFrame; instances are the classic subclass)
    cls = type(edges)
    real = cls.localCheckpoint
    calls = {"n": 0}

    def exploding(self, eager=True):
        calls["n"] += 1
        raise RuntimeError("simulated checkpoint planning failure")

    monkeypatch.setattr(cls, "localCheckpoint", exploding)
    try:
        broken.insert_model_edges("m", edges)
    finally:
        monkeypatch.setattr(cls, "localCheckpoint", real)
    assert calls["n"] >= 1
    assert broken.steps["m"]["fingerprint"] == ok.steps["m"]["fingerprint"]
    assert broken.model_edges.count() == 2
