"""KMV distinct-count sketch: exactness, accuracy, mergeability, plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from matchbox_spark.operators.sketches import (
    kmv_distinct,
    kmv_estimate,
    kmv_merge,
    kmv_sketch,
)


@pytest.fixture(scope="module")
def values(spark):
    # two groups: 'small' holds 40 distinct values (< k → exact),
    # 'big' holds 5000 distinct values (> k → estimated)
    rows = [("small", f"s{i}") for i in range(40) for _ in range(3)] + [
        ("big", f"b{i}") for i in range(5000)
    ]
    return spark.createDataFrame(rows, "g string, v string")


def test_small_group_is_exact(spark, values):
    out = {
        r["g"]: r
        for r in kmv_distinct(values, ["g"], "v", k=64).collect()
    }
    assert out["small"]["n_sketch"] == 40
    assert out["small"]["est_distinct"] == 40.0


def test_big_group_estimate_within_kmv_error(spark, values):
    out = {
        r["g"]: r
        for r in kmv_distinct(values, ["g"], "v", k=256).collect()
    }
    big = out["big"]
    assert big["n_sketch"] == 256
    # KMV standard error is ~1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma
    assert abs(big["est_distinct"] - 5000) / 5000 < 0.25


def test_merge_equals_sketch_of_union(spark, values):
    """sketch(A) ⊎ sketch(B) == sketch(A ∪ B), row-identical — the
    property that lets per-source sketches roll up without raw data."""
    a = values.where(F.col("v") < "b3")  # lexicographic split
    b = values.where(~(F.col("v") < "b3"))
    merged = kmv_merge(
        [kmv_sketch(a, ["g"], "v", k=64), kmv_sketch(b, ["g"], "v", k=64)],
        ["g"],
        k=64,
    )
    direct = kmv_sketch(values, ["g"], "v", k=64)
    m = sorted(map(tuple, merged.collect()))
    d = sorted(map(tuple, direct.collect()))
    assert m == d
    # and the merged sketch estimates identically
    em = sorted(map(tuple, kmv_estimate(merged, ["g"], k=64).collect()))
    ed = sorted(map(tuple, kmv_distinct(values, ["g"], "v", k=64).collect()))
    assert em == ed


def test_rank_filter_compiles_to_window_group_limit(spark, values):
    """The row_number <= k filter must hit Catalyst's WindowGroupLimit
    rewrite — each task pre-prunes to its local top-k before the exchange,
    which is what makes the sketch shuffle O(k·groups), not O(values)."""
    plan = kmv_sketch(values, ["g"], "v", k=64)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_kmv_accumulator_multi_batch_equals_whole(spark, values):
    """Feeding the accumulator N batches lands on exactly the whole-data
    sketch — the invariant st8's streaming oracle relies on (and the
    availableNow drain can't demonstrate on a single parquet file)."""
    from matchbox_spark.streaming.sketches import KmvAccumulator

    acc = KmvAccumulator(["g"], "v", k=64)
    # 6 uneven batches, one empty
    batches = [
        values.where(F.crc32(F.col("v")) % 5 == i) for i in range(5)
    ] + [values.where(F.lit(False))]
    for i, b in enumerate(batches):
        acc.process_batch(b, i)
    assert acc.n_batches == 6
    got = sorted(map(tuple, kmv_estimate(acc.sketch, ["g"], k=64).collect()))
    want = sorted(map(tuple, kmv_distinct(values, ["g"], "v", k=64).collect()))
    assert got == want


def test_k_validation():
    with pytest.raises(ValueError, match="k must be >= 2"):
        kmv_sketch(None, ["g"], "v", k=1)


def test_histogram_quantiles_close_to_exact(spark):
    from matchbox_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    # 10k uniform values in [0, 1000): p50 ≈ 500, p90 ≈ 900
    df = spark.range(10_000).select(
        F.lit("a").alias("g"), (F.col("id") % 1000).cast("double").alias("v")
    )
    sk = histogram_sketch(df, "v", 0.0, 1000.0, 100, ["g"])
    out = {
        r["q"]: r["est"]
        for r in histogram_quantiles(
            sk, [0.5, 0.9], 0.0, 1000.0, 100, ["g"]
        ).collect()
    }
    # error bound: one bin width (10)
    assert abs(out[0.5] - 500.0) <= 10.0
    assert abs(out[0.9] - 900.0) <= 10.0


def test_histogram_sketch_merges_by_summing(spark):
    from matchbox_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.range(10_000).select(
        F.lit("a").alias("g"), (F.col("id") % 997).cast("double").alias("v")
    )
    a = df.where(F.col("id") % 2 == 0)
    b = df.where(F.col("id") % 2 == 1)
    merged = (
        histogram_sketch(a, "v", 0.0, 1000.0, 50, ["g"])
        .unionByName(histogram_sketch(b, "v", 0.0, 1000.0, 50, ["g"]))
        .groupBy("g", "bin")
        .agg(F.sum("n").alias("n"))
    )
    direct = histogram_sketch(df, "v", 0.0, 1000.0, 50, ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    em = histogram_quantiles(merged, [0.5], 0.0, 1000.0, 50, ["g"]).collect()
    ed = histogram_quantiles(direct, [0.5], 0.0, 1000.0, 50, ["g"]).collect()
    assert [tuple(r) for r in em] == [tuple(r) for r in ed]


def test_null_values_excluded_like_count_distinct(spark):
    """NULL values contribute to neither sketch — COUNT(DISTINCT)
    semantics, and a NULL uniform would order NULLS FIRST in Spark but
    NULLS LAST in DuckDB (silent cross-engine divergence); a NaN bin cast
    would raise under ANSI."""
    from matchbox_spark.operators.sketches import (
        histogram_sketch,
        kmv_distinct,
    )

    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("a", None)],
        "g string, v string",
    )
    out = kmv_distinct(df, ["g"], "v", k=8).collect()
    assert [(r["g"], r["n_sketch"], r["est_distinct"]) for r in out] == [
        ("a", 2, 2.0)
    ]

    dfn = spark.createDataFrame(
        [("a", 5.0), ("a", None), ("a", float("nan")), ("a", 7.0)],
        "g string, v double",
    )
    sk = histogram_sketch(dfn, "v", 0.0, 10.0, 10, ["g"])
    assert sum(r["n"] for r in sk.collect()) == 2


def test_kmv_jaccard_exact_below_k_and_estimates_above(spark):
    """Intersection/Jaccard from two sketches: exact when the union fits
    the sketch; within KMV error above it; disjoint groups read 0."""
    from matchbox_spark.operators.sketches import kmv_jaccard, kmv_sketch

    # small: A = {0..29}, B = {20..49} → |∩| = 10, |∪| = 50, J = 0.2
    a_small = spark.range(30).select(F.lit("s").alias("g"), F.col("id").alias("v"))
    b_small = spark.range(20, 50).select(F.lit("s").alias("g"), F.col("id").alias("v"))
    out = kmv_jaccard(
        kmv_sketch(a_small, ["g"], "v", k=64),
        kmv_sketch(b_small, ["g"], "v", k=64),
        ["g"],
        k=64,
    ).collect()[0]
    assert out["jaccard"] == 0.2
    assert out["est_union"] == 50.0
    assert out["est_intersection"] == 10.0

    # large: A = {0..5999}, B = {3000..8999} → J = 1/3, |∩| = 3000
    a_big = spark.range(6000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    b_big = spark.range(3000, 9000).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    est = kmv_jaccard(
        kmv_sketch(a_big, ["g"], "v", k=512),
        kmv_sketch(b_big, ["g"], "v", k=512),
        ["g"],
        k=512,
    ).collect()[0]
    assert abs(est["jaccard"] - 1 / 3) < 0.1
    assert abs(est["est_intersection"] - 3000) / 3000 < 0.3

    # disjoint
    dis = kmv_jaccard(
        kmv_sketch(a_small, ["g"], "v", k=64),
        kmv_sketch(
            spark.range(100, 130).select(
                F.lit("s").alias("g"), F.col("id").alias("v")
            ),
            ["g"],
            "v",
            k=64,
        ),
        ["g"],
        k=64,
    ).collect()[0]
    assert dis["jaccard"] == 0.0 and dis["est_intersection"] == 0.0


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    """Every built key passes (no false negatives — the Bloom guarantee);
    false positives on disjoint probes stay near the analytic rate."""
    from matchbox_spark.operators.sketches import bloom_build, bloom_contains

    keys = spark.range(300).select(
        F.concat(F.lit("k"), F.col("id").cast("string")).alias("k")
    )
    bloom = bloom_build(keys, "k", m_bits=4096, k_hashes=3)
    # members: all pass
    members = bloom_contains(keys, bloom, "k", m_bits=4096, k_hashes=3)
    assert members.where(~F.col("bloom_pass")).count() == 0
    # non-members: fp rate ≈ (1 - e^{-kn/m})^k ≈ 0.8%; allow 5×
    others = spark.range(5000).select(
        F.concat(F.lit("x"), F.col("id").cast("string")).alias("k")
    )
    fp = (
        bloom_contains(others, bloom, "k", m_bits=4096, k_hashes=3)
        .where(F.col("bloom_pass"))
        .count()
    )
    assert fp / 5000 < 0.04, fp


def test_bloom_merge_is_union_and_null_is_false(spark):
    from matchbox_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    a = spark.createDataFrame([("a1",), ("a2",)], "k string")
    b = spark.createDataFrame([("b1",), (None,)], "k string")
    merged = bloom_merge(
        [bloom_build(a, "k", 256, 2), bloom_build(b, "k", 256, 2)]
    )
    direct = bloom_build(
        a.unionByName(b), "k", 256, 2
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    probe = spark.createDataFrame(
        [("a1",), ("b1",), (None,)], "k string"
    )
    out = {
        r["k"]: r["bloom_pass"]
        for r in bloom_contains(probe, merged, "k", 256, 2).collect()
    }
    assert out["a1"] and out["b1"]
    assert out[None] is False  # NULL never matches (semi-join semantics)


def test_bloom_validation(spark):
    from matchbox_spark.operators.sketches import bloom_build

    df = None
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(df, "k", m_bits=10)
    with pytest.raises(ValueError, match="k_hashes"):
        bloom_build(df, "k", m_bits=63, k_hashes=0)


def test_cms_never_undercounts_and_is_exact_when_sparse(spark):
    """CMS estimates ≥ truth always (one-sided), and equal truth when the
    key space is far below the counter space."""
    from matchbox_spark.operators.sketches import cms_build, cms_estimate

    # 20 keys with known counts k_i = i+1
    rows = [(f"k{i}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    cms = cms_build(df, "k", width=1024, depth=4)
    probe = spark.createDataFrame([(f"k{i}",) for i in range(20)], "k string")
    out = {
        r["k"]: r["est_count"]
        for r in cms_estimate(probe, cms, "k", 1024, 4).collect()
    }
    for i in range(20):
        assert out[f"k{i}"] == i + 1  # sparse → exact
    # unseen key reads 0 (collision-free at this sparsity)
    ghost = spark.createDataFrame([("nope",)], "k string")
    g = cms_estimate(ghost, cms, "k", 1024, 4).collect()[0]["est_count"]
    assert g >= 0  # and never negative


def test_cms_overcount_bounded_under_load(spark):
    """At heavy load the estimate overcounts by at most ~e/width of the
    total mass (allow 4× the bound for the deterministic draw)."""
    from matchbox_spark.operators.sketches import cms_build, cms_estimate

    n = 50_000
    df = spark.range(n).select(
        F.concat(F.lit("u"), (F.col("id") % 5000).cast("string")).alias("k")
    )  # 5000 keys × 10 each
    cms = cms_build(df, "k", width=256, depth=4)
    probe = spark.createDataFrame([("u0",), ("u4999",)], "k string")
    for r in cms_estimate(probe, cms, "k", 256, 4).collect():
        assert r["est_count"] >= 10  # never undercounts
        assert r["est_count"] <= 10 + 4 * (2.72 * n / 256)


def test_cms_merge_adds_and_weighted_mass(spark):
    from matchbox_spark.operators.sketches import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    a = spark.createDataFrame([("x", 3), ("y", 5)], "k string, w long")
    b = spark.createDataFrame([("x", 7), (None, 100)], "k string, w long")
    merged = cms_merge(
        [
            cms_build(a, "k", 64, 3, weight_col="w"),
            cms_build(b, "k", 64, 3, weight_col="w"),
        ]
    )
    direct = cms_build(
        a.unionByName(b), "k", 64, 3, weight_col="w"
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    probe = spark.createDataFrame([("x",), ("y",)], "k string")
    out = {
        r["k"]: r["est_count"]
        for r in cms_estimate(probe, merged, "k", 64, 3).collect()
    }
    assert out["x"] >= 10 and out["y"] >= 5  # weighted, null excluded


def test_histogram_out_of_range_clamps_and_validates(spark):
    from matchbox_spark.operators.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )

    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.0), ("a", 99.0), ("a", 250.0)], "g string, v double"
    )
    sk = {
        (r["g"], r["bin"]): r["n"]
        for r in histogram_sketch(df, "v", 0.0, 100.0, 10, ["g"]).collect()
    }
    assert sk[("a", 0)] == 2  # -5 clamps into bin 0 alongside 0.0
    assert sk[("a", 9)] == 2  # 99 lands in bin 9; 250 clamps to bin 9
    with pytest.raises(ValueError, match="n_bins"):
        histogram_sketch(df, "v", 0.0, 100.0, 0)
    with pytest.raises(ValueError, match="hi must be > lo"):
        histogram_sketch(df, "v", 5.0, 5.0, 10)
    with pytest.raises(ValueError, match="quantiles"):
        histogram_quantiles(df, [0.0], 0.0, 100.0, 10, ["g"])
