"""ranked_topk: the BM25 rank-bound guard (VERDICT r11 #7).

A bare ``row_number().over(Window.orderBy(...))`` single-partitions its
whole input; Spark's WindowGroupLimit rule only pushes a per-partition
top-k below the exchange when the rank bound is ≤
``spark.sql.window.group.limit.threshold`` (default 1000). ranked_topk
must (a) ride that rule below the threshold, (b) pre-filter per partition
above it, and (c) return identical rank values either way.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.search import ranked_topk


@pytest.fixture()
def corpus(spark):
    return (
        spark.range(0, 20_000)
        .repartition(8)
        .select(
            F.col("id").alias("doc"),
            (F.col("id") % 4999).cast("double").alias("score"),
        )
    )


def _expected(corpus, k):
    return [
        (r["doc"], r["rank"])
        for r in corpus.orderBy(F.desc("score"), F.asc("doc"))
        .limit(k)
        .withColumn("rank", F.monotonically_increasing_id())
        .collect()
    ]


def test_below_threshold_uses_window_group_limit(spark, corpus):
    out = ranked_topk(corpus, [F.desc("score"), F.asc("doc")], k=50)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # for an UNPARTITIONED window Spark's limit-through-window rewrite
    # yields a distributed TakeOrderedAndProject (the partitioned-window
    # analogue is WindowGroupLimit) — either means the single-partition
    # sort never sees the full input
    assert "TakeOrderedAndProject" in plan or "WindowGroupLimit" in plan, (
        plan[:2000]
    )
    rows = out.orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(1, 51))
    # rank 1 = max score with min doc tiebreak
    top = corpus.orderBy(F.desc("score"), F.asc("doc")).first()
    assert rows[0]["doc"] == top["doc"]


def test_above_threshold_prefilters_per_partition(spark, corpus):
    threshold = int(
        spark.conf.get("spark.sql.window.group.limit.threshold", "1000")
    )
    k = threshold + 200
    out = ranked_topk(corpus, [F.desc("score"), F.asc("doc")], k=k)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the pre-filter is a second, partition-local window: the plan carries
    # one window over spark_partition_id() plus the global one
    assert plan.count("Window") >= 2, plan[:2000]
    assert "_pre_rank" in plan
    rows = out.collect()
    assert len(rows) == k
    assert sorted(r["rank"] for r in rows) == list(range(1, k + 1))
    assert "_pre_rank" not in out.columns


def test_both_regimes_agree(spark, corpus):
    threshold = int(
        spark.conf.get("spark.sql.window.group.limit.threshold", "1000")
    )
    k = 120
    low = ranked_topk(corpus, [F.desc("score"), F.asc("doc")], k=k)
    try:
        spark.conf.set("spark.sql.window.group.limit.threshold", "10")
        high = ranked_topk(corpus, [F.desc("score"), F.asc("doc")], k=k)
        assert sorted(map(tuple, low.collect())) == sorted(
            map(tuple, high.collect())
        )
    finally:
        spark.conf.set(
            "spark.sql.window.group.limit.threshold", str(threshold)
        )


def test_rejects_bad_k(spark, corpus):
    with pytest.raises(ValueError, match="k must be positive"):
        ranked_topk(corpus, [F.desc("score")], k=0)
