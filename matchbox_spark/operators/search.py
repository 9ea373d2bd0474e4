"""Keyword search scoring: BM25 over a tokenised document corpus.

The lexical complement to the vector path (`operators/similarity.py`) — a
training-data pipeline needs both: ANN for embedding retrieval, BM25 for
query-driven corpus slicing (topic mining, eval-set construction,
contamination probes by query).

Spark-first shape (Robertson/Sparck Jones BM25, the Lucene variant with the
+1 inside the idf log so scores stay non-negative):

- document lengths come straight from ``token_count_expr`` — no explode;
- only tokens matching the query terms are exploded and aggregated, so the
  wide work is O(matching postings), not O(corpus tokens);
- corpus stats (N, avgdl) and per-term document frequencies are tiny
  one-row / per-term frames, broadcast into the scoring join — the only
  shuffle on the corpus side is the per-document score re-aggregation.

Everything is built-in column expressions (log/division) — whole-stage
codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.functions.text import token_count_expr, tokens_expr


def bm25_scores(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int | None = None,
) -> DataFrame:
    """Score every document matching ≥1 query term; return
    ``(doc, n_terms, score)`` ordered by score desc (ties: doc asc).

    ``score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))``; rounded to 6 dp so
    the number is reproducible cross-engine.
    """
    if not query_terms:
        raise ValueError("bm25_scores requires at least one query term")
    terms = sorted({t.lower() for t in query_terms})

    lengths = docs.select(
        F.col(id_col).cast("long").alias("doc"),
        token_count_expr(text_col).cast("double").alias("dl"),
    )
    postings = (
        docs.select(
            F.col(id_col).cast("long").alias("doc"),
            F.explode(tokens_expr(text_col)).alias("term"),
        )
        .where(F.col("term").isin(terms))
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    stats = lengths.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    doc_freq = postings.groupBy("term").agg(F.count("*").alias("df"))

    scored = (
        postings.join(lengths, "doc")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(doc_freq), "term")
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "part",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_terms"),
            F.round(F.sum("part"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc"))
    )
    if top_k is not None:
        scored = scored.limit(int(top_k))
    return scored


def ranked_topk(
    df: DataFrame,
    order_cols: list,
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Global top-k WITH rank values, safe at any k (round 12).

    A bare ``row_number().over(Window.orderBy(...))`` single-partitions the
    whole input; Spark only rescues it when the rank filter bound is at or
    under ``spark.sql.window.group.limit.threshold`` (default 1000), where
    the WindowGroupLimit rule pushes a per-partition top-k below the
    exchange — the BASELINE.md lesson-6 cliff. This helper makes the cliff
    impossible to hit silently:

    - ``k`` ≤ threshold: the plain window + filter (WindowGroupLimit fires;
      asserted in tests/test_search_rank_guard.py);
    - ``k`` > threshold: an EXPLICIT per-partition pre-filter (row_number
      partitioned by ``spark_partition_id()``) keeps ≤ k rows per input
      partition before the global window, so the single-partition sort sees
      at most ``k · n_partitions`` rows, never the corpus.

    ``order_cols`` must define a total order (include a tiebreaker) for the
    rank to be deterministic.
    """
    from pyspark.sql import Window

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    threshold = int(
        df.sparkSession.conf.get("spark.sql.window.group.limit.threshold", "1000")
    )
    if threshold < 0:  # -1 disables the rule entirely → always pre-filter
        threshold = 0
    if k > threshold:
        pre = Window.partitionBy(F.spark_partition_id()).orderBy(*order_cols)
        df = df.withColumn("_pre_rank", F.row_number().over(pre)).where(
            F.col("_pre_rank") <= k
        )
    out = df.withColumn(
        rank_col, F.row_number().over(Window.orderBy(*order_cols))
    ).where(F.col(rank_col) <= k)
    return out.drop("_pre_rank") if k > threshold else out


def rrf_fuse(
    ranked_lists: dict[str, DataFrame],
    k: int = 60,
    id_col: str = "doc",
    rank_col: str = "rank",
    top_n: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of named ranked
    lists: ``rrf = Σ_lists 1/(k + rank)``, a list contributing 0 for ids it
    does not rank. Returns ``(doc, n_lists, rrf, fused_rank)`` ordered by
    rrf desc (ties: doc asc).

    The canonical hybrid-retrieval combiner — lexical (BM25) and vector
    (cosine) top-k lists fuse without score calibration because only ranks
    enter. Plan shape: each input is already a top-k list (small), so the
    union + groupBy shuffles only candidate ids, never the corpus; rrf is
    rounded to 9 dp (sums of ≤ a few reciprocals — deterministic in any
    engine). The global ``fused_rank`` window runs on the fused candidate
    set, which is bounded by Σ per-list k — metadata-sized by construction,
    never the corpus.
    """
    if not ranked_lists:
        raise ValueError("rrf_fuse requires at least one ranked list")
    # the id column keeps its NATIVE type (advisory r5): a long cast would
    # silently null out non-numeric ids (UUID strings) and collapse them
    # into one fused group — the exact hazard exact_cosine_pairs documents.
    # Mixed id types across lists now fail loudly at the union instead.
    tagged = None
    for name in sorted(ranked_lists):
        part = ranked_lists[name].select(
            F.col(id_col).alias("doc"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "contrib"
            ),
        )
        tagged = part if tagged is None else tagged.unionAll(part)
    fused = (
        tagged.groupBy("doc")
        .agg(
            F.count("*").alias("n_lists"),
            F.round(F.sum("contrib"), 9).alias("rrf"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rrf"), F.asc("doc"))
    fused = fused.withColumn("fused_rank", F.row_number().over(w))
    if top_n is not None:
        # explicit orderBy before limit (advisory r5): a bare limit after a
        # window relies on the single-partition sort order surviving the
        # plan, which is plan-dependent rather than guaranteed
        fused = fused.orderBy("fused_rank").limit(int(top_n))
    return fused
