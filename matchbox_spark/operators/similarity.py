"""Similarity search over embedding columns (BASELINE.json north star).

- ``cosine_topk``: exact brute-force top-k — the correctness baseline. The
  corpus side stays partitioned; the (small) query side broadcasts, so the
  plan is an embarrassingly parallel map + per-query top-k (window over the
  query key, which shuffles once on query id).
- ``ann_topk``: LSH-bucketed approximate variant — sign-bit buckets with
  multi-probe (flip one bit at a time), then exact cosine within buckets.
  The scale path: shuffle keys are buckets, never the full cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from matchbox_spark.functions.vectors import (
    cosine_expr,
    dot_expr,
    norm_expr,
    sign_bucket_expr,
    vector_dim,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine: (query, neighbor, cosine, rank), rank 1..k.

    Ties break by neighbor id ascending so results are fully deterministic.
    """
    # Norms precompute per ROW, not per pair: cosine_expr inside the cross
    # join would re-fold both vectors' self-dots for every (query, corpus)
    # combination — interpreted higher-order-function work (BASELINE.md
    # plan-shape lesson 5) repeated |queries| times per corpus row. The
    # factored den = qn·cn is the identical float product of the identical
    # sqrt(dot(v,v)) values, so results are bit-equal (verified).
    # (r14 measured: unrolling this dot via a dim probe REGRESSED v1 —
    # 1.5 -> 2.5 s at sf0.1 — the 64-term trees inflate analysis/codegen
    # time, which dominates these window-heavy plans at bench scale; the
    # unroll stays where pair volume dominates, see exact_cosine_pairs.)
    c = corpus.select(
        F.col(corpus_id).cast("long").alias("neighbor"),
        F.col(corpus_vec).alias("_cv"),
        norm_expr(F.col(corpus_vec)).alias("_cn"),
    )
    q = queries.select(
        F.col(query_id).cast("long").alias("query"),
        F.col(query_vec).alias("_qv"),
        norm_expr(F.col(query_vec)).alias("_qn"),
    )
    num = dot_expr(F.col("_qv"), F.col("_cv"))
    den = F.col("_qn") * F.col("_cn")
    scored = F.broadcast(q).crossJoin(c).select(
        "query",
        "neighbor",
        F.round(
            F.when(den > 0, num / den).otherwise(F.lit(0.0)), 6
        ).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query") != F.col("neighbor"))
    w = Window.partitionBy("query").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "neighbor", "cosine", "rank")
    )


def exact_cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assume_normalized: bool = False,
) -> DataFrame:
    """All vector pairs (id_a < id_b) with similarity ≥ threshold — exact.

    The O(n²) brute-force baseline that anchors the approximate paths
    (``embedding_near_duplicates`` LSH blocking, ``ann_topk``/``ivf_topk``):
    run it on a sample to calibrate thresholds and measure recall, run the
    blocked variants on the full corpus. With ``assume_normalized`` the dot
    product alone is the cosine (skips two norms per pair).

    Scale note: one side broadcasts when small; for two large sides this is
    a cross join and the LSH/IVF operators are the right tool.
    """
    # ids compare as-is — `<` totally orders strings and numbers alike, so
    # UUID-style ids work; a numeric cast would null them out and silently
    # drop every pair. Norms precompute per ROW (see cosine_topk): the
    # factored den is the identical float product, results bit-equal.
    #
    # Plan shape (optimization r13, measured 25.2 → 1.4 s at sf0.1 —
    # guide §1.2 "per-task work" + §2.5 "input skew"):
    # 1. The streamed side round-robins to the session's cores — the
    #    corpus is typically one scan split (the broadcast nested-loop
    #    join otherwise walks ALL n² candidates in a single task), and a
    #    linear repartition is noise against this operator's O(n²)
    #    contract.
    # 2. The similarity must NOT ride in the join condition: Catalyst
    #    merges a `.where(sim ≥ t)` into the BNLJ condition and orders it
    #    BEFORE the cheap id comparison, so the fold ran for every ORDERED
    #    candidate pair inside the non-codegen join loop (measured
    #    conjunct order `(dot ≥ 0.35) AND (id_a < id_b)`). The r13
    #    attempt — an unreferenced spark_partition_id() passenger column —
    #    was column-pruned BEFORE the pushdown check, so the committed
    #    plan still evaluated the fold in the condition. The barrier that
    #    survives optimization (r14, guide §4.4) wraps the sim itself:
    #    `when(spark_partition_id() >= 0, sim)` is value-identical (the
    #    guard is always true) but NONDETERMINISTIC, and PushDownPredicate
    #    refuses to substitute a nondeterministic alias into a pushed
    #    filter — the after-plan's join condition is the id comparison
    #    alone, with the sim in a codegen Project above it.
    cores = df.sparkSession.sparkContext.defaultParallelism
    dim = vector_dim(df, vec_col)
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    if a.rdd.getNumPartitions() < cores:
        # single-split scans leave the O(n²) BNLJ on one task; wide inputs
        # pass untouched (the r13 unconditional repartition re-shuffled
        # an already-wide vector side for nothing at warehouse scale)
        a = a.repartition(cores)
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if assume_normalized:
        sim = dot_expr("_va", "_vb", dim)
    else:
        a = a.withColumn("_na", norm_expr(F.col("_va"), dim))
        b = b.withColumn("_nb", norm_expr(F.col("_vb"), dim))
        den = F.col("_na") * F.col("_nb")
        sim = F.when(
            den > 0, dot_expr("_va", "_vb", dim) / den
        ).otherwise(F.lit(0.0))
    sim = F.when(F.spark_partition_id() >= 0, sim)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("_sim"))
        .where(F.col("_sim") >= F.lit(threshold))
        .select("id_a", "id_b", F.round("_sim", 6).alias("cos_sim"))
    )


def ivf_topk_hashed(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """IVF-Flat with hash-selected centroids — deterministic AND relational.

    Same inverted-list layout as :func:`ivf_topk`, but the ``n_lists``
    centroids are the corpus vectors with the smallest ``md5(id)`` (a
    seedless deterministic sample), similarities are rounded to 6 places
    before every rank comparison, and ties break on ids — so list
    assignment, probing, and the final top-k are pure relational algebra an
    independent SQL engine can replicate row-for-row. Recall trails
    KMeans-trained lists on clustered data (random pivots vs learned ones) —
    the classic verifiability/quality trade; use :func:`ivf_topk` when
    quality matters more than replay.

    Scale shape matches ivf_topk: centroids broadcast (n_lists × dim), the
    corpus shuffles once on list_id, each query probes ``n_probe`` lists.
    """
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(corpus_id).cast("long").alias("neighbor"),
        F.col(corpus_vec).alias("_cv"),
    )
    # centroid pick: TakeOrdered (distributed sort-limit), then n_lists rows
    # land on the driver to become the broadcast centroid table
    cent_rows = (
        c.withColumn("_h", F.md5(F.col("neighbor").cast("string")))
        .orderBy("_h", "neighbor")
        .limit(n_lists)
        .collect()
    )
    centroids = spark.createDataFrame(
        [(i + 1, list(r["_cv"])) for i, r in enumerate(cent_rows)],
        f"list_id int, centroid {dict(c.dtypes)['_cv']}",
    )

    sim_c = F.round(cosine_expr(F.col("_cv"), F.col("centroid")), 6)
    assigned = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn(
            "_arank",
            F.row_number().over(
                Window.partitionBy("neighbor").orderBy(
                    sim_c.desc(), F.asc("list_id")
                )
            ),
        )
        .where(F.col("_arank") == 1)
        .select("neighbor", "_cv", "list_id")
    )

    q = queries.select(
        F.col(query_id).cast("long").alias("query"), F.col(query_vec).alias("_qv")
    )
    sim_q = F.round(cosine_expr(F.col("_qv"), F.col("centroid")), 6)
    q_lists = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn(
            "_crank",
            F.row_number().over(
                Window.partitionBy("query").orderBy(
                    sim_q.desc(), F.asc("list_id")
                )
            ),
        )
        .where(F.col("_crank") <= n_probe)
        .select("query", "_qv", "list_id")
    )
    scored = q_lists.join(assigned, "list_id").select(
        "query",
        "neighbor",
        F.round(cosine_expr(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query") != F.col("neighbor"))
    w = Window.partitionBy("query").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "neighbor", "cosine", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 3,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: KMeans-partitioned inverted file search.

    Train ``n_lists`` centroids (MLlib KMeans, seeded), assign each corpus
    vector to its nearest centroid (the inverted lists), then search each
    query only in its ``n_probe`` nearest lists — the classic IVF-Flat
    layout. Work scales as n_probe/n_lists of brute force; at warehouse scale
    the corpus stays partitioned by list id so a probe touches only those
    partitions. Centroids broadcast (n_lists × dim floats).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c = corpus.select(
        F.col(corpus_id).cast("long").alias("neighbor"),
        F.col(corpus_vec).alias("_cv"),
    ).withColumn("_feat", array_to_vector(F.col("_cv").cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, featuresCol="_feat", predictionCol="list_id")
    model = km.fit(c)
    c_assigned = model.transform(c).select("neighbor", "_cv", "list_id")

    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "list_id int, centroid array<double>",
    )

    q = queries.select(
        F.col(query_id).cast("long").alias("query"), F.col(query_vec).alias("_qv")
    )
    # rank centroids per query by cosine, keep n_probe
    q_lists = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn("_csim", cosine_expr(F.col("_qv"), F.col("centroid")))
        .withColumn(
            "_crank",
            F.row_number().over(
                Window.partitionBy("query").orderBy(F.desc("_csim"), F.asc("list_id"))
            ),
        )
        .where(F.col("_crank") <= n_probe)
        .select("query", "_qv", "list_id")
    )
    scored = q_lists.join(c_assigned, "list_id").select(
        "query",
        "neighbor",
        F.round(cosine_expr(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query") != F.col("neighbor"))
    w = Window.partitionBy("query").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "neighbor", "cosine", "rank")
    )


def _multi_probe_buckets(vec_col: str, dims: list[int]):
    """Bucket key array: the home bucket plus one-bit-flipped probes."""
    home = sign_bucket_expr(vec_col, dims)
    probes = [home] + [home.bitwiseXOR(F.lit(1 << i)) for i in range(len(dims))]
    return F.array(*probes)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bucket_dims: list[int] | None = None,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k: sign-bit LSH buckets + one-bit multi-probe.

    Corpus vectors land in their home bucket; each query probes its home
    bucket and every one-bit neighbour, so a query inspects
    (len(dims)+1)/2^len(dims) of the corpus in expectation. Recall rises
    with fewer dims (bigger buckets) or more probes.
    """
    if bucket_dims is None:
        bucket_dims = [0, 1, 2, 3, 4, 5]
    c = corpus.select(
        F.col(corpus_id).cast("long").alias("neighbor"),
        F.col(corpus_vec).alias("_cv"),
    ).withColumn("bkt", sign_bucket_expr("_cv", bucket_dims))
    q = queries.select(
        F.col(query_id).cast("long").alias("query"), F.col(query_vec).alias("_qv")
    ).select(
        "query",
        "_qv",
        F.explode(_multi_probe_buckets("_qv", bucket_dims)).alias("bkt"),
    )
    scored = (
        q.join(c, "bkt")
        .select(
            "query",
            "neighbor",
            F.round(cosine_expr(F.col("_qv"), F.col("_cv")), 6).alias(
                "cosine"
            ),
        )
        .dropDuplicates(["query", "neighbor"])
    )
    if exclude_self:
        scored = scored.where(F.col("query") != F.col("neighbor"))
    w = Window.partitionBy("query").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "neighbor", "cosine", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 3,
    m_subspaces: int = 4,
    n_codes: int = 8,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    exclude_self: bool = True,
    rerank: int | None = None,
    train_codebooks: bool = False,
) -> DataFrame:
    """IVF-PQ: product-quantised inverted-file search (Jégou et al. 2011),
    deterministic-pivot variant — the memory-bounded 100 TB vector path.

    ``rerank``: when set, ADC ranks a per-query SHORTLIST of that size and
    the final top-k comes from an exact round-6 cosine over the shortlist
    only — the standard IVF-PQ serving shape (codes prune, originals
    re-rank); vectors are fetched narrowly by neighbor id, so the wide
    data touches only ``rerank`` rows per query. ``train_codebooks``: run
    the deterministic decimal Lloyd k-means (``kmeans_lloyd``, 2 iters)
    per subspace instead of raw hash-pivot subvectors — better codebooks,
    still deterministic, but the oracle replay cost moves from one CTE to
    m unrolled k-means, so the registry entry keeps it off (recall gain
    pinned in pytest instead).

    The vector splits into ``m_subspaces`` contiguous subspaces; each
    subspace has an ``n_codes``-word codebook, so a corpus vector is
    carried through the inverted lists as **m small ints + one rounded
    norm** instead of ``dim`` floats — the PQ memory win (64 doubles →
    4 bytes + 4 at these defaults). Scoring is **ADC** (asymmetric
    distance computation): each query precomputes one inner-product table
    per subspace against the codebook (m·n_codes rounded dots), and every
    candidate costs m table lookups instead of a dim-wide dot product.

    Determinism (the ``ivf_topk_hashed`` trick): coarse centroids are the
    corpus rows with the smallest ``md5(id)`` (ranks 1..n_lists), PQ
    codebook pivots are the NEXT ``n_codes`` rows in the same order, every
    similarity/distance is rounded to 6 dp before any rank/argmin, and all
    ties break on ids/codes — so list assignment, PQ codes, ADC scores,
    and the final top-k are pure relational algebra an independent SQL
    engine replays row-for-row (the ``v6_ivf_pq`` oracle does).

    Plan shape: pivots + centroids are one driver-side TakeOrdered
    (metadata: (n_lists+n_codes)·dim doubles) inlined as codegen literals;
    encode is a zero-shuffle projection; the only corpus exchange is the
    inverted-list build, and probed candidates shuffle as (query,
    neighbor, codes) — never vectors. A production encode at extreme dim
    would swap the literal argmin for an Arrow matmul (the
    ``assign_to_centroids`` ``method="arrow"`` pattern); at PQ-typical
    sub-dims the codegen path holds.
    """
    spark = corpus.sparkSession
    c = corpus.select(
        F.col(corpus_id).cast("long").alias("neighbor"),
        F.col(corpus_vec).cast("array<double>").alias("_cv"),
    )
    n_pivots = n_lists + n_codes
    pivot_rows = (
        c.withColumn("_h", F.md5(F.col("neighbor").cast("string")))
        .orderBy("_h", "neighbor")
        .limit(n_pivots)
        .collect()
    )
    if len(pivot_rows) < n_pivots:
        raise ValueError(
            f"corpus has {len(pivot_rows)} rows < n_lists+n_codes={n_pivots}"
        )
    dim = len(pivot_rows[0]["_cv"])
    if dim % m_subspaces:
        raise ValueError(f"dim {dim} not divisible by m={m_subspaces}")
    sub = dim // m_subspaces
    centroids = spark.createDataFrame(
        [(i + 1, list(r["_cv"])) for i, r in enumerate(pivot_rows[:n_lists])],
        "list_id int, centroid array<double>",
    )
    if train_codebooks:
        # decimal Lloyd per subspace (deterministic: seed = lowest ids)
        from matchbox_spark.operators.clustering import lloyd_centroids

        codebook = []
        for mi in range(m_subspaces):
            sub_df = c.select(
                F.col("neighbor").alias("vec_id"),
                F.slice(F.col("_cv"), mi * sub + 1, sub).alias("embedding"),
            )
            trained = lloyd_centroids(sub_df, k=n_codes, iters=2)
            codebook.append([list(trained[ci]) for ci in sorted(trained)])
    else:
        # codebook[m][c] = subvector m of pivot row (n_lists + c)
        codebook = [
            [
                [float(x) for x in pivot_rows[n_lists + ci]["_cv"][mi * sub : (mi + 1) * sub]]
                for ci in range(n_codes)
            ]
            for mi in range(m_subspaces)
        ]

    # The encode/ADC expressions build as SQL STRINGS parsed by ONE
    # F.expr each (optimization r14): the F.zip_with/F.aggregate wrappers
    # cost ~9 ms of py4j round trips PER higher-order function, and the
    # codebook fans out to m·n_codes·3 dots — 278 HOF constructions,
    # ~3.3 s of v6's measured 4.4 s driver-side plan-build time. The
    # parser yields the identical Literal/LambdaFunction trees (double
    # literals via repr() round-trip through parseDouble bit-exactly),
    # so plans and results are unchanged.
    def _sub(col, mi):
        return f"slice({col}, {mi * sub + 1}, {sub})"

    def _lit_sql(vals):
        return "array(" + ",".join(f"{float(v)!r}D" for v in vals) + ")"

    def _dot(a, b):
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, "
            "(acc, x) -> acc + x)"
        )

    def _l2sq(a, b):
        # expansion form ‖a‖² − 2a·b + ‖b‖², term order fixed — built from
        # the dot product both engines evaluate identically (the v1/v2b
        # precedent), so the oracle replays the encode argmin exactly
        return f"(({_dot(a, a)} - 2.0D * {_dot(a, b)}) + {_dot(b, b)})"

    # encode: per subspace, argmin over codeword L2² (round-6, tie → low
    # code). Codewords are literals — zero-shuffle codegen projection.
    def _code(col, mi):
        cands = ", ".join(
            "named_struct('d', round("
            + _l2sq(_sub(col, mi), _lit_sql(codebook[mi][ci]))
            + f", 6), 'c', {ci})"
            for ci in range(n_codes)
        )
        body = cands if n_codes == 1 else f"least({cands})"
        return F.expr(body)["c"]

    sim_c = F.round(cosine_expr(F.col("_cv"), F.col("centroid")), 6)
    assigned = (
        c.crossJoin(F.broadcast(centroids))
        .withColumn(
            "_arank",
            F.row_number().over(
                Window.partitionBy("neighbor").orderBy(
                    sim_c.desc(), F.asc("list_id")
                )
            ),
        )
        .where(F.col("_arank") == 1)
        .select(
            "neighbor",
            "list_id",
            F.expr(f"round(sqrt({_dot('_cv', '_cv')}), 6)").alias("_cnorm"),
            *[_code("_cv", mi).alias(f"_code{mi}") for mi in range(m_subspaces)],
        )
    )

    q = queries.select(
        F.col(query_id).cast("long").alias("query"),
        F.col(query_vec).cast("array<double>").alias("_qv"),
    )
    sim_q = F.round(cosine_expr(F.col("_qv"), F.col("centroid")), 6)
    q_lists = (
        q.crossJoin(F.broadcast(centroids))
        .withColumn(
            "_crank",
            F.row_number().over(
                Window.partitionBy("query").orderBy(
                    sim_q.desc(), F.asc("list_id")
                )
            ),
        )
        .where(F.col("_crank") <= n_probe)
        .select("query", "_qv", "list_id")
    )
    # ADC tables: per query, one array of round-6 inner products per
    # subspace (m·n_codes rounded dots — codegen, no shuffle)
    tbl_cols = [
        F.expr(
            "array("
            + ",".join(
                f"round({_dot(_sub('_qv', mi), _lit_sql(codebook[mi][ci]))}, 6)"
                for ci in range(n_codes)
            )
            + ")"
        ).alias(f"_tbl{mi}")
        for mi in range(m_subspaces)
    ]
    q_scored = q_lists.select(
        "query",
        "list_id",
        F.expr(f"round(sqrt({_dot('_qv', '_qv')}), 6)").alias("_qnorm"),
        *tbl_cols,
    )
    # candidate score: explicit left-assoc sum of the m table lookups, then
    # one cosine normalisation — both re-playable term-for-term in SQL
    adc_ip = F.element_at(F.col("_tbl0"), F.col("_code0") + 1)
    for mi in range(1, m_subspaces):
        adc_ip = adc_ip + F.element_at(F.col(f"_tbl{mi}"), F.col(f"_code{mi}") + 1)
    den = F.col("_qnorm") * F.col("_cnorm")
    approx = F.round(
        F.when(den > 0, F.round(adc_ip, 6) / den).otherwise(F.lit(0.0)), 6
    )
    scored = q_scored.join(assigned, "list_id").select(
        "query", "neighbor", approx.alias("approx_cosine")
    )
    if exclude_self:
        scored = scored.where(F.col("query") != F.col("neighbor"))
    w = Window.partitionBy("query").orderBy(
        F.desc("approx_cosine"), F.asc("neighbor")
    )
    if rerank is None:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query", "neighbor", "approx_cosine", "rank")
        )
    # exact re-rank of the ADC shortlist: original vectors join back by id
    # (narrow fetch — rerank rows per query, never a list's full contents)
    shortlist = (
        scored.withColumn("_srank", F.row_number().over(w))
        .where(F.col("_srank") <= int(rerank))
        .select("query", "neighbor")
    )
    exact = (
        shortlist.join(c, "neighbor")
        .join(q, "query")
        .select(
            "query",
            "neighbor",
            F.round(cosine_expr(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query", "neighbor", "cosine", "rank")
    )
