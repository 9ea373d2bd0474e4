"""Embedding clustering operators: Lloyd k-means and SemDeDup pruning.

The SemDeDup recipe (Abbas et al. 2023, arXiv:2303.09540) for semantic
deduplication of web-scale corpora: cluster the embedding space with
k-means, then prune near-duplicate pairs *within* clusters only — the
cluster partition bounds the pairwise comparison to ~(n/k)² per cluster
instead of n² overall, which is what makes cosine dedup feasible at
100 TB (k grows with the corpus so cluster populations stay bounded).

Spark plan shapes, per stage:

- **Assignment is shuffle-free.** Centroids are k tiny arrays; they are
  collected to the driver once per iteration (k·dim doubles — metadata
  sized) and inlined as literal arrays, so the nearest-centroid argmin is
  a single codegen projection (``least`` over k distance structs) on the
  scan — the same shape MLlib's KMeans uses (broadcast centroids), minus
  the RDD machinery.
- **The centroid update is one map-side-combinable aggregate.**
  ``posexplode`` → groupBy (cluster, dim) partial sums; k·dim result rows.
- **Cross-engine determinism** follows the PageRank recipe
  (``g6_pagerank``): per-element squared differences round to 12 dp and
  sum as DECIMAL(28,12) (exact, order-invariant), so the argmin compares
  decimals, not floats; centroid means round to 12 dp per iteration. Both
  engines walk the identical trajectory, which is what lets an unrolled
  DuckDB SQL oracle pin the result hash-exactly.

Reference parity: the reference has no embedding clustering (its linkers
stop at token similarity); this extends the dedup family the same way
``operators/dedup.py`` extends hashing — as a training-data-pipeline
operator the engine needs at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.functions.vectors import dot_expr, norm_expr

_DEC = "decimal(28,12)"


def _lit_array(values: list[float]) -> F.Column:
    return F.array(*[F.lit(float(v)) for v in values])


def _sqdist_dec(vec: F.Column, centroid: list[float]) -> F.Column:
    """Σ round((xᵢ−cᵢ)², 12) as DECIMAL(28,12) — exact, order-invariant."""
    diffs = F.zip_with(
        vec,
        _lit_array(centroid),
        lambda x, y: F.round((x - y) * (x - y), 12).cast(_DEC),
    )
    # the merge result widens to DECIMAL(29,12); cast back to the
    # accumulator type (lossless: 64 contributions each ≤ ~4)
    return F.aggregate(
        diffs, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    )


def assign_to_centroids(
    df: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: (id, cluster, dist DECIMAL(28,12)).

    Ties break to the lowest centroid id (the struct comparison orders by
    (dist, cid)). Zero shuffles — one projection over the scan.
    """
    v = F.col(vec_col).cast("array<double>")
    candidates = [
        F.struct(
            _sqdist_dec(v, arr).alias("d"), F.lit(int(cid)).alias("c")
        )
        for cid, arr in sorted(centroids.items())
    ]
    # F.least rejects a single argument — k=1 degenerates to the lone struct
    best = candidates[0] if len(candidates) == 1 else F.least(*candidates)
    return df.select(
        F.col(id_col).alias("id"),
        best["c"].alias("cluster"),
        best["d"].alias("dist"),
    )


def _seed_centroids(
    df: DataFrame, k: int, id_col: str, vec_col: str
) -> dict[int, list[float]]:
    """Deterministic init: the k rows with the smallest ids, as doubles."""
    rows = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy("id")
        .limit(k)
        .collect()
    )
    return {i: list(r["v"]) for i, r in enumerate(rows)}


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means over an embedding column; returns the final assignment
    ``(id, cluster, sqdist)`` (sqdist = squared L2 to the winning centroid,
    rounded to 6 dp).

    ``iters`` assignment passes run with a centroid update between each —
    the last assignment is returned without a trailing update. Empty
    clusters keep their previous centroid. The per-iteration driver state
    is k·dim doubles; everything else is one aggregate per iteration.
    """
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    centroids = _seed_centroids(df, k, id_col, vec_col)
    assigned = assign_to_centroids(df, centroids, id_col, vec_col)
    for _ in range(iters - 1):
        # one update then one fresh assignment
        exploded = (
            df.select(
                F.col(id_col).alias("id"),
                F.posexplode(F.col(vec_col).cast("array<double>")).alias(
                    "pos", "val"
                ),
            )
            .join(assigned.select("id", "cluster"), "id")
        )
        means = (
            exploded.groupBy("cluster", "pos")
            .agg(
                F.sum(F.round("val", 12).cast(_DEC)).alias("s"),
                F.count("*").alias("n"),
            )
            .select(
                "cluster",
                "pos",
                F.round(F.col("s").cast("double") / F.col("n"), 12).alias(
                    "val"
                ),
            )
            .collect()
        )
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["val"]
        # empty clusters keep their previous centroid
        centroids = {
            cid: (
                [by_cluster[cid][p] for p in sorted(by_cluster[cid])]
                if cid in by_cluster
                else prev
            )
            for cid, prev in centroids.items()
        }
        assigned = assign_to_centroids(df, centroids, id_col, vec_col)
    return assigned.select(
        "id",
        "cluster",
        F.round(F.col("dist").cast("double"), 6).alias("sqdist"),
    )


def semdedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: nearest-seed clustering, then within-cluster cosine
    pruning. Returns every row as ``(id, cluster, keep)`` — ``keep`` is
    false when a same-cluster row with a smaller id has cosine ≥
    ``threshold`` (round-6 compare, matching ``v1_cosine_topk``'s pinning).

    One assignment projection (no shuffle), then the quadratic term is
    (n/k)² per cluster — at corpus scale k rises with n to hold cluster
    populations constant. Plan shape: pair IDS materialise through the
    cluster-keyed self-join as narrow (ida, idb) rows, and the vectors
    join back BY ID — so the expensive cosine evaluates in id-hashed
    partitions at full parallelism instead of being bounded by the k
    distinct cluster keys (with k=8 the naive join-on-cluster runs the
    whole pair stream on ≤8 tasks).
    """
    centroids = _seed_centroids(df, k, id_col, vec_col)
    assigned = assign_to_centroids(df, centroids, id_col, vec_col).select(
        "id", "cluster"
    )
    # norms computed once per row, not once per pair; the per-pair formula
    # stays dot/(na·nb) — the identical float path the oracle's
    # dot/(sqrt·sqrt) takes, so round-6 parity holds
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    vecs = vecs.select("id", "v", norm_expr("v").alias("nrm"))
    a_ids = assigned.select("cluster", F.col("id").alias("ida"))
    b_ids = assigned.select("cluster", F.col("id").alias("idb"))
    pair_ids = (
        a_ids.join(b_ids, "cluster")
        .where(F.col("ida") < F.col("idb"))
        .select("ida", "idb")
    )
    va = vecs.select(
        F.col("id").alias("ida"), F.col("v").alias("va"), F.col("nrm").alias("na")
    )
    vb = vecs.select(
        F.col("id").alias("idb"), F.col("v").alias("vb"), F.col("nrm").alias("nb")
    )
    den = F.col("na") * F.col("nb")
    cos = F.when(den > 0, dot_expr("va", "vb") / den).otherwise(F.lit(0.0))
    dups = (
        pair_ids.join(va, "ida")
        .join(vb, "idb")
        .where(F.round(cos, 6) >= F.lit(float(threshold)))
        .select(F.col("idb").alias("id"))
        .distinct()
    )
    return (
        assigned.join(dups.withColumn("_dup", F.lit(True)), "id", "left")
        .select(
            "id",
            "cluster",
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )
