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

from matchbox_spark.functions.vectors import dot_expr, norm_expr, vector_dim

_DEC = "decimal(28,12)"

# above this many centroids the literal-centroid plan is abandoned for the
# broadcast-centroid plan: k structs inlined as plan literals blow up
# analysis/codegen around k·dim ≳ 1e5 expressions, while SemDeDup's own
# scale rule grows k with the corpus — so the 100 TB path must carry
# centroids as DATA, not as plan nodes
LITERAL_CENTROID_MAX = 256


def _lit_array(values: list[float]) -> F.Column:
    """Literal double array as ONE parsed SQL expression (optimization r14).

    ``F.array(*[F.lit(v) ...])`` costs one py4j round trip per element —
    ~65 per centroid, thousands per k-means assignment build, measured as
    multi-second driver-side plan-construction time on v5/v6/d11. The SQL
    double literal parses through Double.parseDouble on Python repr()
    output (shortest round-trip form), so the resulting Literal nodes are
    bit-identical to F.lit's. Non-finite values fall back to F.lit."""
    import math

    vals = [float(v) for v in values]
    if vals and all(math.isfinite(v) for v in vals):
        return F.expr("array(" + ",".join(f"{v!r}D" for v in vals) + ")")
    return F.array(*[F.lit(v) for v in vals])


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
    method: str = "auto",
) -> DataFrame:
    """Nearest-centroid assignment: (id, cluster, dist DECIMAL(28,12)).

    Ties break to the lowest centroid id. Three physical plans:

    - ``literal`` (default for k ≤ LITERAL_CENTROID_MAX): centroids inline
      as plan literals; the argmin is one codegen projection over the scan
      (``least`` over k round-12 DECIMAL(28,12) distance structs — the
      cross-engine-exact recipe the DuckDB oracles pin). Zero shuffles —
      but plan size grows with k·dim.
    - ``broadcast``: centroids ride as DATA — a one-row broadcast frame
      holding ``array<struct<c,v>>``, crossJoined onto every row; the
      argmin is ``array_min`` over a ``transform``, computed in scaled-long
      fixed point. BIT-IDENTICAL to ``literal`` (same rounding, same
      decimal dist, same tie-break) with a constant-size plan — the exact
      path for k beyond the literal bound. Interpreted higher-order
      functions cap throughput (~ms/row·k), so it is an explicit opt-in.
    - ``arrow`` (default for large k): mapInPandas over Arrow batches,
      nearest centroid via one BLAS matmul (``‖x‖² − 2·X@Cᵀ + ‖c‖²``) per
      batch — the 100 TB path SemDeDup's k-grows-with-n rule requires
      (~1000× the interpreted-expression paths at k = 4096). Distance is
      plain float64 (emitted as ``dist double``, not decimal) — argmin
      agrees with the exact paths except on exact decimal near-ties, which
      real embedding data does not produce (stress-checked sample-exact in
      tools/stress_large_k.py).

    ``auto`` dispatches literal below the bound, arrow above; pass
    ``method="broadcast"`` when large-k runs must stay bit-compatible with
    the oracle recipe at the cost of throughput.
    """
    if method not in ("auto", "literal", "broadcast", "arrow"):
        raise ValueError(f"unknown assignment method {method!r}")
    if method == "arrow" or (
        method == "auto" and len(centroids) > LITERAL_CENTROID_MAX
    ):
        return _assign_arrow(df, centroids, id_col, vec_col)
    if method == "broadcast":
        return _assign_broadcast(df, centroids, id_col, vec_col)
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


def _assign_broadcast(
    df: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Broadcast-centroid nearest-centroid assignment (constant plan size).

    The centroid table collapses to ONE row carrying the full
    ``array<struct<c:int, v:array<double>>>`` so the crossJoin broadcasts
    k·dim doubles once per executor; per input row a single ``transform``
    evaluates the distance to every centroid and ``array_min`` takes the
    (dist, cid)-lexicographic best — the same argmin the literal path's
    ``least`` computes. The vector is pre-projected once (``_v``) so the
    higher-order-function lambdas reference a bound attribute, not a
    re-inlined cast per element (the d3 ``bind_once`` lesson).

    Arithmetic is SCALED-LONG fixed point, not per-element BigDecimal:
    every term is ``round((x−y)², 12)`` — an exact multiple of 1e-12 whose
    scaled integer fits a long — so the k·dim inner loop runs on primitive
    longs (~100× BigDecimal) and only the WINNING distance converts back
    to DECIMAL(28,12), exactly. Ordering of longs == ordering of the
    decimals (same positive scale), so argmin, tie-breaks, and the emitted
    decimal are bit-identical to the literal path. Bound: the scaled sum
    overflows long only when Σ round(d²,12) > ~9.2e6 — far beyond any
    embedding-space distance; ANSI mode makes an overflow raise loudly
    rather than corrupt.
    """
    spark = df.sparkSession
    rows = [
        (int(cid), [float(x) for x in vec])
        for cid, vec in sorted(centroids.items())
    ]
    cents = (
        spark.createDataFrame(rows, "c int, v array<double>")
        .agg(F.array_sort(F.collect_list(F.struct("c", "v"))).alias("cents"))
    )
    pre = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    joined = pre.crossJoin(F.broadcast(cents))
    vv = F.col("_v")

    def dist_struct(cv: F.Column) -> F.Column:
        # round((x−y)², 12) is k/1e12 for integer k; round(·1e12) recovers
        # k exactly (the product sits within 4e-4 of the integer)
        diffs = F.zip_with(
            vv,
            cv["v"],
            lambda x, y: F.round(
                F.round((x - y) * (x - y), 12) * F.lit(1e12)
            ).cast("long"),
        )
        dd = F.aggregate(diffs, F.lit(0).cast("long"), lambda acc, x: acc + x)
        return F.struct(dd.alias("d"), cv["c"].alias("c"))

    best = F.array_min(F.transform(F.col("cents"), dist_struct))
    # exact long → DECIMAL(28,12) reconstruction: decimal division by the
    # scale is exact (≤12 dp by construction), then a lossless down-cast
    dist_dec = (
        best["d"].cast("decimal(28,12)")
        / F.lit(1_000_000_000_000).cast("decimal(13,0)")
    ).cast(_DEC)
    return joined.select(
        "id", best["c"].alias("cluster"), dist_dec.alias("dist")
    )


def _assign_arrow(
    df: DataFrame,
    centroids: dict[int, list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Vectorized nearest-centroid assignment over Arrow batches.

    Centroids ship in the task closure as one k×dim float64 matrix
    (broadcast once per executor); each Arrow batch computes all distances
    with a single matmul, row-chunked so the n_chunk×k temporary stays
    ≤ ~64 MB regardless of k. ``np.argmin`` takes the FIRST minimum and
    columns are ordered by ascending centroid id, so ties break low —
    matching the exact paths' (dist, cid) ordering. ``dist`` is float64
    squared L2 (expansion form, clamped at 0).
    """
    import numpy as np
    import pandas as pd

    cids = np.array(sorted(centroids), dtype=np.int64)
    cmat = np.array([centroids[int(c)] for c in cids], dtype=np.float64)
    cnorm = (cmat * cmat).sum(axis=1)
    k = len(cids)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(pdf["_v"].tolist(), dtype=np.float64)
            out_c = np.empty(len(x), dtype=np.int64)
            out_d = np.empty(len(x), dtype=np.float64)
            step = max(1, int(8_000_000 / k))  # n_chunk×k temp ≤ ~64 MB
            for s in range(0, len(x), step):
                xs = x[s : s + step]
                d2 = (
                    (xs * xs).sum(axis=1)[:, None]
                    - 2.0 * (xs @ cmat.T)
                    + cnorm[None, :]
                )
                j = np.argmin(d2, axis=1)
                out_c[s : s + len(xs)] = cids[j]
                out_d[s : s + len(xs)] = d2[np.arange(len(xs)), j]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cluster": out_c.astype(np.int32),
                    "dist": np.maximum(out_d, 0.0),
                }
            )

    pre = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    id_type = pre.schema["id"].dataType.simpleString()
    return pre.mapInPandas(assign, f"id {id_type}, cluster int, dist double")


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
    assign_method: str = "auto",
) -> DataFrame:
    """Lloyd k-means over an embedding column; returns the final assignment
    ``(id, cluster, sqdist)`` (sqdist = squared L2 to the winning centroid,
    rounded to 6 dp).

    ``iters`` assignment passes run with a centroid update between each —
    the last assignment is returned without a trailing update. Empty
    clusters keep their previous centroid. The per-iteration driver state
    is k·dim doubles; everything else is one aggregate per iteration.

    Scale bound (documented, not silent): centroids are DRIVER-resident
    between iterations — k·dim doubles collected per update — so the
    design holds to k·dim ≈ 1e7 (e.g. 65k clusters × 128-dim ≈ 64 MB)
    and the assignment itself scales past that via the arrow path. Beyond
    driver memory the update would need DataFrame-resident centroids
    (join-based update, no collect); no current caller approaches that.
    """
    centroids = lloyd_centroids(df, k, iters, id_col, vec_col, assign_method)
    assigned = assign_to_centroids(df, centroids, id_col, vec_col, assign_method)
    return assigned.select(
        "id",
        "cluster",
        F.round(F.col("dist").cast("double"), 6).alias("sqdist"),
    )


def lloyd_centroids(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_method: str = "auto",
) -> dict[int, list[float]]:
    """The trained centroid set after ``iters − 1`` Lloyd updates — exactly
    the centroids :func:`kmeans_lloyd`'s final assignment uses. Exposed so
    other operators (e.g. IVF-PQ sub-quantiser codebooks) can reuse the
    deterministic decimal training without re-deriving the recipe.
    """
    if k < 1 or iters < 1:
        raise ValueError("k and iters must be >= 1")
    centroids = _seed_centroids(df, k, id_col, vec_col)
    for _ in range(iters - 1):
        assigned = assign_to_centroids(
            df, centroids, id_col, vec_col, assign_method
        )
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
    return centroids


def semdedup(
    df: DataFrame,
    k: int = 8,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_method: str = "auto",
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
    # the assignment feeds BOTH pair sides and the final keep join — three
    # plan copies, each re-running the k·dim decimal argmin over the full
    # corpus (measured ~1 s per copy at sf0.1, r14). Materialise it once:
    # (id, cluster) is 16 bytes/row, linear next to the operator's (n/k)²
    # pair contract (guide §5 — reuse costs more to recompute than to hold)
    assigned = assign_to_centroids(
        df, centroids, id_col, vec_col, assign_method
    ).select("id", "cluster").localCheckpoint(eager=True)
    # norms computed once per row, not once per pair; the per-pair formula
    # stays dot/(na·nb) — the identical float path the oracle's
    # dot/(sqrt·sqrt) takes, so round-6 parity holds. The dim probe
    # unrolls the per-pair dot into codegen (bit-equal left fold, r14) —
    # the pair stage is this operator's quadratic term, so the one probe
    # job amortises unlike the window-heavy top-k plans where it lost.
    dim = vector_dim(df, vec_col)
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    vecs = vecs.select("id", "v", norm_expr("v", dim).alias("nrm"))
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
    cos = F.when(den > 0, dot_expr("va", "vb", dim) / den).otherwise(F.lit(0.0))
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
