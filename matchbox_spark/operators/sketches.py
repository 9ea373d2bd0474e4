"""Mergeable cardinality sketches: K-Minimum-Values distinct counting.

The 100 TB distinct-count problem: ``COUNT(DISTINCT x)`` shuffles every
distinct value; a KMV sketch (Bar-Yossef et al. 2002) keeps only the k
smallest hash values per group — a bounded, mergeable summary — and
estimates the cardinality as ``(k-1) / u_k`` where ``u_k`` is the k-th
smallest uniform. Merging two sketches is "union then keep the k
smallest", so partial sketches combine associatively across partitions,
batches, or days.

Spark plan shape: one map-side-combinable distinct on (group, u), then a
``row_number() <= k`` filter that Catalyst rewrites to WindowGroupLimit —
each task pre-prunes its partition to its local top-k BEFORE the exchange,
so the shuffle carries at most k rows per group per task, never the value
stream. The final per-group aggregate is two scalars (count, max).

Cross-engine exactness: the uniform is the md5-prefix recipe every
deterministic-sampling op here uses (13 hex chars → 52-bit integer,
``(v + 0.5) / 2^52``) — bit-identical in Spark and DuckDB, so estimates
hash-match an SQL oracle exactly. Spark's native approx_count_distinct
(HLL++) is the interoperability-free alternative; this sketch exists
because its state is engine-portable and its math is oracle-checkable.

Reference parity: the reference has no sketches (its counts run in
Postgres); this extends the curation/report family (``c7_report``
documents exactly this swap-in point for corpus-scale distinct counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TWO_52 = 4503599627370496.0  # 2^52


def md5_uniform(col: F.Column) -> F.Column:
    """Deterministic uniform in (0, 1): 13 hex chars of md5 → 52-bit int,
    ``(v + 0.5) / 2^52`` — the shared engine/oracle recipe (same as
    o8_weighted_sample). Input must already be a string."""
    v = F.conv(F.substring(F.md5(col), 1, 13), 16, 10).cast("long")
    return (v.cast("double") + F.lit(0.5)) / F.lit(_TWO_52)


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest md5-uniforms of the distinct
    values. Returns ``(*group_cols, u)`` rows — at most k per group —
    plus nothing else, so a sketch is itself a tiny DataFrame that can be
    stored, shipped, or merged (union two sketches and re-apply
    :func:`kmv_sketch`'s rank filter to merge).

    Distinct hash values stand in for distinct raw values: two distinct
    inputs collide with probability ~n²/2⁵³ (negligible, and identical in
    any engine sharing the hash), which is the standard KMV trade.

    Plan caveat (measured, tools/stress_sketches.py): Catalyst's
    WindowGroupLimit rewrite only fires when k ≤
    ``spark.sql.window.group.limit.threshold`` (default 1000). Above that
    the rank filter still runs but WITHOUT per-task pre-pruning — the full
    distinct-u stream shuffles. k beyond 1000 buys < 3.2% standard error;
    if you need it, raise the threshold conf alongside k.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator divides by k-1)")
    # NULL values are excluded (COUNT(DISTINCT) semantics). Left in, they
    # would produce a NULL uniform that Spark's window orders NULLS FIRST
    # but DuckDB orders NULLS LAST — a silent cross-engine divergence.
    u = md5_uniform(F.col(value_col).cast("string")).alias("u")
    distinct_u = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, u)
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        distinct_u.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from a KMV sketch:
    ``(*group_cols, n_sketch, est_distinct)``.

    When a group holds fewer than k distinct values the sketch IS the
    value set and the estimate is exact (``n_sketch``); otherwise the
    classic unbiased estimator ``(k-1) / u_k`` applies, with u_k the k-th
    smallest uniform. ``est_distinct`` rounds to 6 dp (pure double
    arithmetic on identical inputs — oracle-exact).
    """
    sketch = kmv_sketch(df, group_cols, value_col, k)
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("n_sketch"),
        F.max("u").alias("_uk"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("_uk"))
    return agg.select(
        *group_cols,
        "n_sketch",
        F.round(est, 6).alias("est_distinct"),
    )


def kmv_merge(
    sketches: list[DataFrame], group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge KMV sketches (outputs of :func:`kmv_sketch` over the same
    hash): union all, drop duplicate uniforms, keep each group's k
    smallest. The result is a valid sketch of the UNION of the underlying
    value sets — the property that lets per-day / per-source sketches
    roll up without touching raw data."""
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    merged = merged.distinct()
    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        merged.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .drop("_rk")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Estimate per-group distinct counts from an existing sketch (same
    math as :func:`kmv_distinct`, split out so merged sketches can be
    estimated without re-scanning data)."""
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("n_sketch"),
        F.max("u").alias("_uk"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("_uk"))
    return agg.select(
        *group_cols, "n_sketch", F.round(est, 6).alias("est_distinct")
    )


# ---------------------------------------------------------------------------
# Fixed-boundary histogram sketch → interpolated quantiles
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 1000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group fixed-boundary histogram: ``(*group_cols, bin, n)``.

    ``bin = clamp(floor((v − lo) / (hi − lo) · n_bins), 0, n_bins−1)`` —
    out-of-range values clamp to the edge bins. The sketch is ONE
    map-side-combinable aggregate (n_bins·groups counters, merged by
    summing), the single-pass alternative to an exact percentile sort at
    corpus scale; two sketches over disjoint data merge by adding counts.
    Deterministic: the bin index is pure double arithmetic + floor,
    identical in any IEEE engine — no sampling, no randomized compaction
    (the t-digest/KLL trade this sketch refuses so oracles stay exact)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if not (hi > lo):
        raise ValueError("hi must be > lo")
    groups = list(group_cols or [])
    v = F.col(value_col).cast("double")
    raw = F.floor((v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins)))
    b = F.least(
        F.lit(n_bins - 1), F.greatest(F.lit(0), raw.cast("int"))
    ).alias("bin")
    # NULLs (and NaN, whose bin arithmetic is NULL-like garbage) excluded —
    # aggregate semantics, and a NULL bin row would corrupt the cumulative
    # quantile walk
    return (
        df.where(v.isNotNull() & ~F.isnan(v))
        .select(*groups, b)
        .groupBy(*groups, "bin")
        .agg(F.count("*").alias("n"))
    )


def histogram_quantiles(
    sketch: DataFrame,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1000,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Interpolated quantile estimates from a :func:`histogram_sketch`:
    ``(*group_cols, q, est)``. For each q: the first bin whose cumulative
    count reaches ``q · total``, linearly interpolated inside the bin —
    error is bounded by one bin width. The quantile list broadcasts (a few
    literals); cumulative counts are one window per group over ≤ n_bins
    rows — metadata-sized by construction."""
    if any(not (0.0 < q <= 1.0) for q in quantiles):
        raise ValueError("quantiles must lie in (0, 1]")
    groups = list(group_cols or [])
    width = float(hi - lo) / float(n_bins)
    w = Window.partitionBy(*groups).orderBy("bin") if groups else Window.orderBy("bin")
    cum = sketch.withColumn("cum", F.sum("n").over(w))
    tot = cum.groupBy(*groups).agg(F.max("cum").alias("total"))
    cum = cum.join(tot, groups) if groups else cum.crossJoin(tot)
    spark = sketch.sparkSession
    qdf = spark.createDataFrame([(float(q),) for q in quantiles], "q double")
    j = cum.crossJoin(F.broadcast(qdf))
    t = F.col("q") * F.col("total").cast("double")
    hit = j.where((F.col("cum").cast("double") >= t) & ((F.col("cum") - F.col("n")).cast("double") < t))
    est = (
        F.lit(float(lo))
        + F.col("bin").cast("double") * F.lit(width)
        + (t - (F.col("cum") - F.col("n")).cast("double"))
        / F.col("n").cast("double")
        * F.lit(width)
    )
    return hit.select(*groups, "q", F.round(est, 6).alias("est"))
