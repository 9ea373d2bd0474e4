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
    # sketch → estimate composition; the estimator lives ONCE in
    # kmv_estimate so the two paths can never drift
    return kmv_estimate(kmv_sketch(df, group_cols, value_col, k), group_cols, k)


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


def kmv_jaccard(
    a_sketch: DataFrame,
    b_sketch: DataFrame,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Set-operation estimates from two same-recipe KMV sketches — the
    theta-sketch trick: the union's k smallest uniforms are an unbiased
    sample of A ∪ B, so the fraction also present in BOTH sketches
    estimates Jaccard, and ``jaccard × |A ∪ B|`` estimates the
    intersection — "how many users appear in both datasets" without ever
    joining raw data. Returns ``(*group_cols, jaccard, est_union,
    est_intersection)`` (round-6 doubles; EXACT when the union fits the
    sketch). Groups missing from one side read as disjoint (jaccard 0)."""
    u = kmv_merge([a_sketch, b_sketch], group_cols, k)
    a_m = a_sketch.withColumn("_ina", F.lit(True))
    b_m = b_sketch.withColumn("_inb", F.lit(True))
    keys = [*group_cols, "u"]
    marked = u.join(a_m, keys, "left").join(b_m, keys, "left")
    agg = marked.groupBy(*group_cols).agg(
        F.count("*").alias("_n"),
        F.sum(
            (F.col("_ina").isNotNull() & F.col("_inb").isNotNull()).cast(
                "int"
            )
        ).alias("_both"),
        F.max("u").alias("_uk"),
    )
    union_est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("_uk"))
    jac = F.col("_both").cast("double") / F.col("_n").cast("double")
    return agg.select(
        *group_cols,
        F.round(jac, 6).alias("jaccard"),
        F.round(union_est, 6).alias("est_union"),
        F.round(jac * union_est, 6).alias("est_intersection"),
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter → semi-join reduction
# ---------------------------------------------------------------------------


def _md5_position(key: F.Column, i: int, modulo: int) -> F.Column:
    """Hash ``i`` of a (string) key: first 13 hex chars of
    ``md5(i || ':' || key)`` mod ``modulo`` — independent per i, identical
    in any engine sharing md5. The ONE position recipe Bloom build/probe
    and CMS build/probe all share: a drift between a builder's and a
    prober's hash would silently return wrong verdicts."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), key)), 1, 13), 16, 10
        ).cast("long")
        % F.lit(int(modulo))
    )


def _bloom_positions(key: F.Column, m_bits: int, k_hashes: int) -> F.Column:
    """k md5-derived bit positions for a (string) key (see
    :func:`_md5_position`)."""
    return F.array(*[_md5_position(key, i, m_bits) for i in range(k_hashes)])


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
) -> DataFrame:
    """Build a Bloom filter over a key column as ``(word_idx int,
    word long)`` rows — ⌈m/63⌉ longs (63 payload bits per word; the sign
    bit stays clear so checked engines accept every shift), the
    engine-portable bitset.

    The 100 TB use is semi-join reduction (the runtime-filter pattern):
    build on the selective side in one map-side-combinable ``bit_or``
    aggregate, broadcast the ≤ m/64-row word table, and pre-filter the
    probe side before the real join ships any data. Unlike Spark's
    internal runtime bloom filters the bitset here is DATA — it can be
    persisted, shipped across jobs/engines, and merged (OR the words,
    :func:`bloom_merge`). NULL keys are excluded (SQL semi-join
    semantics). Deterministic md5 hashing keeps membership — and
    therefore false-positive sets — bit-identical cross-engine."""
    if m_bits < 63:
        raise ValueError("m_bits must be >= 63")
    if k_hashes < 1:
        raise ValueError("k_hashes must be >= 1")
    key = F.col(key_col).cast("string")
    pos = (
        df.where(F.col(key_col).isNotNull())
        .select(
            F.explode(_bloom_positions(key, m_bits, k_hashes)).alias("pos")
        )
    )
    # 63 payload bits per long: the sign bit stays clear because a checked
    # engine (DuckDB) refuses `1 << 63` — the portable format trades one
    # bit per word for running verbatim everywhere. Floor-division via
    # `div` (NOT a double divide + int cast: DuckDB's CAST rounds while
    # Spark's truncates — `//`/`div` agree everywhere).
    return (
        pos.select(
            F.expr("pos div 63").cast("int").alias("word_idx"),
            # shiftleft with a COLUMN bit count needs expr (the F.shiftleft
            # wrapper only takes a literal count)
            F.expr("shiftleft(cast(1 as bigint), cast(pos % 63 as int))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_merge(blooms: list[DataFrame]) -> DataFrame:
    """OR Bloom word tables together — the union filter (parameters must
    match; membership in any input implies membership in the merge)."""
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_contains(
    probe: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 3,
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """Tag probe rows with Bloom membership of ``key_col`` (same m/k as
    the build). Plan shape: DISTINCT probe keys fan out to k (key,
    word_idx, bit) lookups, join the BROADCAST word table, fold to one
    verdict per key, and join back to the probe ON THE KEY — membership
    is a pure function of the key, so no synthetic row id is needed
    (monotonically_increasing_id is nondeterministic across task retries
    and would let verdicts attach to the wrong rows; see ADVICE r6).
    Deduping keys first is also cheaper when keys repeat. At scale,
    filter on the flag BEFORE the expensive join. NULL keys get
    ``false`` (no NULL ever enters the build)."""
    key = F.col(key_col).cast("string")
    keys = (
        probe.where(F.col(key_col).isNotNull())
        .select(key.alias("_bkey"))
        .distinct()
    )
    lookups = keys.select(
        "_bkey",
        F.explode(
            _bloom_positions(F.col("_bkey"), m_bits, k_hashes)
        ).alias("pos"),
    ).select(
        "_bkey",
        F.expr("pos div 63").cast("int").alias("word_idx"),
        (F.col("pos") % 63).cast("int").alias("bit"),
    )
    # sign-safe membership: AND against the shifted mask (a plain >> is
    # arithmetic vs logical depending on engine; & is not)
    mask = F.expr("shiftleft(cast(1 as bigint), bit)")
    hit = lookups.join(F.broadcast(bloom), "word_idx", "left").select(
        "_bkey",
        F.coalesce(
            F.col("word").bitwiseAND(mask) != 0, F.lit(False)
        ).alias("_set"),
    )
    verdict = hit.groupBy("_bkey").agg(
        (F.count("*") == F.sum(F.col("_set").cast("int"))).alias(flag_col)
    )
    return (
        probe.join(verdict, key == F.col("_bkey"), "left")
        .withColumn(
            flag_col,
            F.when(key.isNull(), F.lit(False)).otherwise(
                F.coalesce(F.col(flag_col), F.lit(False))
            ),
        )
        .drop("_bkey")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch → frequency estimation
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) over a key column:
    ``(row int, col int, n long)`` — depth·width counters, the mergeable
    frequency summary. Row r hashes a key to column ``md5(r:key) % width``
    (the Bloom position recipe, one independent hash per row); the counter
    update is ONE map-side-combinable sum, and two sketches over disjoint
    data merge by adding counters (:func:`cms_merge`).

    Estimates overcount, never undercount: collisions only ADD — the
    one-sided guarantee that makes CMS safe for threshold pre-passes
    ("every key with true count ≥ T passes") the way Bloom is safe for
    membership. Error bound: ε ≈ e/width of the total mass, with
    probability 1−e^−depth. ``weight_col`` (optional, long) counts weighted
    mass instead of rows. NULL keys are excluded. Deterministic md5 keeps
    every counter — and therefore every estimate — engine-identical."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    key = F.col(key_col).cast("string")
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    rows = df.where(F.col(key_col).isNotNull()).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _md5_position(key, r, width).cast("int").alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
        w.alias("_w"),
    )
    return (
        rows.select("rc.row", "rc.col", "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("n"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Add counter tables together — the union sketch (same width/depth)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "col").agg(F.sum("n").alias("n"))


def cms_estimate(
    probe: DataFrame,
    cms: DataFrame,
    key_col: str,
    width: int = 1024,
    depth: int = 4,
    est_col: str = "est_count",
) -> DataFrame:
    """Tag probe rows with the CMS frequency estimate of ``key_col``: the
    MINIMUM counter across the depth rows (absent counters read 0). The
    counter table broadcasts (depth·width rows); the lookup runs over
    DISTINCT probe keys — the estimate is a pure function of the key, so
    the verdict joins back ON THE KEY rather than a synthetic row id
    (monotonically_increasing_id is nondeterministic across task retries;
    see ADVICE r6) — depth broadcast-join hits and one min per distinct
    key, never a shuffle on probe data volume."""
    key = F.col(key_col).cast("string")
    keys = (
        probe.where(F.col(key_col).isNotNull())
        .select(key.alias("_ckey"))
        .distinct()
    )
    lookups = keys.select(
        "_ckey",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _md5_position(F.col("_ckey"), r, width)
                        .cast("int")
                        .alias("col"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("_ckey", "rc.row", "rc.col")
    hit = lookups.join(F.broadcast(cms), ["row", "col"], "left").select(
        "_ckey", F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("_n")
    )
    verdict = hit.groupBy("_ckey").agg(F.min("_n").alias(est_col))
    return (
        probe.join(verdict, key == F.col("_ckey"), "left")
        # NULL keys never enter the sketch: estimate 0, as before
        .withColumn(
            est_col, F.coalesce(F.col(est_col), F.lit(0).cast("long"))
        )
        .drop("_ckey")
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
    # clamp in DOUBLE space BEFORE floor/cast: a far-out-of-range value
    # (or ±Infinity) would otherwise overflow the long→int cast — wrapping
    # into an arbitrary interior bin (non-ANSI) or failing the job (ANSI) —
    # instead of clamping to the edge bin as documented. In-range values
    # are untouched (least/greatest are identities for scaled ∈ [0, n)).
    scaled = (v - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(float(n_bins))
    raw = F.floor(
        F.least(F.lit(float(n_bins)), F.greatest(F.lit(-1.0), scaled))
    )
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
