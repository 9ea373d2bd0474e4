"""Corpus-curation operators: sequence packing and stratified sampling.

Training-data pipelines between dedup and tokenisation need two more
relational primitives:

- **Sequence packing**: assign documents to fixed-token-budget packs
  (context windows). True first-fit packing is inherently sequential; the
  scalable form every large pipeline uses is sharded contiguous packing —
  hash documents into shards, order deterministically within each shard,
  and cut packs by running token count. One shuffle (the per-shard window);
  shards are independent, so 1000 executors pack 1000 shards concurrently.
- **Stratified sampling**: top-n per stratum in deterministic hash order —
  balanced per-language / per-source training mixes without a seed, stable
  across runs and engines.

Both are pure window compositions (no UDFs), and both state their exact
semantics relationally so a SQL oracle can pin them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    n_shards: int = 1024,
    shard_expr=None,
) -> DataFrame:
    """Assign each document a ``(shard, pack)`` id by contiguous packing.

    Documents hash into ``n_shards`` shards; within a shard, documents are
    ordered by id and packed by EXCLUSIVE running token count: a document's
    pack index is ``floor(tokens_before_it / budget)``. Consequences worth
    stating exactly: an oversized document may overflow whatever pack it
    lands in (it shares that pack with any documents already there), and
    because it advances the running count by more than one budget, pack
    indices within a shard are monotone but NOT contiguous — values can be
    skipped after a giant document. Downstream truncation is the
    tokeniser's decision, not the packer's.

    Returns the input columns plus ``shard``, ``pack`` (0-based within
    shard), and ``pack_id`` (globally unique ``shard * 2^32 + pack``).

    Scale shape: one shuffle on ``shard`` (pmod of a 64-bit hash); each
    window is one shard, so parallelism == n_shards and no global order
    exists anywhere in the plan.

    ``shard_expr`` overrides the shard assignment (default: xxhash64 pmod —
    fastest JVM-side; pass an md5-based expression when cross-engine
    reproducibility matters more than hash speed).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive: {budget}")
    shard = (
        shard_expr
        if shard_expr is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    ).alias("shard")
    w = Window.partitionBy("shard").orderBy(id_col)
    cum_excl = F.coalesce(
        F.sum(F.col(token_col)).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        df.withColumn("shard", shard)
        .withColumn("pack", F.floor(cum_excl / F.lit(budget)).cast("long"))
        .withColumn(
            "pack_id",
            (F.col("shard").cast("long") * F.lit(1 << 32)) + F.col("pack"),
        )
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key_col: str,
) -> DataFrame:
    """Deterministic top-n per stratum, ordered by SHA-256 of the key.

    Seedless and engine-portable: the hash order is a fixed pseudo-random
    permutation, so the same rows are chosen on every run and every engine
    (O5 semantics per stratum). One shuffle on the strata columns.
    """
    if n_per_stratum <= 0:
        raise ValueError(f"n_per_stratum must be positive: {n_per_stratum}")
    w = Window.partitionBy(*strata_cols).orderBy(
        F.sha2(F.col(key_col).cast("string"), 256), key_col
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def quota_rebalance(
    df: DataFrame,
    strata_cols: list[str],
    quotas: dict[str, int],
    key_col: str,
    default_quota: int = 0,
) -> DataFrame:
    """Per-stratum quota sampling: each stratum keeps at most its quota of
    rows (deterministic hash order), unknown strata keep ``default_quota``.

    ``quotas`` keys are the string form of the (single) strata column value;
    multi-column strata pass a struct-cast string. The quota table joins as
    a broadcast (it is config-sized), so the plan stays one shuffle.
    """
    if len(strata_cols) != 1:
        raise ValueError("quota_rebalance takes exactly one strata column")
    col = strata_cols[0]
    spark = df.sparkSession
    # explicit schema, no sentinel row — an empty-string stratum is a
    # legitimate key and keeps its configured quota
    qdf = spark.createDataFrame(
        [(k, int(v)) for k, v in quotas.items()], f"{col} string, _quota int"
    )
    w = Window.partitionBy(col).orderBy(
        F.sha2(F.col(key_col).cast("string"), 256), key_col
    )
    return (
        df.join(F.broadcast(qdf), col, "left")
        .withColumn("_quota", F.coalesce("_quota", F.lit(int(default_quota))))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Token-budget mixture construction — the training-mix step: per
    source s, a target of ``floor(token_budget · w_s)`` tokens; documents
    admit in md5-of-id order while the RUNNING token total stays within
    target (a document whose tokens would cross the line is refused, as
    are all behind it). Returns admitted rows as ``(id, source, n_tokens,
    cum_tokens)``.

    Deterministic and seedless (the md5 order is a fixed pseudo-random
    permutation — the o5/o8 recipe), so re-running over grown data keeps
    earlier picks stable within each source. Sources absent from
    ``weights`` are dropped. Plan shape: the weight table broadcasts
    (config-sized); one shuffle on the source column; the cumulative
    window orders each source's partition once. The greedy
    cross-the-line-stop can under-fill a target by at most one document —
    the determinism-for-exactness trade this operator makes deliberately
    (a best-fit repack would be order-dependent)."""
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    bad = [k for k, v in weights.items() if v < 0]
    if bad:
        raise ValueError(f"negative weights for {bad}")
    spark = df.sparkSession
    # Exact decimal arithmetic for the targets: int(float(0.29) * 100)
    # truncates the binary-float product to 28, while the documented
    # floor(budget·w) — and a SQL engine's DECIMAL arithmetic — gives 29.
    # Decimal(str(w)) reproduces the literal the user wrote, so engine and
    # oracle agree for ALL weights, not just dyadic ones (ADVICE r6).
    from decimal import Decimal

    tdf = spark.createDataFrame(
        [
            (k, int(Decimal(str(v)) * token_budget))
            for k, v in weights.items()
        ],
        f"{source_col} string, _target long",
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    cum = F.sum(F.col(tokens_col)).over(w)
    return (
        df.join(F.broadcast(tdf), source_col)
        .withColumn("_cum", cum)
        .where(F.col("_cum") <= F.col("_target"))
        .select(
            F.col(id_col).alias("id"),
            source_col,
            F.col(tokens_col).cast("long").alias("n_tokens"),
            F.col("_cum").cast("long").alias("cum_tokens"),
        )
    )


def dedupe_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
) -> DataFrame:
    """C4-style corpus-wide line deduplication (Raffel et al. 2020 §2.2):
    every distinct line is kept exactly once — at its FIRST occurrence in
    corpus order (min ``(doc, position)``) — and removed everywhere else;
    documents are reassembled from their surviving lines in original order.

    Returns one row per input document: ``(doc, text, n_kept, n_dropped)``
    — a document all of whose lines appeared earlier collapses to the empty
    string rather than disappearing (the caller decides whether to filter).

    Scale shape: first occurrences come from ``min(struct(doc, pos))``
    grouped by line — an algebraic aggregate with map-side partial combine,
    so a VIRAL line (boilerplate in 10⁹ documents) reduces to one row per
    input partition before the shuffle instead of sorting the whole hot
    group in one task (the row_number-window formulation has exactly that
    straggler). The join back on ``line`` is skew-splittable by AQE; the
    reassembly shuffle is keyed by ``doc`` and bounded by a single
    document's line count.
    """
    # F.split treats its pattern as a Java regex while array_join (the
    # reassembly below) treats ``sep`` literally — quote the separator
    # (Java Pattern.quote form) so a metacharacter sep ('.', '|') splits
    # on the literal character instead of silently corrupting documents.
    sep_pattern = "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    lines = df.select(
        F.col(id_col).cast("long").alias("doc"),
        F.posexplode(F.split(F.col(text_col), sep_pattern)).alias("pos", "line"),
    )
    firsts = lines.groupBy("line").agg(
        F.min(F.struct("doc", "pos")).alias("_first")
    )
    marked = lines.join(firsts, "line").withColumn(
        "_keep",
        (F.col("doc") == F.col("_first.doc"))
        & (F.col("pos") == F.col("_first.pos")),
    )
    rebuilt = (
        marked.groupBy("doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_keep"),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text"),
            F.sum(F.col("_keep").cast("long")).alias("n_kept"),
            F.sum((~F.col("_keep")).cast("long")).alias("n_dropped"),
        )
    )
    return rebuilt


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Sliding-window document chunking (the RAG/embedding preprocessing
    step): token windows of ``size`` starting every ``size - overlap``
    tokens, so consecutive chunks share ``overlap`` tokens and the final
    chunk may run short.

    Returns ``(doc, chunk_idx, chunk_text, n_tokens)`` — ``chunk_idx`` is
    0-based within the document.

    Scale shape: pure array expressions per row (tokenise once, slice per
    window) followed by one explode — no shuffle at all; chunking is
    embarrassingly parallel and stays inside whole-stage codegen.
    """
    if size <= 0 or overlap < 0 or overlap >= size:
        raise ValueError(
            f"need size > 0 and 0 <= overlap < size: size={size}, "
            f"overlap={overlap}"
        )
    stride = size - overlap
    from matchbox_spark.functions.text import bind_once, tokens_expr

    # bind_once: the token array appears inside the chunk lambda — inlined,
    # every chunk start would re-tokenise the whole document
    chunks = bind_once(
        tokens_expr(text_col),
        lambda arr: F.when(
            F.size(arr) > 0,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - 1, F.lit(stride)),
                lambda s: F.slice(arr, s + 1, size),
            ),
        ).otherwise(F.array().cast("array<array<string>>")),
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc"),
        F.posexplode(chunks).alias("chunk_idx", "_c"),
    ).select(
        "doc",
        "chunk_idx",
        F.array_join("_c", " ").alias("chunk_text"),
        F.size("_c").alias("n_tokens"),
    )


def dsir_logweights(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    top_k: int | None = None,
) -> DataFrame:
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): per-document
    hashed-n-gram importance log-weights against a target domain.

    ``target_cond`` is a boolean Column selecting the target subset (e.g.
    ``F.col("lang") == "en"``); the raw distribution is the whole input.
    Features are word BIGRAMS hashed into ``n_buckets`` via the first 8 hex
    chars of md5 (cross-engine reproducible, unlike xxhash64); per-bucket
    add-1-smoothed probabilities give ``r(b) = ln p_target(b) − ln p_raw(b)``
    and a document's log importance weight is the sum of ``r`` over its
    feature OCCURRENCES (counts, not distincts — the DSIR estimator).

    Plan shape: two vocabulary-sized bucket-count aggregates (map-side
    combinable), a broadcast-sized log-ratio table (≤ n_buckets rows)
    joined into one bigram explode, then one groupBy(doc). The corpus
    shuffles once on doc id. Cross-engine: per-feature ratios round to
    6 dp and sum as DECIMAL(18,6) (the t8 recipe), so weights are
    bit-stable. Returns ``(doc, n_feats, logw)``; ``top_k`` orders by
    (logw DESC, doc) — the selection DSIR feeds a sampler with.
    """
    from matchbox_spark.functions.text import tokens_expr

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    toks = docs.select(
        F.col(id_col).alias("doc"),
        target_cond.alias("_tgt"),
        tokens_expr(text_col).alias("_t"),
    )
    grams = toks.select(
        "doc",
        "_tgt",
        F.explode(
            F.zip_with(
                F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                F.slice(F.col("_t"), 2, F.greatest(F.size("_t") - 1, F.lit(0))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("gram"),
    ).select(
        "doc",
        "_tgt",
        (
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("long")
            % n_buckets
        ).alias("bucket"),
    )
    raw = grams.groupBy("bucket").agg(F.count("*").alias("cr"))
    tgt = grams.where("_tgt").groupBy("bucket").agg(F.count("*").alias("ct"))
    tot = grams.count()
    tot_t = grams.where("_tgt").count()
    ratios = (
        raw.join(tgt, "bucket", "left")
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                    / F.lit(float(tot_t + n_buckets))
                )
                - F.log(
                    (F.col("cr") + 1.0) / F.lit(float(tot + n_buckets))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("r"),
        )
    )
    agg = (
        grams.join(F.broadcast(ratios), "bucket")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("r").cast("double"), 6).alias("logw"),
        )
    )
    # Documents with < 2 tokens have no bigrams and would vanish after the
    # explode; emit them with (n_feats=0, logw=0.0) so every input doc gets
    # a row and top_k selection can still reach them (ADVICE r6).
    out = toks.select("doc").join(agg, "doc", "left").select(
        "doc",
        F.coalesce(F.col("n_feats"), F.lit(0).cast("long")).alias("n_feats"),
        F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
    )
    if top_k is not None:
        out = out.orderBy(F.desc("logw"), F.asc("doc")).limit(int(top_k))
    return out
