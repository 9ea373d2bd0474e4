"""Interpolated Kneser–Ney n-gram language-model scoring (CCNet-style).

The real CCNet/CC-100 quality signal buckets documents by perplexity under
a KenLM 5-gram; the relational core of that scorer is interpolated
Kneser–Ney (Chen & Goodman 1998) over n-gram count tables. This module
implements KN for bigrams and trigrams as PURE DataFrame algebra — every
level is a groupBy over the gram stream plus key-partitioned joins, so the
plan is one shuffle per count table and scales with corpus size, never
with vocabulary held in one place. No UDFs anywhere.

Model definition (self-consistent: every level derives from the ONE
highest-order gram multiset, so document edges cannot make the levels
disagree — and the same definition is replayable in ANSI SQL):

  order 3:  P(w|u,v) = (c(uvw) - D)/c(uv·) + D·N1+(uv·)/c(uv·) · P(w|v)
            P(w|v)   = (N1+(·vw) - D)/N1+(·v·) + D·N1+(v·*)/N1+(·v·) · P(w)
            P(w)     = N1+(··w)/N1+(···)
  where c(uv·) = Σ_w c(uvw), N1+ counts distinct extensions of the gram
  table, and D is a fixed discount in (0, 1) — every scored gram has
  count ≥ 1, so the max(·−D, 0) of the general form never clips and the
  expression stays branch-free.

Cross-engine exactness (the driver hash-compares against DuckDB): the
per-type probability is a fixed double expression tree (identical operand
order both engines — IEEE ops are deterministic), then ln() rounds to
6 dp, decimal-sums per document, and the mean rounds to 6 dp — the
established t8/g6/v5 recipe.

Reference parity: the reference has no LM scorer; this extends the t8
unigram proxy (SURVEY §2 text-analysis family) to the real KN recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.functions.numeric import ieee_round6
from matchbox_spark.functions.text import tokens_expr


def _ckpt_lazy(df: DataFrame) -> DataFrame:
    """Lazy local checkpoint (the catalog's `_ckpt` recipe): truncate the
    lineage so a subtree referenced by several downstream levels computes
    once instead of re-executing its corpus scan per reference. Lazy — the
    materialisation folds into the first action; falls back to the plain
    plan if checkpointing is unavailable."""
    try:
        return df.localCheckpoint(eager=False)
    except Exception:  # noqa: BLE001 — rare AQE checkpoint-planning bug
        return df


def _gram_stream(
    docs: DataFrame, order: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc, g0..g{order-1}) stream — array-domain construction: one
    ``transform(sequence(...))`` + explode, pure codegen, no shuffle."""
    names = [f"g{i}" for i in range(order)]
    struct_body = ", ".join(f"t[i + {i}] AS {n}" for i, n in enumerate(names))
    d = docs.select(
        F.col(id_col).alias("doc"), tokens_expr(text_col).alias("t")
    )
    return (
        d.where(F.size("t") >= order)
        .select(
            "doc",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {order}), "
                    f"i -> struct({struct_body}))"
                )
            ).alias("g"),
        )
        .select("doc", *[f"g.{n}" for n in names])
    )


def kn_prob_table(grams: DataFrame, order: int, discount: float) -> DataFrame:
    """Per-gram-TYPE interpolated-KN probability.

    ``grams`` must have columns g0..g{order-1} (one row per gram token);
    the output has one row per distinct gram plus a double ``p``. Keeping
    probabilities per TYPE (not per token) makes the final scoring join
    |types|-sized, far smaller than the corpus stream.
    """
    if order not in (2, 3):
        raise ValueError("kn_prob_table supports order 2 or 3")
    if not 0.0 < discount < 1.0:
        raise ValueError("discount must be in (0, 1)")
    D = F.lit(float(discount))
    names = [f"g{i}" for i in range(order)]
    ctx, last = names[:-1], names[-1]

    # highest level: raw counts + context marginals. The distinct-gram
    # table feeds every lower level AND the final join; without the lazy
    # checkpoint each reference re-executes the corpus-wide gram shuffle
    # (plan showed N parquet scans, zero ReusedExchange) — truncating here
    # makes the corpus read once and every level a |types|-sized derivation.
    cN = _ckpt_lazy(grams.groupBy(*names).agg(F.count("*").alias("c")))
    ctxN = cN.groupBy(*ctx).agg(
        F.sum("c").alias("cctx"), F.count("*").alias("next_types")
    )

    # |distinct grams| as a broadcast one-row frame — keeps the whole model
    # a single lazy plan (no driver action, no literal rebind per run)
    tot = cN.agg(F.count("*").cast("double").alias("nt"))

    if order == 3:
        # middle level over continuation counts N1+(·vw)
        mid = cN.groupBy("g1", "g2").agg(F.count("*").alias("n1vw"))
        ctx2 = mid.groupBy("g1").agg(
            F.sum("n1vw").alias("nv"), F.count("*").alias("tv")
        )
        uni = cN.groupBy("g2").agg(F.count("*").alias("n1w"))
        p2 = (
            (F.col("n1vw") - D) / F.col("nv")
            + ((D * F.col("tv")) / F.col("nv"))
            * (F.col("n1w") / F.col("nt"))
        )
        lower = (
            mid.join(ctx2, "g1")
            .join(uni, "g2")
            .crossJoin(F.broadcast(tot))
            .select("g1", "g2", p2.alias("p_low"))
        )
        joined = cN.join(ctxN, ctx).join(lower, ["g1", "g2"])
    else:
        uni = cN.groupBy("g1").agg(F.count("*").alias("n1w"))
        lower = (
            uni.crossJoin(F.broadcast(tot))
            .select("g1", (F.col("n1w") / F.col("nt")).alias("p_low"))
        )
        joined = cN.join(ctxN, ctx).join(lower, "g1")

    p = (F.col("c") - D) / F.col("cctx") + (
        (D * F.col("next_types")) / F.col("cctx")
    ) * F.col("p_low")
    return joined.select(*names, p.alias("p"))


def kn_doc_logprob(
    docs: DataFrame,
    order: int = 3,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean KN log-probability (the perplexity bucketing
    signal): → (doc, n_grams, mean_logprob). Documents shorter than
    ``order`` tokens emit (n_grams=0, mean_logprob=NULL) rather than
    vanishing. Scoring is corpus-internal (model trained on the same gram
    stream), so every scored gram exists and no OOV branch is needed.
    mean_logprob rounds per-term to 6 dp and decimal-sums, so the result
    is order-invariant and hash-stable cross-engine."""
    grams = _gram_stream(docs, order, id_col, text_col)
    ptab = kn_prob_table(grams, order, discount)
    names = [f"g{i}" for i in range(order)]
    # per-term ieee_round6, not F.round: ln(p) is off the 6-dp grid for
    # every gram, so engine ROUND boundary divergence (functions/numeric)
    # would flip a DECIMAL(18,6) term by 1e-6 and break the doc-sum pin
    term = ieee_round6(F.log(F.col("p"))).cast("decimal(18,6)")
    scored = (
        grams.join(ptab, names)
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_grams"),
            # ieee_round6, not F.round: the mean is off the 6-dp grid, and
            # engine ROUND implementations disagree within an ulp of a
            # boundary (hit vs DuckDB at sf0.1) — see functions/numeric.py
            ieee_round6(
                F.sum(term).cast("double") / F.count("*")
            ).alias("mean_logprob"),
        )
    )
    base = docs.select(F.col(id_col).alias("doc"))
    return base.join(scored, "doc", "left").select(
        "doc",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        "mean_logprob",
    )


def kn_score_held_out(
    train_docs: DataFrame,
    score_docs: DataFrame,
    order: int = 4,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    unigram: str = "types",
) -> DataFrame:
    """KenLM-shaped train/score split: train KN count tables on one corpus,
    score HELD-OUT documents — with OOV and unseen-context backoff, orders
    2–5. → (doc, n_grams, mean_logprob) over ``score_docs``.

    The real CCNet flow scores new documents against a reference-trained
    model, so unlike :func:`kn_doc_logprob` (corpus-internal) every branch
    of the general interpolated-KN form is live here:

    - **seen gram**: discounted count + interpolation weight × lower order;
    - **unseen gram, seen context**: the count term clips to 0 and only
      the interpolation mass ``D·types/total`` backs off;
    - **unseen context**: the level contributes nothing — probability
      passes through to the next-lower order unchanged (weight 1);
    - **OOV word**: the unigram level reserves one escape unit of mass:
      ``P1(w) = cnt1(w)/(N+1)`` for seen words and ``1/(N+1)`` for unknown
      (Σ = 1 over seen ∪ unk).

    ``unigram`` picks the unigram count basis (both Σ to 1 with the same
    escape construction; higher levels are KN continuation counts either
    way):

    - ``'types'`` (default, the oracle-pinned mode): ``cnt1(w)`` = distinct
      training n-gram TYPES ending in ``w``, ``N`` = distinct n-gram types —
      a KN-continuation-style distribution. Self-consistent, but NOT what
      KenLM does at the unigram level, so perplexities are KenLM-shaped
      rather than KenLM-equal.
    - ``'tokens'``: ``cnt1(w)`` = token OCCURRENCES of ``w`` as the final
      word of a training n-gram, ``N`` = total n-gram tokens — KenLM's
      token-frequency unigram semantics (each corpus token past the first
      ``order−1`` per doc counts exactly once).

    Every level-k count table derives from the ONE distinct-n-gram table
    (count = distinct n-gram types sharing the last-k suffix — the same
    self-consistent family ``kn_prob_table`` uses), so both engines can
    state the identical model. Scoring is |types|-sized left joins from
    the held-out gram stream, one per level plus one per context — no
    UDFs, no per-token state. Probabilities are a fixed double expression
    tree (identical operand order cross-engine); per-gram ln() rounds to
    6 dp, decimal-sums per doc, mean rounds to 6 dp (the t14 recipe), so
    the result is hash-exact against a DuckDB oracle.
    """
    if order not in (2, 3, 4, 5):
        raise ValueError("kn_score_held_out supports orders 2-5")
    if not 0.0 < discount < 1.0:
        raise ValueError("discount must be in (0, 1)")
    if unigram not in ("types", "tokens"):
        raise ValueError("unigram must be 'types' or 'tokens'")
    D = F.lit(float(discount))
    names = [f"g{i}" for i in range(order)]

    train = _gram_stream(train_docs, order, id_col, text_col)
    # one corpus shuffle total: every count table and context marginal
    # below derives from this |types|-sized checkpoint (see kn_prob_table)
    cN = _ckpt_lazy(
        train.groupBy(*names).agg(F.count("*").alias(f"c{order}"))
    )
    tabs = {order: cN}
    for k in range(order - 1, 0, -1):
        tabs[k] = cN.groupBy(*names[order - k:]).agg(
            F.count("*").alias(f"c{k}")
        )
    ctxs = {}
    for k in range(order, 1, -1):
        ctxs[k] = tabs[k].groupBy(*names[order - k: order - 1]).agg(
            F.sum(f"c{k}").alias(f"t{k}"), F.count("*").alias(f"y{k}")
        )
    if unigram == "tokens":
        # KenLM-mode unigram basis: token occurrences, not distinct types
        tabs[1] = cN.groupBy(names[-1]).agg(F.sum(f"c{order}").alias("c1"))
        nt = cN.agg(F.sum(f"c{order}").cast("double").alias("nt"))
    else:
        nt = cN.agg(F.count("*").cast("double").alias("nt"))

    sg = _gram_stream(score_docs, order, id_col, text_col)
    j = sg
    for k in range(order, 0, -1):
        j = j.join(tabs[k], names[order - k:], "left")
    for k in range(order, 1, -1):
        j = j.join(ctxs[k], names[order - k: order - 1], "left")
    j = j.crossJoin(F.broadcast(nt))

    p = F.coalesce(F.col("c1").cast("double"), F.lit(1.0)) / (
        F.col("nt") + F.lit(1.0)
    )
    for k in range(2, order + 1):
        ck, tk, yk = F.col(f"c{k}"), F.col(f"t{k}"), F.col(f"y{k}")
        full = (
            F.when(ck.isNull(), F.lit(0.0)).otherwise((ck - D) / tk)
            + ((D * yk) / tk) * p
        )
        p = F.when(tk.isNull(), p).otherwise(full)

    term = ieee_round6(F.log(p)).cast("decimal(18,6)")
    scored = j.groupBy("doc").agg(
        F.count("*").alias("n_grams"),
        ieee_round6(
            F.sum(term).cast("double") / F.count("*")
        ).alias("mean_logprob"),
    )
    base = score_docs.select(F.col(id_col).alias("doc"))
    return base.join(scored, "doc", "left").select(
        "doc",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        "mean_logprob",
    )


def kn_perplexity(
    docs: DataFrame,
    order: int = 3,
    discount: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Convenience wrapper: perplexity = exp(−mean_logprob) per document
    (NULL for docs with no grams). Not oracle-checked — exp() is a libm
    call whose last ulp may differ across engines; the oracle pins
    mean_logprob and perplexity is monotone in it."""
    out = kn_doc_logprob(docs, order, discount, id_col, text_col)
    return out.withColumn("perplexity", F.exp(-F.col("mean_logprob")))
