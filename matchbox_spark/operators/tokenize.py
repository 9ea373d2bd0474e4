"""Tokenizer induction: byte-pair-encoding merge training over a corpus.

BPE (Sennrich et al. 2016, arXiv:1508.07909) — the vocabulary-induction
step every LLM training pipeline runs before anything else: start from
characters, repeatedly merge the most frequent adjacent symbol pair. The
engine trains the merge table itself rather than shelling out to a
tokenizer library, because at corpus scale the pair counting IS the hard
part and it is exactly a Spark aggregation.

Plan shape per merge (the v5/g6 fixed-iteration recipe — deterministic,
unrolled-CTE-oracle-replayable):

- **pair counting** is posexplode → adjacent self-join on (word, pos+1) →
  one map-side-combinable SUM(freq) keyed on the pair — the corpus-scale
  step, one shuffle over vocab-sized data (pair counting runs on the
  DISTINCT-word table weighted by frequency, the standard trick that makes
  BPE O(vocab) per merge instead of O(corpus));
- **argmax** orders (count DESC, pair ASC) LIMIT 1 — a driver-collected
  scalar, inlined as literals for the merge rewrite;
- **greedy left-to-right merge** is gaps-and-islands: consecutive matching
  positions form islands (overlap only when left==right), merges start at
  ODD in-island ranks, consumed positions drop, and the surviving symbols
  re-assemble ordered by position. Pure joins + windows partitioned by
  word — no per-row Python, no sequential state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from matchbox_spark.functions.text import tokens_expr


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
    top_words: int = 200,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the ``top_words`` most frequent
    words; returns ``(it, lhs, rhs, pair_freq)`` — one row per merge in
    training order, plus a final ``it = -1`` row carrying the corpus-wide
    surviving-symbol count (``Σ len(syms)·freq``) that pins the
    re-segmentation itself, not just the chosen pairs.

    Ties in the argmax break on (lhs, rhs) lexicographically; words are
    lowercased whitespace tokens (``tokens_expr``); symbols start as
    single characters.
    """
    if n_merges < 1 or top_words < 1:
        raise ValueError("n_merges and top_words must be >= 1")
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens_expr(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(int(top_words))
    )
    wd = vocab.select(
        "word",
        "freq",
        F.expr("regexp_extract_all(word, '.', 0)").alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, int]] = []
    for it in range(n_merges):
        pos = wd.select(
            "word", "freq", F.posexplode("syms").alias("p", "sym")
        )
        left, right = pos.alias("l"), pos.alias("r")
        pairs = left.join(
            right,
            (F.col("l.word") == F.col("r.word"))
            & (F.col("r.p") == F.col("l.p") + 1),
        ).select(
            F.col("l.word").alias("word"),
            F.col("l.p").alias("p"),
            F.col("l.sym").alias("x"),
            F.col("r.sym").alias("y"),
            F.col("l.freq").alias("freq"),
        )
        best_rows = (
            pairs.groupBy("x", "y")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not best_rows:
            raise ValueError(f"no adjacent pairs left at merge {it}")
        a, b, c = best_rows[0]["x"], best_rows[0]["y"], int(best_rows[0]["c"])
        merges.append((it, a, b, c))

        match = pairs.where(
            (F.col("x") == F.lit(a)) & (F.col("y") == F.lit(b))
        ).select("word", "p")
        w_isl = Window.partitionBy("word").orderBy("p")
        islands = match.withColumn(
            "grp", F.col("p") - F.row_number().over(w_isl)
        )
        w_rank = Window.partitionBy("word", "grp").orderBy("p")
        starts = (
            islands.withColumn("r", F.row_number().over(w_rank))
            .where(F.col("r") % 2 == 1)
            .select("word", "p")
        )
        consumed = starts.select("word", (F.col("p") + 1).alias("p"))
        wd = (
            pos.join(
                starts.withColumn("_s", F.lit(True)), ["word", "p"], "left"
            )
            .join(
                consumed.withColumn("_c", F.lit(True)), ["word", "p"], "left"
            )
            .where(F.col("_c").isNull())
            .select(
                "word",
                "freq",
                "p",
                F.when(F.col("_s").isNotNull(), F.lit(a + b))
                .otherwise(F.col("sym"))
                .alias("sym"),
            )
            .groupBy("word", "freq")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "sym"))),
                    lambda s: s["sym"],
                ).alias("syms")
            )
            .localCheckpoint(eager=True)
        )

    total = wd.agg(
        F.sum(F.size("syms") * F.col("freq")).cast("long").alias("n")
    ).collect()[0]["n"]
    out = merges + [(-1, "__symbols__", "", int(total))]
    return spark.createDataFrame(
        out, "it int, lhs string, rhs string, pair_freq long"
    ).orderBy("it")
