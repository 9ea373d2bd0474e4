"""Model evaluation against human judgements (SURVEY §2 A6/A11/U5/J10).

Re-expresses the reference's pair-based precision/recall
(/root/reference/src/matchbox/common/eval.py:52-281) relationally:

- Judgements expand to leaf level through the expansion table (J10); missing
  expansions mean singleton leaves.
- Each judgement row contributes weighted votes: endorsed pairs get
  ``1 + (|shown|-|endorsed|)/|shown|``, shown-but-not-endorsed pairs get
  ``-|endorsed|/|shown|`` — summed per pair this nets +1/-1 per complete
  judgement regardless of row interleaving (the reference's dict loop,
  A11, here a groupBy).
- Models and judgements are compared only on leaves present in *all* inputs
  (U5 intersection); neutrally-judged pairs (net 0) drop from both sides,
  negatively-judged pairs stay in the model side only.

Deviation noted: the reference indexes ``net_count[(a,b)]`` directly and
would raise on a model pair never judged; we inner-join (unjudged model pairs
drop), which is the only total behaviour.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pairs_expr(arr: Column) -> Column:
    """All 2-combinations (a < b) of a distinct-element array, as structs."""
    return F.flatten(
        F.transform(
            arr,
            lambda a: F.transform(
                F.filter(arr, lambda b: b > a),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )


def cluster_pairs(root_leaf: DataFrame) -> DataFrame:
    """Implied pairwise connections of a (root, leaf) clustering."""
    groups = root_leaf.groupBy("root").agg(
        F.sort_array(F.collect_set("leaf")).alias("leaves")
    )
    return (
        groups.select(F.explode(pairs_expr(F.col("leaves"))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .dropDuplicates()
    )


def expand_judgements(judgements: DataFrame, expansion: DataFrame) -> DataFrame:
    """J10: judgements at leaf level: (user_name, shown_leaves, endorsed_leaves).

    ``shown`` must expand; ``endorsed`` may be a singleton leaf (left join +
    array fallback).
    """
    shown_x = expansion.select(
        F.col("root").alias("shown"), F.col("leaves").alias("shown_leaves")
    )
    endorsed_x = expansion.select(
        F.col("root").alias("endorsed"), F.col("leaves").alias("endorsed_leaves")
    )
    out = (
        judgements.join(shown_x, "shown")
        .join(endorsed_x, "endorsed", "left")
        .withColumn(
            "endorsed_leaves",
            F.coalesce(F.col("endorsed_leaves"), F.array(F.col("endorsed"))),
        )
    )
    return out


def judgement_net_counts(judgements: DataFrame, expansion: DataFrame) -> DataFrame:
    """(a, b, net) — weighted endorse/reject accumulation per leaf pair."""
    ex = expand_judgements(judgements, expansion)
    ex = ex.withColumn("n_shown", F.size("shown_leaves")).withColumn(
        "n_endorsed", F.size("endorsed_leaves")
    )
    pos = ex.select(
        F.explode(pairs_expr(F.array_sort("endorsed_leaves"))).alias("p"),
        (1 + (F.col("n_shown") - F.col("n_endorsed")) / F.col("n_shown")).alias("w"),
    )
    # shown pairs minus endorsed pairs, each with the negative adjustment
    neg = ex.select(
        F.explode(
            F.array_except(
                pairs_expr(F.array_sort("shown_leaves")),
                pairs_expr(F.array_sort("endorsed_leaves")),
            )
        ).alias("p"),
        (-(F.col("n_endorsed") / F.col("n_shown"))).alias("w"),
    )
    return (
        pos.unionByName(neg)
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "w")
        .groupBy("a", "b")
        .agg(F.round(F.sum("w"), 9).alias("net"))
    )


def precision_recall(
    models_root_leaf: list[DataFrame],
    judgements: DataFrame,
    expansion: DataFrame,
) -> list[tuple[float, float]]:
    """Pair precision/recall per model against weighted validation pairs."""
    if judgements.isEmpty():
        raise ValueError("Judgements data cannot be empty.")
    for i, m in enumerate(models_root_leaf):
        if m.isEmpty():
            raise ValueError(f"Model data at index {i} cannot be empty.")

    net = judgement_net_counts(judgements, expansion).localCheckpoint(eager=True)

    # shared leaves across every model + the judged universe (U5)
    shared = None
    for m in models_root_leaf:
        leaves = m.select(F.col("leaf").alias("l")).distinct()
        shared = leaves if shared is None else shared.intersect(leaves)
    judged_leaves = (
        expand_judgements(judgements, expansion)
        .select(F.explode("endorsed_leaves").alias("l"))
        .distinct()
    )
    shared = shared.intersect(judged_leaves).localCheckpoint(eager=True)

    validation = net.where(F.col("net") > 0).join(
        shared.withColumnRenamed("l", "a"), "a"
    ).join(shared.withColumnRenamed("l", "b"), "b")
    n_validation = validation.count()
    if n_validation == 0:
        raise ValueError("Validation data has no pairs to evaluate.")

    scores: list[tuple[float, float]] = []
    for i, m in enumerate(models_root_leaf):
        mp = (
            cluster_pairs(m)
            .join(shared.withColumnRenamed("l", "a"), "a")
            .join(shared.withColumnRenamed("l", "b"), "b")
            .join(net, ["a", "b"])  # unjudged model pairs drop (see module doc)
            .where(F.col("net") != 0)
        )
        n_model = mp.count()
        if n_model == 0:
            raise ValueError(f"Model at index {i} has no pairs to evaluate.")
        tp = mp.join(validation.select("a", "b"), ["a", "b"]).count()
        scores.append((tp / n_model, tp / n_validation))
    return scores


def latest_judgement_per_cluster(judgements_ts: DataFrame) -> DataFrame:
    """A9: max judgement timestamp per shown cluster (adapter/eval.py:222-240)."""
    return judgements_ts.groupBy(F.col("shown").alias("cluster_id")).agg(
        F.max("ts").alias("latest_ts")
    )


def filter_recently_judged(
    clusters: DataFrame,
    judgements_ts: DataFrame,
    cutoff_days: int = 365,
    now: str | None = None,
) -> DataFrame:
    """P6: keep clusters never judged, or not judged in the last N days
    (adapter/eval.py:249-253). ``clusters`` needs a ``cluster_id`` column;
    ``judgements_ts`` needs ``shown``/``ts``."""
    latest = latest_judgement_per_cluster(judgements_ts)
    now_expr = F.lit(now).cast("timestamp") if now else F.current_timestamp()
    cutoff = now_expr - F.expr(f"INTERVAL {int(cutoff_days)} DAYS")
    return (
        clusters.join(latest, "cluster_id", "left")
        .where(F.col("latest_ts").isNull() | (F.col("latest_ts") < cutoff))
        .drop("latest_ts")
    )


def eval_samples(
    catalog,
    resolver: str,
    resolvers: list[str],
    sources: list[str],
    n: int = 100,
) -> DataFrame:
    """O5-style deterministic sample of resolved clusters for human review.

    Returns SCHEMA_EVAL_SAMPLES-shaped rows (root, leaf, key, source) for up
    to ``n`` clusters, chosen by key-hash order (seedless, reproducible).
    """
    from matchbox_spark.plans.query import unified_query

    proj = unified_query(catalog, resolvers, sources, level="key")
    sampled_roots = (
        proj.select("id")
        .distinct()
        .orderBy(F.sha2(F.col("id").cast("string"), 256))
        .limit(n)
    )
    return (
        proj.join(F.broadcast(sampled_roots), "id")
        .select(
            F.col("id").alias("root"),
            F.col("leaf_id").alias("leaf"),
            "key",
            "source",
        )
        .dropDuplicates()
    )


def enrich_samples(
    samples: DataFrame, sources: dict[str, DataFrame], key_fields: dict[str, str]
) -> DataFrame:
    """J9: join eval samples back to their source rows for display.

    ``sources`` maps source name → raw DataFrame; ``key_fields`` names each
    source's key column. Output keeps (root, leaf, key, source) plus each
    source's columns prefixed ``{source}_`` (nulls where the sample row came
    from another source).
    """
    out: DataFrame | None = None
    for name, df in sources.items():
        key_col = key_fields[name]
        prefixed = df.select(
            F.col(key_col).cast("string").alias("key"),
            *[
                F.col(c).alias(f"{name}_{c}")
                for c in df.columns
                if c != key_col
            ],
        ).withColumn("source", F.lit(name))
        part = samples.join(prefixed, ["source", "key"], "inner")
        out = part if out is None else out.unionByName(
            part, allowMissingColumns=True
        )
    if out is None:
        raise ValueError("no sources given")
    return out
