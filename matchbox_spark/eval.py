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
    """Implied pairwise connections of a (root, leaf) clustering.

    Combinations expand through the dedupers' codegen'd posexplode/
    tail-slice, not ``pairs_expr`` — the interpreted nested-transform
    (which additionally re-scans the whole array with ``F.filter`` per
    element, O(g²) lambda invocations per group) dominated the ev8
    threshold sweep at ~600-leaf components. Same (a < b) pair set:
    leaves are sorted distinct per group. ``dropDuplicates`` stays — a
    proper clustering partitions the leaves so it is a no-op shuffle on
    CC output, but the helper's contract accepts any (root, leaf) frame."""
    groups = root_leaf.groupBy("root").agg(
        F.sort_array(F.collect_set("leaf")).alias("members")
    )
    from matchbox_spark.operators.dedupers import _tail_slice_explode

    # spread the (few, small) group rows before the quadratic explosion:
    # AQE coalesces the tiny aggregate to one partition, which would run
    # the entire O(Σ g²) pair fan-out on one core (guide §2.5 — the
    # explode side of input skew). An explicit repartition is exempt from
    # AQE coalescing; the shuffled rows are one array per cluster.
    n = root_leaf.sparkSession.sparkContext.defaultParallelism
    return (
        _tail_slice_explode(groups.repartition(n))
        .select(F.col("lid").alias("a"), F.col("rid").alias("b"))
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
    """(a, b, net) — weighted endorse/reject accumulation per leaf pair.

    Per judgement row the contract is: endorsed pairs get
    ``1 + (n_shown − n_endorsed)/n_shown``, shown-but-not-endorsed pairs
    get ``−n_endorsed/n_shown``. The implementation telescopes the split:
    EVERY shown pair gets the negative term and every endorsed pair gets a
    flat ``+2`` (2 − n_e/n_s = 1 + (n_s − n_e)/n_s — identical net). This
    avoids ``array_except`` between the two struct-pair arrays, which
    Spark evaluates with a quadratic per-row scan for struct elements —
    at a 600-member shown cluster that was 180k × 36k struct comparisons
    per judgement row (a >6-minute straggler at sf0.1, round 12); the
    telescoped form is two linear explodes into one map-side-combinable
    groupBy."""
    from matchbox_spark.operators.dedupers import _tail_slice_explode

    ex = expand_judgements(judgements, expansion)
    # spread the judgement rows before the quadratic pair fan-out — the
    # judgement frame is sample-sized (often fewer rows than cores), so
    # without this the whole explosion lands on one or two tasks
    ex = ex.repartition(ex.sparkSession.sparkContext.defaultParallelism)
    ex = ex.withColumn("n_shown", F.size("shown_leaves")).withColumn(
        "n_endorsed", F.size("endorsed_leaves")
    )
    # combinations via the dedupers' codegen'd posexplode/tail-slice (the
    # per-row weight rides along) — pairs_expr's interpreted nested
    # transform re-scans the whole array per element (O(g²) lambda
    # invocations); at ev8's ~120-leaf shown clusters it was 25 s of the
    # 72 s sweep. Same (a < b) multiset from the sorted arrays.
    pos = _tail_slice_explode(
        ex.select(
            F.array_sort("endorsed_leaves").alias("members"),
            F.lit(2.0).alias("w"),
        )
    )
    neg = _tail_slice_explode(
        ex.select(
            F.array_sort("shown_leaves").alias("members"),
            (-(F.col("n_endorsed") / F.col("n_shown"))).alias("w"),
        )
    )
    return (
        pos.unionByName(neg)
        .select(F.col("lid").alias("a"), F.col("rid").alias("b"), "w")
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


def threshold_sweep(
    edges: DataFrame,
    judgements: DataFrame,
    expansion: DataFrame,
    thresholds: list[float],
    max_edges: int | None = None,
) -> DataFrame:
    """Precision/recall sweep over model truth thresholds (VERDICT r11 #9 —
    the operating-point question the reference's eval loop exists to
    answer): for each threshold, cluster ``edges`` with score ≥ t into
    components, take the implied leaf pairs, and score them against the
    weighted judgement pairs exactly as :func:`precision_recall` does.

    Returns one row per threshold —
    ``(threshold, n_model_pairs, tp, precision, recall, f1)`` — so the
    caller picks the Pareto point (max f1, or their own P/R trade). Unlike
    :func:`precision_recall`, an empty clustering at a high threshold
    reports zeros instead of raising: a sweep must be able to cover the
    whole range.

    Plan shape: the judgement side (net counts, judged-leaf universe,
    validation pairs) is computed ONCE and checkpointed — judgement data is
    sample-sized by construction (the eval queue caps at ~100 clusters).
    Per threshold, one connected-components run over the thresholded edges
    plus two joins against the checkpointed validation state; components
    use the size-adaptive driver/distributed strategy, so the sweep scales
    with the edge set like any resolver step.

    ``max_edges`` (VERDICT r12 #8 — the warehouse-scale pattern): the
    per-threshold CC re-run is inherent to the sweep's semantics, so at
    warehouse scale sweep on a SAMPLED edge set. When the edge count
    exceeds ``max_edges``, a deterministic hash sample
    (``xxhash64(left_id, right_id)`` order — partition-layout- and
    run-invariant, no RNG) keeps ~``max_edges`` edges before
    thresholding, and the sweep runs on that fixed subset; P/R/F1 become
    estimates whose judged-pair denominators still come from the full
    judgement state. ``max_edges >= |edges|`` is exactly equivalent to
    the unsampled sweep (pinned in tests). Sampling edges BEFORE
    thresholding (rather than per threshold) keeps the threshold curve
    monotone-comparable: every threshold sees the same edge universe.
    """
    if not thresholds:
        raise ValueError("threshold_sweep requires at least one threshold")
    from matchbox_spark.plans.resolvers import connected_components

    spark = edges.sparkSession
    if max_edges is not None:
        if max_edges <= 0:
            raise ValueError("max_edges must be positive")
        n_edges = edges.count()
        if n_edges > max_edges:
            # deterministic hash order: keep the max_edges smallest
            # xxhash64 values via a threshold on the hash's quantile
            # position — one pass, no global sort. The modulus bucket
            # bound keeps ~max_edges edges (binomial jitter, not exact).
            keep_num = 1 << 20
            bound = int(keep_num * (max_edges / n_edges))
            edges = edges.where(
                F.pmod(
                    F.xxhash64(F.col("left_id"), F.col("right_id")),
                    F.lit(keep_num),
                )
                < F.lit(bound)
            )
            edges = edges.localCheckpoint(eager=False)
    # The judgement-side state is sample-bounded by construction (the eval
    # queue caps at ~100 clusters — module doc), but a localCheckpoint
    # erases size statistics (LogicalRDD reports the default "huge"
    # sizeInBytes), so WITHOUT explicit broadcast hints every
    # per-threshold join below degrades to a sort-merge join that
    # shuffles the O(cluster-pairs) model side — measured 17+16 s per
    # threshold at sf0.1 vs ~3 s broadcast.
    net = F.broadcast(
        judgement_net_counts(judgements, expansion).localCheckpoint(
            eager=True
        )
    )
    judged_leaves = F.broadcast(
        expand_judgements(judgements, expansion)
        .select(F.explode("shown_leaves").alias("l"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    validation = F.broadcast(
        net.where(F.col("net") > 0)
        .join(judged_leaves.withColumnRenamed("l", "a"), "a")
        .join(judged_leaves.withColumnRenamed("l", "b"), "b")
        .select("a", "b")
        .localCheckpoint(eager=True)
    )
    n_validation = validation.count()
    if n_validation == 0:
        raise ValueError("Validation data has no pairs to evaluate.")

    rows = []
    for t in sorted(thresholds):
        e = edges.where(F.col("score") >= F.lit(float(t))).select(
            F.col("left_id").alias("src"), F.col("right_id").alias("dst")
        )
        labels = connected_components(e)
        root_leaf = labels.select(
            F.col("component").alias("root"), F.col("id").alias("leaf")
        )
        # restrict to the judged universe, drop unjudged model pairs
        # (net == 0 pairs carry no evidence — precision_recall's rule)
        mp = (
            cluster_pairs(root_leaf)
            .join(judged_leaves.withColumnRenamed("l", "a"), "a")
            .join(judged_leaves.withColumnRenamed("l", "b"), "b")
            .join(net, ["a", "b"])
            .where(F.col("net") != 0)
            .select("a", "b")
        )
        # one action per threshold, not two: the left join against the
        # (unique-by-pair) validation set counts model pairs and true
        # positives together — the former count() + join().count() pair
        # computed the whole mp plan twice
        c = (
            mp.join(
                validation.withColumn("_v", F.lit(1)), ["a", "b"], "left"
            )
            .agg(
                F.count(F.lit(1)).alias("nm"), F.count("_v").alias("tp")
            )
            .collect()[0]
        )
        n_model, tp = int(c["nm"]), int(c["tp"])
        precision = tp / n_model if n_model else 0.0
        recall = tp / n_validation
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0.0
        )
        rows.append(
            (
                float(t),
                n_model,
                tp,
                round(precision, 9),
                round(recall, 9),
                round(f1, 9),
            )
        )
    return spark.createDataFrame(
        rows,
        "threshold double, n_model_pairs long, tp long, "
        "precision double, recall double, f1 double",
    )


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
