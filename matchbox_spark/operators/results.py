"""Model-result utilities (P4, P5, A8, J8, G3 from SURVEY §2).

Semantics from /root/reference/src/matchbox/client/results.py:18-237.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from matchbox_spark.schemas import SCHEMA_MODEL_EDGES, conform


class ScoreError(ValueError):
    """Raised when model scores are invalid."""


def normalise_scores(edges: DataFrame, validate: bool = True) -> DataFrame:
    """P4: cast score to float and reject null/NaN/out-of-range values."""
    out = conform(edges, SCHEMA_MODEL_EDGES)
    if validate:
        bad = out.where(
            F.col("score").isNull()
            | F.isnan("score")
            | (F.col("score") < 0)
            | (F.col("score") > 1)
        )
        n_bad = bad.limit(1).count()
        if n_bad:
            example = bad.first()
            raise ScoreError(f"invalid score outside [0,1] or null/NaN: {example}")
    return out


def threshold_edges(edges: DataFrame, threshold: float) -> DataFrame:
    """P5: keep edges with score >= threshold."""
    return edges.where(F.col("score") >= F.lit(float(threshold)))


def best_pair_dedupe(edges: DataFrame) -> DataFrame:
    """A8/W1: one row per unordered pair, keeping the highest score.

    ``row_number`` over (canonical pair, score desc) — the Spark form of
    DuckDB's ``distinct on`` idiom (results.py:49-62).
    """
    canon = edges.withColumn(
        "_pair",
        F.array_sort(F.array(F.col("left_id"), F.col("right_id"))),
    )
    w = Window.partitionBy("_pair").orderBy(
        F.desc("score"), F.asc("left_id"), F.asc("right_id")
    )
    return (
        canon.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_pair", "_rn")
    )


def as_lookup(per_source_ids: dict[str, DataFrame]) -> DataFrame:
    """J8: full-outer join per-source (id, key) maps into one wide lookup.

    Each input maps matchbox ``id`` → source ``key``; output has one row per
    entity id with a ``{source}_key`` column per source.
    """
    out: DataFrame | None = None
    for source, df in per_source_ids.items():
        renamed = df.select(
            F.col("id"), F.col("key").alias(f"{source}_key")
        ).dropDuplicates()
        out = renamed if out is None else out.join(renamed, "id", "full_outer")
    if out is None:
        raise ValueError("no sources given")
    return out


def merge_clusterings(a: DataFrame, b: DataFrame) -> DataFrame:
    """G3: union two (parent_id, child_id) clusterings into one.

    Two clusters merge when they share a leaf. Implemented as connected
    components over the union of membership edges (the reference seeds a
    DisjointSet with both leaf-sets, results.py:182-237).
    """
    from matchbox_spark.plans.resolvers import connected_components

    edges = (
        a.select("parent_id", "child_id")
        .union(b.select("parent_id", "child_id"))
        .select(
            # parents get a disjoint negative id-space so they never collide
            # with leaf ids (the reference uses negative temp ids too)
            (-F.col("parent_id") - 1).alias("src"),
            F.col("child_id").alias("dst"),
        )
    )
    from matchbox_spark.functions.indexing import dense_index

    cc = connected_components(edges)
    leaves = cc.where(F.col("id") >= 0)
    # Relabel components densely 1..k ordered by min member — JVM-side
    # zip-with-index via the shared dense_index helper (the same pattern
    # catalog._assign_ids rides). The eager checkpoint pins partition
    # membership so the partition-id keys are stable across re-reads; the
    # offset job collects one count per shuffle partition, a
    # scale-independent driver transfer.
    mins = (
        leaves.groupBy("component")
        .agg(F.min("id").alias("_min_leaf"))
        .repartitionByRange("_min_leaf")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["_n"]
        for r in mins.groupBy("_pid").agg(F.count("*").alias("_n")).collect()
    }
    indexed, _ = dense_index(
        mins, "_pid", "_min_leaf", counts, id_name="parent_id"
    )
    return (
        leaves.join(indexed.select("component", "parent_id"), "component")
        .select("parent_id", F.col("id").alias("child_id"))
    )
