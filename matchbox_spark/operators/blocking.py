"""Sorted-neighborhood blocking (merge/purge candidate generation).

The classic SNM (Hernandez & Stolfo 1995, "The Merge/Purge Problem"):
sort records by a domain blocking key, slide a fixed window of size ``w``
down the sorted order, and emit every in-window pair as a match candidate.
Unlike equality blocking (NaiveDeduper) or LSH, SNM finds NEAR-sorted
matches — typo'd keys that land adjacent in the sort — with cost linear in
``n·w`` instead of quadratic per block, and no hot-key blowup: candidate
fanout per record is exactly ``w − 1`` whatever the key distribution.

Reference parity: the reference ships equality blocking only
(`client/models/dedupers/naive.py:29-76`); SNM is the standard
complementary blocker every merge/purge pipeline adds (Splink's
`blocking_rule_library` covers it via sorted windows). This module extends
the J2 family with a genuinely different plan shape: a global total-order
rank, not a group-by.

Spark-first shape (no global Window over the corpus — that is one
partition at scale):

1. ``repartitionByRange`` on ``(key…, id)`` gives range-contiguous
   partitions in total order; an eager ``localCheckpoint`` pins partition
   membership so the partition-id keys are stable across re-reads (the
   monotonically_increasing_id trap — ADVICE r6 — does not apply: ranks
   derive from content order, and both the counts job and the rank job
   read the one materialised copy).
2. One ≤|partitions| count collect + broadcast offsets + per-partition
   ``row_number`` = dense global rank (`functions/indexing.py` — the same
   recipe catalog id assignment and G3 relabelling ride).
3. Candidates are a bounded explode (each rank emits partners
   ``rank+1 … rank+w−1``) and ONE equi-join back on rank — uniform join
   keys (ranks are unique), so no skew, no all-pairs, nothing quadratic.

Cross-engine determinism: rank = ``ROW_NUMBER() OVER (ORDER BY key…, id)``
with the id tiebreak, so the pair set is a pure function of the data and a
DuckDB oracle can state it independently. Null keys sort FIRST in Spark
and LAST under DuckDB defaults — a silently engine-dependent pair set, so
the operator ENFORCES a decision via ``nulls``: ``"error"`` (default)
rejects null key values (detected inside the existing per-partition counts
job — zero extra scans), ``"first"``/``"last"`` pin an explicit placement
that any oracle can state with ``NULLS FIRST``/``NULLS LAST``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.functions.indexing import dense_index
from matchbox_spark.operators.dedupers import Deduper, DeduperSettings
from matchbox_spark.operators.registry import add_model_class


def sorted_neighborhood_rank(
    df: DataFrame, id_col: str, key_cols: list[str], nulls: str = "error"
) -> DataFrame:
    """Dense 1-based global rank over ``ORDER BY key_cols…, id_col``.

    Returns ``(id, rank)`` — two narrow columns however wide the input.
    One range shuffle + one metadata-sized count collect; no single-
    partition window anywhere.

    ``nulls`` decides null-key placement — Spark sorts nulls FIRST, DuckDB
    LAST, so leaving it implicit would make the pair set engine-dependent:

    - ``"error"`` (default): raise if any key value is null. The check
      rides the counts job already being collected — no extra scan.
    - ``"first"``: Spark's native ascending order (oracle must say
      ``NULLS FIRST``).
    - ``"last"``: each key wraps as ``(is-null flag, value)`` so nulls
      land after every non-null value — DuckDB's ascending default —
      while non-null order and the id tiebreak are unchanged.
    """
    if not key_cols:
        raise ValueError("sorted_neighborhood_rank needs at least one key")
    if nulls not in ("error", "first", "last"):
        raise ValueError(f"nulls must be 'error'|'first'|'last': {nulls!r}")
    proj = df.select(F.col(id_col).alias("id"), *key_cols)
    if nulls == "last":
        keys = [
            F.struct(
                F.col(c).isNull().cast("int").alias("n"),
                F.col(c).alias("v"),
            ).alias(f"_k{i}")
            for i, c in enumerate(key_cols)
        ]
        proj = proj.select("id", *keys)
        key_names = [f"_k{i}" for i in range(len(key_cols))]
    else:
        key_names = list(key_cols)
    part = (
        proj.repartitionByRange(*key_names, "id")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    aggs = [F.count("*").alias("_n")]
    if nulls == "error":
        # the probe rides the counts job — but only in error mode: under
        # 'first' it's never read, and under 'last' the wrapped structs are
        # statically non-null, so building it would be dead work
        any_null = F.lit(False)
        for c in key_names:
            any_null = any_null | F.col(c).isNull()
        aggs.append(F.max(any_null.cast("int")).alias("_hasnull"))
    stats = part.groupBy("_pid").agg(*aggs).collect()
    if nulls == "error" and any(r["_hasnull"] for r in stats):
        raise ValueError(
            "sorted_neighborhood: null value in sort key column(s) "
            f"{key_cols} — null placement differs across engines (Spark "
            "sorts nulls first, ANSI/DuckDB default last), so the pair set "
            "would be engine-dependent. Coalesce the keys, or pass "
            "nulls='first'|'last' to pin a placement."
        )
    counts = {r["_pid"]: r["_n"] for r in stats}
    # struct ordering is lexicographic over (key…, id) — the within-
    # partition completion of the cross-partition range order
    ordered = part.withColumn("_ord", F.struct(*key_names, "id"))
    indexed, _ = dense_index(ordered, "_pid", "_ord", counts, id_name="rank")
    return indexed.select("id", "rank")


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_cols: list[str],
    window: int = 4,
    nulls: str = "error",
) -> DataFrame:
    """All in-window candidate pairs, each unordered pair once.

    Output ``(left_id, right_id)`` with ``left_id < right_id`` (id order,
    not rank order, so downstream edge consumers see the Deduper pair
    convention). Every record pairs with the ``window − 1`` records that
    follow it in the sort — ``n·(w−1)`` candidates total, independent of
    key skew. Ids are expected unique (the Deduper contract); duplicate
    ids never yield self-pairs (filtered), though a pair bridged by a
    duplicate can then appear once per bridge — dedupe downstream if your
    ids aren't keys.
    """
    if window < 2:
        # guard before it reaches sequence(): Spark's sequence(a, b) with
        # a > b silently generates a DESCENDING range, not an empty one
        raise ValueError("window must be >= 2 (w-1 partners per record)")
    ranked = sorted_neighborhood_rank(df, id_col, key_cols, nulls=nulls)
    partners = ranked.select(
        F.col("id").alias("_a"),
        F.explode(
            F.sequence(F.col("rank") + 1, F.col("rank") + (window - 1))
        ).alias("rank"),
    )
    return (
        partners.join(ranked.withColumnRenamed("id", "_b"), "rank")
        # duplicate input ids occupy adjacent ranks and would otherwise
        # emit a left_id == right_id self-pair, breaking the edge contract
        .where(F.col("_a") != F.col("_b"))
        .select(
            F.least("_a", "_b").alias("left_id"),
            F.greatest("_a", "_b").alias("right_id"),
        )
    )


def multipass_sorted_neighborhood(
    df: DataFrame,
    id_col: str,
    passes: list[tuple[list[str], int]],
    nulls: str = "error",
) -> DataFrame:
    """Union-distinct of several SNM passes (the standard multi-pass SNM:
    one cheap pass per key ordering beats one pass with a giant window).
    ``passes`` is ``[(key_cols, window), …]``; output is the distinct
    candidate-pair union."""
    if not passes:
        raise ValueError("multipass_sorted_neighborhood needs >= 1 pass")
    out: DataFrame | None = None
    for key_cols, window in passes:
        pairs = sorted_neighborhood_pairs(df, id_col, key_cols, window, nulls)
        out = pairs if out is None else out.union(pairs)
    return out.dropDuplicates()


@dataclass
class SortedNeighborhoodSettings(DeduperSettings):
    sort_fields: list[str] = field(default_factory=list)
    window: int = 4
    # optional verify rule: candidates survive only if every compare_field
    # is equal (the merge/purge "rule program" reduced to its relational
    # core); empty = emit every in-window candidate
    compare_fields: list[str] = field(default_factory=list)
    # null placement for the sort keys: 'error' (reject null key values),
    # 'first' (Spark's ascending default), 'last' (ANSI/DuckDB default)
    nulls: str = "error"


@add_model_class
class SortedNeighborhoodDeduper(Deduper):
    """DAG-pluggable SNM deduper: window candidates, optional equality
    verify, score 1.0 (deterministic blocker — scores are the probabilistic
    linker's job). Drop-in beside NaiveDeduper in a `dag.model(...)` step.
    """

    settings_class = SortedNeighborhoodSettings

    def dedupe(self, data: DataFrame) -> DataFrame:
        s = self.settings
        if not s.sort_fields:
            raise ValueError("SortedNeighborhoodDeduper needs sort_fields")
        cand = sorted_neighborhood_pairs(
            data, s.id, list(s.sort_fields), s.window, nulls=s.nulls
        )
        if s.compare_fields:
            attrs = data.select(
                F.col(s.id).alias("_k"), *s.compare_fields
            )
            left = attrs.select(
                F.col("_k").alias("left_id"),
                *[F.col(c).alias(f"_l_{c}") for c in s.compare_fields],
            )
            right = attrs.select(
                F.col("_k").alias("right_id"),
                *[F.col(c).alias(f"_r_{c}") for c in s.compare_fields],
            )
            cond = None
            for c in s.compare_fields:
                eq = F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}"))
                cond = eq if cond is None else cond & eq
            cand = (
                cand.join(left, "left_id")
                .join(right, "right_id")
                .where(cond)
                .select("left_id", "right_id")
            )
        return cand.select(
            "left_id",
            "right_id",
            F.lit(1.0).cast("float").alias("score"),
        )
