"""Dedupers: same-source pair generation (SURVEY §2.3 J2).

Semantics match the reference NaiveDeduper (naive.py:29-76): an inner
self-join on equality of every ``unique_field``, excluding row self-matches
while keeping true-duplicate rows paired (the reference uses a synthetic
``_unique_e4003b`` row index; positional combinations give the same strict
row order), suppressing ``left_id = right_id``, and emitting each unordered
pair once with score 1.0.

Spark-first shape: instead of a literal self equi-join (which scans the input
twice and shuffles both sides), we group by the unique fields once and
generate each group's pairs from its collected id list — one shuffle, and the
pair explosion happens after the aggregate, map-side. The two plans are
set-equivalent; for cliques of size k both produce k·(k-1)/2 pairs. Groups are
naturally skew-prone (a frequent value creates a huge clique) — quadratic
blow-up is inherent to the semantics, so we cap nothing but keep the heavy
work (combinations) inside a generated column, not a join.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.operators.registry import add_model_class


def _tail_slice_pairs(grouped: DataFrame) -> DataFrame:
    """``(left_id, right_id)`` combinations of each row's ``members`` array.

    Two generator steps — ``posexplode(members)`` then ``explode`` of the
    tail slice after each position — instead of one nested
    ``transform``/``flatten`` lambda expression building g·(g-1)/2 structs
    per group. Same pair multiset, but explodes run inside whole-stage
    codegen while higher-order-function lambdas are interpreted with a
    per-element allocation (BASELINE.md plan-shape lesson 2/5): measured
    2.3× on the flagship's 900k-pair expansion (0.52 → 0.22 s at sf0.1).
    """
    return _tail_slice_explode(grouped).select(
        F.least("lid", "rid").alias("left_id"),
        F.greatest("lid", "rid").alias("right_id"),
    )


def _tail_slice_explode(grouped: DataFrame) -> DataFrame:
    """Raw ``(lid, rid)`` positional combinations (i < j) of ``members``.

    Every column other than ``members`` rides along unchanged (per-row
    weights, group keys); unused passengers are column-pruned by Catalyst
    before any exchange."""
    extra = [c for c in grouped.columns if c != "members"]
    e1 = grouped.select(
        *extra, "members", F.posexplode("members").alias("i", "lid")
    )
    return e1.select(
        *extra,
        "lid",
        F.explode(
            F.slice(
                F.col("members"),
                F.col("i") + 2,
                F.size("members") - F.col("i") - 1,
            )
        ).alias("rid"),
    )


@dataclass
class DeduperSettings:
    """Settings shared by dedupers: the id field naming the entity id column."""

    id: str = "id"


class Deduper(ABC):
    """A model step over a single query: emits scored same-source pairs."""

    def __init__(self, **settings):
        self.settings = self.settings_class(**settings)

    settings_class = DeduperSettings

    def prepare(self, data: DataFrame) -> None:
        """Hook for subclasses needing precomputation (e.g. model training)."""

    @abstractmethod
    def dedupe(self, data: DataFrame) -> DataFrame:
        """Return edges ``(left_id, right_id, score)`` with left_id < right_id."""


@dataclass
class NaiveSettings(DeduperSettings):
    unique_fields: list[str] = field(default_factory=list)
    # Skew guard: a group of size g emits g·(g-1)/2 pairs inside one task —
    # a single degenerate value (empty string, "UNKNOWN", …) can OOM an
    # executor at corpus scale. Groups above the cap are dropped with a
    # warning. None = faithful reference semantics (no cap).
    max_group_size: int | None = None
    # Scale path: when set, groups split into chunks of this many rows and
    # pairs build as in-chunk combinations + a chunk-replicated equi-join —
    # SAME pair set, but the quadratic work of a giant group spreads across
    # ~(g/chunk)² tasks instead of exploding inside one. Costs an extra
    # shuffle, so leave None when group sizes are bounded.
    chunk_size: int | None = None


@add_model_class
class NaiveDeduper(Deduper):
    """Pairs every two rows agreeing on all unique fields, score 1.0."""

    settings_class = NaiveSettings

    def delta_blocking_fields(self) -> list[str]:
        """Streaming delta-link contract: an edge exists iff two rows agree
        on ALL unique fields, so every edge lives inside a per-field value
        block — ``incremental_resolve_stream`` may prune accumulated state
        to the blocks a micro-batch touches (the OR-superset over these
        fields) without changing terminal clusters, and auto-routes full
        mode through that flat delta path."""
        return list(self.settings.unique_fields)

    def delta_pairwise_contract(self) -> dict | None:
        """Model-level streaming DELTA-PAIR contract (optimization r14).

        Declares that this model's edge set is exactly {every unordered
        pair of distinct non-null ids within a group of equal, non-null
        unique-field tuples}, each scored 1.0 — a pure function of the two
        rows. Under that contract a micro-batch can only CREATE pairs that
        touch a new row: an old×old pair was already created by the batch
        that delivered the later of its two rows (the blocked superset at
        that batch contained every accumulated member of the touched
        group). ``incremental_resolve_stream`` uses this to maintain a
        driver-resident tuple→member-id map and emit each batch's delta
        pairs directly — no O(accumulated) superset rebuild and no
        re-expansion of old×old pairs per batch. ``max_group_size``
        transfers: the distributed path drops a group from a batch's pair
        output whenever its ACCUMULATED distinct-member count exceeds the
        cap (pairs appended by earlier, smaller incarnations of the group
        persist), which is exactly what an incremental emitter does when
        it stops emitting the moment the map entry crosses the cap.
        Returns None when the contract does not hold (chunked mode is a
        physically different plan — same pair set, but keep the map path
        conservative)."""
        if self.settings.chunk_size is not None:
            return None
        return {
            "score": 1.0,
            "fields": list(self.settings.unique_fields),
            "max_group_size": self.settings.max_group_size,
        }

    def dedupe(self, data: DataFrame) -> DataFrame:
        s = self.settings
        if not s.unique_fields:
            raise ValueError("NaiveDeduper requires unique_fields")

        # SQL equality semantics: rows with a NULL in any unique field never
        # match anything (join `=` is null-rejecting), so drop them up front.
        # Rows with a NULL entity id are dropped too: the reference's
        # `raw.left_id != raw.right_id` guard (naive.py:63) silently
        # excludes them, and a null surviving into the member array would
        # forge a self-edge — least/greatest both skip the null and resolve
        # (null, x) to (x, x), violating the left_id < right_id contract.
        rows = data.select(
            F.col(s.id).alias("_id"), *[F.col(f) for f in s.unique_fields]
        ).na.drop(subset=["_id", *s.unique_fields])
        if s.chunk_size is not None:
            return self._dedupe_chunked(data, rows)

        # One shuffle: group identical field tuples, collect member ids.
        # (r13: an explicit-N keyed repartition before the groupBy — the
        # j5-style low-parallelism rescue — was TESTED here and lost: j2
        # 0.38 → 0.46 s med at sf0.1. The 900k-pair explode is ~0.2 s of
        # primitive codegen on one core; spreading it pays more in exchange
        # + scheduling than it saves, unlike j5's heavy per-row agg.)
        # Member ids are DISTINCT'd inside the group array: rows sharing an
        # id (true duplicates of one entity) would otherwise emit the same
        # unordered pair repeatedly, forcing a full extra shuffle
        # (dropDuplicates) over the O(g²) pair set — deduping the O(g)
        # member list instead makes every combination pair unique by
        # construction, so the pair stage stays shuffle-free.
        grouped = (
            rows.groupBy(*s.unique_fields)
            .agg(F.array_distinct(F.collect_list(F.col("_id"))).alias("members"))
            .where(F.size("members") >= 2)
        )
        if s.max_group_size is not None:
            import logging

            oversized = grouped.where(F.size("members") > s.max_group_size)
            n_over = oversized.limit(1).count()
            if n_over:
                example = oversized.select(*s.unique_fields).first()
                logging.getLogger(__name__).warning(
                    "NaiveDeduper: dropping group(s) larger than "
                    "max_group_size=%d (example values: %s) — a degenerate "
                    "key would emit O(g²) pairs in one task",
                    s.max_group_size,
                    example,
                )
            grouped = grouped.where(F.size("members") <= s.max_group_size)

        # Pairs within each group: positional combinations — member i pairs
        # with the tail slice after it, emitting exactly g·(g-1)/2 rows
        # (no synthetic row index: positional (i, j), i<j, is the strict
        # row order the reference's _unique_e4003b row index provides).
        # Members are distinct, so each unordered pair appears exactly
        # once — least/greatest canonicalises orientation without needing
        # a dedup shuffle afterwards.
        pairs = _tail_slice_pairs(grouped).withColumn("score", F.lit(1.0))
        # preserve the caller's id dtype (reference naive.py:66-75)
        id_type = data.schema[s.id].dataType
        return pairs.select(
            F.col("left_id").cast(id_type).alias("left_id"),
            F.col("right_id").cast(id_type).alias("right_id"),
            F.col("score").cast("float").alias("score"),
        )

    def _dedupe_chunked(self, data: DataFrame, rows: DataFrame) -> DataFrame:
        """Skew-distributed pair construction (set-identical to ``dedupe``).

        Rows number off within their group (window on the unique fields) and
        split into chunks of ``chunk_size``. Pairs come from two sources:

        - **in-chunk**: positional combinations inside each (group, chunk) —
          at most chunk_size²/2 structs per task;
        - **cross-chunk**: each row replicates once per HIGHER chunk of its
          group (explode of a sequence) and equi-joins the rows of that
          chunk on (group, chunk) — so a group of g rows spreads its
          g·(g-1)/2 pairs over ~(g/chunk_size)² join tasks instead of one.

        Total work is unchanged (the pair count is the semantics); what
        changes is the worst-case single-task memory, which drops from
        O(g²) to O(chunk_size²) — the difference between a degenerate key
        OOMing an executor and merely costing time.
        """
        s = self.settings
        c = int(s.chunk_size)
        if c < 2:
            raise ValueError(f"chunk_size must be >= 2: {c}")
        from pyspark.sql import Window

        gk = [F.col(f) for f in s.unique_fields]
        w = Window.partitionBy(*gk).orderBy("_id")
        wg = Window.partitionBy(*gk)
        # `_g` counts DISTINCT member ids — the same quantity the non-chunked
        # path caps on (size of the array_distinct'd member list), so a given
        # input and max_group_size keep/drop identical group sets in both
        # paths. `_graw` (raw row count) only drives the chunk layout, where
        # physical rows are what occupy task memory.
        numbered = (
            rows.withColumn("_rn", F.row_number().over(w) - 1)
            .withColumn("_g", F.size(F.collect_set("_id").over(wg)))
            .withColumn("_graw", F.count("*").over(wg))
            .where(F.col("_g") >= 2)
        )
        if s.max_group_size is not None:
            # same disclosure as the non-chunked path: dropping a group is a
            # semantic decision the operator must not make silently
            import logging

            oversized = numbered.where(F.col("_g") > s.max_group_size)
            if oversized.limit(1).count():
                example = oversized.select(*s.unique_fields).first()
                logging.getLogger(__name__).warning(
                    "NaiveDeduper(chunked): dropping group(s) larger than "
                    "max_group_size=%d (example values: %s)",
                    s.max_group_size,
                    example,
                )
            numbered = numbered.where(F.col("_g") <= s.max_group_size)
        numbered = numbered.withColumn(
            "_chunk", (F.col("_rn") / c).cast("int")
        ).withColumn("_nchunks", F.ceil(F.col("_graw") / c).cast("int"))

        # in-chunk: collect each (group, chunk)'s ids, combinations via the
        # same codegen'd posexplode/tail-slice as the non-chunked path
        m = F.col("members")
        in_chunk = _tail_slice_explode(
            numbered.groupBy(*gk, F.col("_chunk"))
            .agg(F.sort_array(F.collect_list(F.struct("_rn", "_id"))).alias("mm"))
            .select(F.transform(F.col("mm"), lambda x: x["_id"]).alias("members"))
            .where(F.size(m) >= 2)
        )
        # cross-chunk: replicate each row to every higher chunk of its group
        left_rep = numbered.select(
            *gk,
            F.col("_id").alias("_lid"),
            F.explode(
                F.when(
                    F.col("_chunk") + 1 <= F.col("_nchunks") - 1,
                    F.sequence(F.col("_chunk") + 1, F.col("_nchunks") - 1),
                ).otherwise(F.array()),
            ).alias("_chunk"),
        )
        right_side = numbered.select(
            *gk, F.col("_chunk"), F.col("_id").alias("_rid")
        )
        cross = left_rep.join(
            right_side, [*s.unique_fields, "_chunk"]
        ).select(F.col("_lid").alias("lid"), F.col("_rid").alias("rid"))
        pairs = (
            in_chunk.unionByName(cross)
            .where(F.col("lid") != F.col("rid"))
            .select(
                F.least("lid", "rid").alias("left_id"),
                F.greatest("lid", "rid").alias("right_id"),
            )
            .dropDuplicates(["left_id", "right_id"])
            .withColumn("score", F.lit(1.0))
        )
        id_type = data.schema[s.id].dataType
        return pairs.select(
            F.col("left_id").cast(id_type).alias("left_id"),
            F.col("right_id").cast(id_type).alias("right_id"),
            F.col("score").cast("float").alias("score"),
        )
