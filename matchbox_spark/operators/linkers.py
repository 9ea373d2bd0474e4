"""Linkers: cross-source pair generation (SURVEY §2.3 J3-J6).

Semantics match the reference linkers (deterministic.py:91-230,
weighteddeterministic.py:85-145) re-expressed Spark-first:

- OR-combined comparisons become a UNION ALL of single-condition joins plus a
  DISTINCT — the reference does this rewrite too, because no optimizer splits
  an OR theta-join into equi-joins (SURVEY §4). Each equality condition stays
  an equi-join Catalyst can hash/sort-merge; non-equi conditions are logged.
- Sequential rounds anti-join matched ids out of both pools before the next
  round (J4) — a driver-side loop; each round's plan is optimised separately.
- The weighted linker scores each comparison with its weight, sums per pair,
  and keeps pairs with normalised score >= threshold (J5/A5).
"""

from __future__ import annotations

import logging
from abc import ABC, abstractmethod
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.operators.comparison import is_equi_condition, validate_comparison
from matchbox_spark.operators.registry import add_model_class

logger = logging.getLogger(__name__)


def finalise_edges(out: DataFrame, left: DataFrame, right: DataFrame,
                   left_id: str, right_id: str) -> DataFrame:
    """Edge schema with ids cast back to the INPUT id dtypes (the reference
    preserves the caller's dtype — naive.py:66-75; catalog sync separately
    requires long cluster ids and conforms there)."""
    lt = left.schema[left_id].dataType
    rt = right.schema[right_id].dataType
    return out.select(
        F.col("left_id").cast(lt).alias("left_id"),
        F.col("right_id").cast(rt).alias("right_id"),
        F.col("score").cast("float").alias("score"),
    )


@dataclass
class LinkerSettings:
    left_id: str = "id"
    right_id: str = "id"


class Linker(ABC):
    """A model step over two queries: emits scored cross-source pairs."""

    def __init__(self, **settings):
        self.settings = self.settings_class(**settings)

    settings_class = LinkerSettings

    def prepare(self, left: DataFrame, right: DataFrame) -> None:
        """Hook for subclasses needing precomputation (e.g. EM training)."""

    @abstractmethod
    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        """Return edges ``(left_id, right_id, score)``."""


def _join_one_condition(
    left: DataFrame,
    right: DataFrame,
    condition: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """One inner join l×r on a single validated condition, projecting id pairs."""
    if not is_equi_condition(condition):
        logger.info(
            "comparison %r is not a pure equi-join; Catalyst will use a "
            "nested-loop strategy — consider rewriting as equalities",
            condition,
        )
    l = left.alias("l")  # noqa: E741
    r = right.alias("r")
    return l.join(r, F.expr(condition), "inner").select(
        F.col(f"l.{left_id}").alias("left_id"),
        F.col(f"r.{right_id}").alias("right_id"),
    )


@dataclass
class DeterministicSettings(LinkerSettings):
    # flat list → single round, OR-combined; nested lists → sequential rounds
    comparisons: list = field(default_factory=list)

    def rounds(self) -> list[list[str]]:
        if not self.comparisons:
            raise ValueError("DeterministicLinker requires comparisons")
        if isinstance(self.comparisons[0], (list, tuple)):
            return [list(r) for r in self.comparisons]
        return [list(self.comparisons)]


@add_model_class
class DeterministicLinker(Linker):
    """Rule-based linking: union of per-condition joins, optional rounds."""

    settings_class = DeterministicSettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        s = self.settings
        rounds = s.rounds()
        for rnd in rounds:
            for cond in rnd:
                validate_comparison(cond)

        all_matches: list[DataFrame] = []
        remaining_left, remaining_right = left, right

        for round_num, conditions in enumerate(rounds, start=1):
            per_condition = [
                _join_one_condition(
                    remaining_left, remaining_right, c, s.left_id, s.right_id
                )
                for c in conditions
            ]
            matches = per_condition[0]
            for other in per_condition[1:]:
                matches = matches.union(other)
            matches = matches.dropDuplicates(["left_id", "right_id"]).withColumn(
                "score", F.lit(1.0)
            )
            # reference-style blow-up guard: log optimizer size estimates
            # before executing the round (plan analysis only, no job)
            from matchbox_spark.functions.diagnostics import warn_on_blowup

            warn_on_blowup(matches, f"DeterministicLinker round {round_num}")

            if len(rounds) > 1:
                # Materialise: the next round's anti-join depends on this one,
                # and re-deriving it would re-run the joins.
                matches = matches.localCheckpoint(eager=True)
                logger.info("round %d: %d matches", round_num, matches.count())
                matched_left = matches.select(
                    F.col("left_id").alias(s.left_id)
                ).distinct()
                matched_right = matches.select(
                    F.col("right_id").alias(s.right_id)
                ).distinct()
                remaining_left = remaining_left.join(
                    matched_left, s.left_id, "left_anti"
                )
                remaining_right = remaining_right.join(
                    matched_right, s.right_id, "left_anti"
                )
            all_matches.append(matches)

        out = all_matches[0]
        for m in all_matches[1:]:
            out = out.union(m)
        return finalise_edges(out, left, right, s.left_id, s.right_id)


@dataclass
class WeightedComparison:
    comparison: str
    weight: float


@dataclass
class WeightedDeterministicSettings(LinkerSettings):
    weighted_comparisons: list = field(default_factory=list)
    threshold: float = 1.0

    def __post_init__(self):
        self.weighted_comparisons = [
            wc
            if isinstance(wc, WeightedComparison)
            else WeightedComparison(**wc)
            if isinstance(wc, dict)
            else WeightedComparison(*wc)
            for wc in self.weighted_comparisons
        ]
        if not 0 <= self.threshold <= 1:
            raise ValueError("threshold must be in [0, 1]")


@add_model_class
class WeightedDeterministicLinker(Linker):
    """Weighted rule agreement: sum(weight of matching rules)/total >= threshold."""

    settings_class = WeightedDeterministicSettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        s = self.settings
        if not s.weighted_comparisons:
            raise ValueError("WeightedDeterministicLinker requires weighted_comparisons")
        total = sum(wc.weight for wc in s.weighted_comparisons)

        # ONE pair-keyed shuffle instead of three: the reference shape
        # (per-rule pair-dedupe, then a score-sum aggregate,
        # weighteddeterministic.py:85-145) shuffles the SAME (left, right)
        # key once per rule plus once to merge. Tagging each raw join row
        # with its rule's BIT and bit_or-folding per pair is set-equivalent
        # to collecting the distinct rule set: duplicate (pair, rule) rows
        # (non-unique ids joining many-to-many) collapse in the mask, the
        # bit_or partials combine map-side so the exchange carries one
        # long per pair per map task, and the whole aggregate + score
        # stays primitive whole-stage codegen (r6: replaced collect_set +
        # HOF fold — object sets and interpreted lambdas on 10^5-10^6
        # pairs). ≥ 63 rules would overflow the mask; fall back to the
        # set-based fold there.
        use_mask = len(s.weighted_comparisons) < 63
        tagged: list[DataFrame] = []
        for i, wc in enumerate(s.weighted_comparisons):
            validate_comparison(wc.comparison)
            tag = (
                F.lit(1 << i).cast("long") if use_mask else F.lit(i)
            ).alias("_rule")
            tagged.append(
                _join_one_condition(
                    left, right, wc.comparison, s.left_id, s.right_id
                ).select("left_id", "right_id", tag)
            )
        unioned = tagged[0]
        for other in tagged[1:]:
            unioned = unioned.union(other)

        # Low-parallelism rescue (r13, guide §2.5): when the rule joins run
        # over narrow scans (broadcast joins over a single-row-group file
        # produce ONE map task per branch), the pair groupBy's map-side
        # partial aggregation builds its whole hash table on 1-2 cores —
        # and by construction it reduces almost nothing here: each branch's
        # (pair, rule) rows are distinct whenever side ids are unique, and
        # different branches never share a map task, so the exchange
        # carries ~every row either way. Repartitioning by the pair key
        # first is the SAME single exchange (groupBy reuses the hash
        # partitioning), but the aggregation hash tables build post-shuffle
        # on every core (j5 agg 1.09 → 0.46 s med at sf0.1). A wide input
        # (the 100 TB case) passes through untouched and keeps map-side
        # partials.
        # N must be EXPLICIT: a bare repartition(cols) is AQE-coalescible,
        # and this exchange is tiny in bytes (three longs/row) but heavy in
        # per-row agg work — AQE's 64 MB advisory folds it back to one
        # partition, which is exactly the serialisation being removed. The
        # count follows the session (defaultParallelism), never a constant.
        sc = unioned.sparkSession.sparkContext
        if unioned.rdd.getNumPartitions() < sc.defaultParallelism:
            unioned = unioned.repartition(
                sc.defaultParallelism, "left_id", "right_id"
            )

        if use_mask:
            score_num = None
            for i, wc in enumerate(s.weighted_comparisons):
                term = F.when(
                    F.col("_mask").bitwiseAND(F.lit(1 << i)) != 0,
                    F.lit(float(wc.weight)),
                ).otherwise(F.lit(0.0))
                score_num = term if score_num is None else score_num + term
            grouped = unioned.groupBy("left_id", "right_id").agg(
                F.bit_or("_rule").alias("_mask")
            )
        else:
            weights = F.array(
                *[F.lit(float(wc.weight)) for wc in s.weighted_comparisons]
            )
            score_num = F.aggregate(
                "_rules",
                F.lit(0.0),
                lambda acc, r: acc + F.element_at(weights, r + 1),
            )
            grouped = unioned.groupBy("left_id", "right_id").agg(
                F.collect_set("_rule").alias("_rules")
            )
        out = (
            grouped.select(
                "left_id",
                "right_id",
                (score_num / F.lit(float(total))).alias("score"),
            )
            .where(F.col("score") >= F.lit(float(s.threshold)))
        )
        return finalise_edges(out, left, right, s.left_id, s.right_id)


@dataclass
class FuzzySettings(LinkerSettings):
    """``field``: string column compared by edit distance on both sides;
    ``blocking``: equi-join column(s) that bound the candidate pairs;
    ``max_distance``: inclusive Levenshtein cutoff."""

    blocking: list = field(default_factory=list)
    field: str = ""  # shadows dataclasses.field from here on — keep it last
    max_distance: int = 1

    def __post_init__(self):
        if not self.field:
            raise ValueError("FuzzyLinker requires a comparison field")
        if not self.blocking:
            raise ValueError(
                "FuzzyLinker requires blocking keys: an unblocked edit-"
                "distance join is a cartesian product at corpus scale"
            )
        if isinstance(self.blocking, str):
            self.blocking = [self.blocking]
        if self.max_distance < 0:
            raise ValueError("max_distance must be >= 0")


@add_model_class
class FuzzyLinker(Linker):
    """Approximate string matching: Levenshtein distance within blocks.

    The classic record-linkage recipe (same surface the reference's
    deterministic linkers feed — deterministic.py:91-230 — but with a fuzzy
    comparator): equi-join on blocking keys, then keep pairs whose
    ``field`` values are within ``max_distance`` edits. Score is
    ``1 − dist/max(len_l, len_r)`` (normalised similarity), so downstream
    threshold filters (P5) compose naturally.

    Scale shape: the blocking equi-join is a plain hash/sort-merge join —
    pair count is Σ |block|², never |corpus|²; the Levenshtein filter is
    Spark's built-in (JVM codegen, no UDF) evaluated only on co-blocked
    pairs. Skewed blocks are visible in the Spark UI as straggler tasks;
    re-block on a finer key rather than salting, since the comparator is
    quadratic in block size by construction.
    """

    settings_class = FuzzySettings

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        s = self.settings
        l = left.alias("l")  # noqa: E741
        r = right.alias("r")
        cond = None
        for k in s.blocking:
            eq = F.col(f"l.{k}") == F.col(f"r.{k}")
            cond = eq if cond is None else (cond & eq)
        dist = F.levenshtein(F.col(f"l.{s.field}"), F.col(f"r.{s.field}"))
        out = (
            l.join(r, cond, "inner")
            .where(dist <= F.lit(int(s.max_distance)))
            .select(
                F.col(f"l.{s.left_id}").alias("left_id"),
                F.col(f"r.{s.right_id}").alias("right_id"),
                F.round(
                    F.lit(1.0)
                    - dist
                    / F.greatest(
                        F.length(F.col(f"l.{s.field}")),
                        F.length(F.col(f"r.{s.field}")),
                    ).cast("double"),
                    6,
                ).alias("score"),
            )
        )
        return finalise_edges(out, left, right, s.left_id, s.right_id)


@add_model_class
class SplinkLinker(Linker):
    """Fellegi–Sunter probabilistic linking via Splink's native Spark backend.

    Splink ships a SparkAPI backend that takes the same settings dictionary the
    reference passes (splinklinker.py:177-257). The dependency is not available
    in this environment; this class gates on import and documents the wiring.
    """

    def __init__(self, **settings):  # noqa: D107
        try:
            import splink  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "SplinkLinker requires the 'splink' package (Spark backend). "
                "Install splink>=4 and use linker_settings={'link_type': "
                "'link_only', ...} as in the reference."
            ) from e
        super().__init__(**settings)

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError("splink not available in this environment")
