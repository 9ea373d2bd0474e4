"""Native Fellegi–Sunter probabilistic linker (J6, Spark-first).

The reference delegates probabilistic linking to Splink (splinklinker.py:
177-257 — blocking rules → comparison levels → EM → match weights). Splink
isn't available here, so this is a from-scratch implementation of the same
published method (Fellegi & Sunter 1969; EM estimation as in Winkler 1988):

1. **Blocking**: candidate pairs are the union of equi-joins on blocking
   rules (never a cross join) — identical machinery to DeterministicLinker.
2. **Comparison vector**: each comparison is a boolean Spark SQL expression
   over ``l.``/``r.``; agreement patterns γ ∈ {0,1}^k are computed as
   codegen'd columns.
3. **EM**: the E/M steps need only the *pattern counts* (≤ 2^k rows), which
   aggregate distributively; the iteration itself runs on the driver over
   that tiny table. m/u probabilities and the match prior λ converge in a
   few dozen iterations.
4. **Scoring**: P(match | γ) per pattern, broadcast-joined back onto the
   candidate pairs. Edges above ``threshold`` are emitted with that
   probability as the score.

The heavy work (blocking joins, γ computation, pattern counting, score join)
is all DataFrame ops; the driver loop touches at most 2^k floats.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from matchbox_spark.operators.comparison import validate_comparison
from matchbox_spark.operators.linkers import Linker, LinkerSettings, finalise_edges
from matchbox_spark.operators.registry import add_model_class

logger = logging.getLogger(__name__)


@dataclass
class FellegiSunterSettings(LinkerSettings):
    blocking_rules: list = field(default_factory=list)
    comparisons: list = field(default_factory=list)  # boolean l./r. exprs
    threshold: float = 0.5
    max_iter: int = 60
    tol: float = 1e-6
    # initial parameter guesses (Winkler-style defaults)
    init_lambda: float = 0.1
    init_m: float = 0.9
    init_u: float = 0.1


def _em(counts: list[tuple[tuple[int, ...], int]], k: int, s) -> tuple[float, list[float], list[float]]:
    """EM over agreement-pattern counts; returns (λ, m[], u[])."""
    lam, m, u = s.init_lambda, [s.init_m] * k, [s.init_u] * k
    total = sum(c for _, c in counts)
    for it in range(s.max_iter):
        # E-step: posterior match probability per pattern
        post = []
        for gamma, c in counts:
            pm = lam
            pu = 1 - lam
            for i in range(k):
                pm *= m[i] if gamma[i] else (1 - m[i])
                pu *= u[i] if gamma[i] else (1 - u[i])
            w = pm / (pm + pu) if (pm + pu) > 0 else 0.0
            post.append(w)
        # M-step
        sum_w = sum(w * c for w, (_, c) in zip(post, counts))
        sum_nw = total - sum_w
        new_lam = sum_w / total if total else 0.0
        new_m, new_u = [], []
        for i in range(k):
            num_m = sum(w * c for w, (g, c) in zip(post, counts) if g[i])
            num_u = sum((1 - w) * c for w, (g, c) in zip(post, counts) if g[i])
            new_m.append(min(max(num_m / sum_w if sum_w else 0.5, 1e-6), 1 - 1e-6))
            new_u.append(min(max(num_u / sum_nw if sum_nw else 0.5, 1e-6), 1 - 1e-6))
        delta = abs(new_lam - lam) + sum(
            abs(a - b) for a, b in zip(new_m + new_u, m + u)
        )
        lam, m, u = new_lam, new_m, new_u
        if delta < s.tol:
            logger.info("EM converged after %d iterations", it + 1)
            break
    return lam, m, u


@add_model_class
class FellegiSunterLinker(Linker):
    """Probabilistic record linkage with EM-trained m/u weights."""

    settings_class = FellegiSunterSettings

    # fitted parameters (populated by prepare/link)
    lambda_: float | None = None
    m_: list[float] | None = None
    u_: list[float] | None = None

    def _candidates(self, left: DataFrame, right: DataFrame) -> DataFrame:
        s = self.settings
        if not s.blocking_rules:
            raise ValueError("FellegiSunterLinker requires blocking_rules")
        if not s.comparisons:
            raise ValueError("FellegiSunterLinker requires comparisons")
        for cond in list(s.blocking_rules) + list(s.comparisons):
            validate_comparison(cond)

        l = left.alias("l")  # noqa: E741
        r = right.alias("r")
        gamma_cols = [
            F.when(F.expr(c), 1).otherwise(0).alias(f"g{i}")
            for i, c in enumerate(s.comparisons)
        ]
        per_rule = [
            l.join(r, F.expr(rule), "inner").select(
                F.col(f"l.{s.left_id}").alias("left_id"),
                F.col(f"r.{s.right_id}").alias("right_id"),
                *gamma_cols,
            )
            for rule in s.blocking_rules
        ]
        out = per_rule[0]
        for other in per_rule[1:]:
            out = out.union(other)
        return out.dropDuplicates(["left_id", "right_id"])

    def link(self, left: DataFrame, right: DataFrame) -> DataFrame:
        s = self.settings
        k = len(s.comparisons)
        cands = self._candidates(left, right).localCheckpoint(eager=True)

        gcols = [f"g{i}" for i in range(k)]
        pattern_counts = (
            cands.groupBy(*gcols).agg(F.count("*").alias("n")).collect()
        )
        counts = [
            (tuple(int(row[g]) for g in gcols), int(row["n"]))
            for row in pattern_counts
        ]
        lam, m, u = _em(counts, k, s)
        self.lambda_, self.m_, self.u_ = lam, m, u
        logger.info("FS fit: lambda=%.4f m=%s u=%s", lam, m, u)

        # score per pattern (tiny) broadcast back onto candidates
        spark = cands.sparkSession
        rows = []
        for gamma, _ in counts:
            pm, pu = lam, 1 - lam
            for i in range(k):
                pm *= m[i] if gamma[i] else (1 - m[i])
                pu *= u[i] if gamma[i] else (1 - u[i])
            rows.append((*gamma, float(pm / (pm + pu)) if pm + pu else 0.0))
        score_df = spark.createDataFrame(
            rows, ", ".join(f"{g} int" for g in gcols) + ", score double"
        )
        scored = cands.join(F.broadcast(score_df), gcols).where(
            F.col("score") >= F.lit(float(s.threshold))
        )
        return finalise_edges(
            scored.select("left_id", "right_id", "score"),
            left, right, s.left_id, s.right_id,
        )

    def match_weights(self) -> list[dict]:
        """Per-comparison log2 match weights (Splink-style diagnostics)."""
        if self.m_ is None:
            raise RuntimeError("fit the linker first (call link)")
        return [
            {
                "comparison": c,
                "m": mi,
                "u": ui,
                "match_weight": math.log2(mi / ui) if ui > 0 else float("inf"),
            }
            for c, mi, ui in zip(self.settings.comparisons, self.m_, self.u_)
        ]
