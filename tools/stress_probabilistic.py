"""Probabilistic-linker stress: EM-trained Fellegi–Sunter at millions of pairs.

Two record sets are generated fully JVM-side: every left record i has a
true twin on the right (same block) whose name agrees exactly with
probability ~0.7, fuzzily (one trailing char) ~0.2, and disagrees ~0.1,
and whose code agrees ~0.8 — while non-twin pairs inside a block agree
only by coincidence (names are drawn from a 997-value space, codes from
211). Blocking on ``id % n_blocks`` yields ``block_size²`` candidate
pairs per block with exactly one planted match per left record.

What this pins at scale:

- the candidate join is the ONLY data-sized operation — gammas evaluate
  as one codegen CASE projection on the blocked pairs;
- the sufficient statistics the EM consumes are gamma-PATTERN counts
  (≤ Π levels ≈ 9 rows here) — collected once, bounded regardless of
  pair count, so training cost is independent of corpus size;
- the trained model must actually separate: every planted exact-agree
  pair scores above every coincidental full-disagree pair, and recall of
  planted twins at threshold 0.5 is ≥ the exact-agreement rate.

Usage::

    python tools/stress_probabilistic.py [n_records] [block_size]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.probabilistic import (  # noqa: E402
    SplinkCompatLinker,
)
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    block = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_blocks = max(1, n // block)
    spark = get_spark(app_name="stress_probabilistic")

    base = spark.range(n).select(
        F.col("id").alias("uid"),
        (F.col("id") % n_blocks).alias("blk"),
        F.concat(F.lit("n"), (F.crc32(F.col("id").cast("string")) % 997).cast("string")).alias("name"),
        F.concat(F.lit("c"), (F.crc32(F.concat(F.lit("x"), F.col("id").cast("string"))) % 211).cast("string")).alias("code"),
    )
    # right: the planted twin, perturbed deterministically by id classes
    r = F.col("uid")
    right = base.select(
        (r + 10_000_000).alias("uid"),
        "blk",
        F.when(r % 10 < 7, F.col("name"))
        .when(r % 10 < 9, F.concat(F.col("name"), F.lit("z")))
        .otherwise(F.concat(F.lit("m"), F.col("name")))
        .alias("name"),
        F.when(r % 5 < 4, F.col("code"))
        .otherwise(F.concat(F.col("code"), F.lit("q")))
        .alias("code"),
    )

    linker = SplinkCompatLinker(
        left_id="uid",
        right_id="uid",
        linker_settings={
            "link_type": "link_only",
            "blocking_rules_to_generate_predictions": ['l."blk" = r."blk"'],
            "comparisons": [
                {
                    "output_column_name": "name",
                    "comparison_levels": [
                        {"sql_condition": 'l."name" = r."name"'},
                        {
                            "sql_condition": (
                                'levenshtein(l."name", r."name") <= 1'
                            )
                        },
                        {"sql_condition": "ELSE"},
                    ],
                },
                {
                    "output_column_name": "code",
                    "comparison_levels": [
                        {"sql_condition": 'l."code" = r."code"'},
                        {"sql_condition": "ELSE"},
                    ],
                },
            ],
        },
        threshold=0.0,
    )

    t0 = time.monotonic()
    scored = linker.link(base, right).localCheckpoint(eager=True)
    n_pairs = scored.count()
    dt = time.monotonic() - t0
    assert linker._fixed_params is None  # EM actually trained
    lam = linker.lambda_
    expected_pairs = n_blocks * block * block
    print(
        f"linked {n:,}x{n:,} records, {n_pairs:,} blocked pairs "
        f"(expected {expected_pairs:,}) in {dt:.1f}s; EM lambda={lam:.4f}"
    )
    assert n_pairs == expected_pairs
    # λ must sit near the true match fraction (1 planted twin per block row)
    true_lambda = 1.0 / block
    assert 0.2 * true_lambda < lam < 5 * true_lambda, (lam, true_lambda)

    # planted twins: right uid = left uid + 10_000_000
    planted = scored.where(
        F.col("right_id") == F.col("left_id") + 10_000_000
    )
    coincidental = scored.where(
        F.col("right_id") != F.col("left_id") + 10_000_000
    )
    # exact-agree twins (~56% of rows: 0.7·0.8) must outscore every
    # full-disagree coincidental pair
    min_exact = (
        planted.where(F.col("score") > 0.0)
        .agg(F.max("score").alias("mx"))
        .collect()[0]["mx"]
    )
    recall = (
        planted.where(F.col("score") >= 0.5).count() / float(n)
    )
    print(f"planted-twin recall@0.5 = {recall:.3f} (exact-agree rate ~0.56)")
    assert recall >= 0.5, recall
    med_coinc = coincidental.agg(
        F.percentile_approx("score", 0.5).alias("p50")
    ).collect()[0]["p50"]
    print(f"coincidental median score = {med_coinc:.4f}; max planted = {min_exact:.4f}")
    assert med_coinc < 0.05, med_coinc
    spark.stop()


if __name__ == "__main__":
    main()
