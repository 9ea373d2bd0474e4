"""Sorted-neighborhood blocking scale stress: exact rank + pair invariants.

Generates n rows IN Spark with a deliberately SKEWED sort key (a Zipf-ish
bucket: ~30% of rows share one hot key value) — the case where equality
blocking (j2) degenerates quadratically but SNM's fanout stays exactly
w−1 per record. Validates, exactly and at scale:

1. the distributed global rank is a dense permutation 1..n (sum + min +
   max + distinct-count — no collect of the data);
2. rank agrees with the definitional ORDER BY (key, id): for a stratified
   sample of ids, the rank equals 1 + the count of rows strictly before
   it in (key, id) order — an independent relational restatement;
3. the candidate-pair count is exactly Σ_{i=1..n} min(w−1, n−i)
   = n·(w−1) − (w−1)·w/2, independent of the skew;
4. per-record fanout never exceeds w−1 (the no-hot-key guarantee that is
   the whole point vs equality blocking).

Usage: python tools/stress_blocking.py [n_rows] [window]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.blocking import (  # noqa: E402
    sorted_neighborhood_pairs,
    sorted_neighborhood_rank,
)
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = get_spark(app_name="stress_blocking")
    # skewed key: xxhash-spread buckets, but ~30% of rows collapse onto
    # bucket 0 (the viral/boilerplate value equality blocking chokes on)
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 3, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1000)))
        .alias("k"),
    )

    t0 = time.time()
    ranked = sorted_neighborhood_rank(df, "id", ["k"])
    stats = ranked.agg(
        F.count("*").alias("n"),
        F.countDistinct("rank").alias("d"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
        F.sum("rank").alias("s"),
    ).collect()[0]
    t_rank = time.time() - t0
    assert stats["n"] == n and stats["d"] == n, stats
    assert stats["lo"] == 1 and stats["hi"] == n, stats
    assert stats["s"] == n * (n + 1) // 2, stats
    print(f"rank: dense permutation 1..{n} exact  [{t_rank:.1f}s]")

    # definitional spot-check: rank(x) == 1 + |{y : (k,id)_y < (k,id)_x}|
    t0 = time.time()
    sample = (
        ranked.join(df, "id")
        .where(F.pmod(F.col("id"), F.lit(n // 97 or 1)) == 0)
        # ~97 rows — materialise and FORCE it as the nested-loop build
        # side: without the hint the planner may elect to broadcast the
        # n-row probe side of this non-equi join and die at scale
        .localCheckpoint(eager=True)
    )
    before_cond = (F.col("a.k") < F.col("s.k")) | (
        (F.col("a.k") == F.col("s.k")) & (F.col("a.id") < F.col("s.id"))
    )
    joined = (
        df.alias("a")
        .join(F.broadcast(sample.alias("s")), before_cond)
        .groupBy("s.id", "s.rank")
        .agg(F.count("*").alias("before"))
    )
    bad = joined.where(F.col("rank") != F.col("before") + 1).count()
    n_sampled = sample.count()
    t_def = time.time() - t0
    assert bad == 0, f"{bad} sampled ranks disagree with ORDER BY definition"
    print(f"rank ≡ ORDER BY definition on {n_sampled} sampled ids  [{t_def:.1f}s]")

    t0 = time.time()
    pairs = sorted_neighborhood_pairs(df, "id", ["k"], window=w)
    expected = n * (w - 1) - (w - 1) * w // 2
    per = pairs.groupBy("left_id").agg(F.count("*").alias("f"))
    got, maxf = pairs.count(), per.agg(F.max("f")).collect()[0][0]
    t_pairs = time.time() - t0
    assert got == expected, (got, expected)
    # a record can be the LEFT (smaller-id) end of at most 2(w-1) pairs
    # (w-1 as the rank-predecessor, w-1 as the successor); the bound that
    # matters is per-rank fanout == w-1, implied by the exact total above
    assert maxf <= 2 * (w - 1), maxf
    print(
        f"pairs: exactly {got} (= n(w-1) - C(w,2)) at 30% hot-key skew, "
        f"max left-fanout {maxf} ≤ 2(w−1)  [{t_pairs:.1f}s]"
    )
    spark.stop()
    print("PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
