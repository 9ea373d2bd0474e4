"""Large-k centroid assignment stress: the broadcast-centroid scale path.

SemDeDup's scale rule grows k with the corpus (cluster populations stay
constant), and the literal-centroid plan collapses around k·dim ≳ 1e5
inlined expressions — the one acknowledged 100 TB scale-killer of round 5.
This harness proves the round-6 broadcast path holds at k ≥ 4096:

- **no plan-compilation stall**: building + analyzing the large-k
  assignment plan is bounded (< 15 s) and independent of k — centroids
  ride as data (arrow: task closure; broadcast: one-row frame), the plan
  is constant-size;
- **argmin exactness at large k**: a sampled subset is re-assigned through
  the proven literal path in 256-centroid CHUNKS (16 small plans), the
  chunk minima folded driver-side — the arrow (BLAS matmul) argmin must
  pick the same cluster per row, and its float64 distance must agree with
  the decimal recipe to 1e-6;
- **bit-exact fallback**: the ``broadcast`` scaled-long path reproduces
  the literal path's (dist, cid) EXACTLY — decimals included — on the
  same sample, at full k;
- **flat task-time scaling**: doubling n scales wall time ~linearly
  (ratio bounded), i.e. the per-row cost is constant and there is no
  hidden quadratic or recompilation term.

Usage::

    python tools/stress_large_k.py [n_vectors] [k] [dim]
"""

from __future__ import annotations

import random
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.clustering import (  # noqa: E402
    LITERAL_CENTROID_MAX,
    assign_to_centroids,
)
from matchbox_spark.session import get_spark  # noqa: E402


def corpus(spark, n: int, dim: int):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.xxhash64("id", F.lit(d)) % 1000).cast("double") / 100.0)
                for d in range(dim)
            ]
        ).alias("embedding"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    assert k > LITERAL_CENTROID_MAX, "stress is about the broadcast regime"
    spark = get_spark(app_name="stress_large_k")

    rng = random.Random(7)
    cents = {
        i: [rng.uniform(0.0, 10.0) for _ in range(dim)] for i in range(k)
    }

    # 1. plan build + analysis is k-independent (constant plan size)
    t0 = time.monotonic()
    plan = assign_to_centroids(corpus(spark, n, dim), cents)
    _ = plan.schema  # forces analysis
    build_s = time.monotonic() - t0
    assert build_s < 15.0, f"plan build stalled: {build_s:.1f}s"

    # 2. full assignment at (n, k). The aggregate reads the COMPUTED
    # columns — a bare count() would let Catalyst prune the whole
    # projection and time an empty scan.
    t1 = time.monotonic()
    full = plan.persist()
    stats = full.agg(
        F.count("*").alias("n"),
        F.min("cluster").alias("lo"),
        F.max("cluster").alias("hi"),
    ).collect()[0]
    run_s = time.monotonic() - t1
    assert stats["n"] == n, (stats["n"], n)
    assert 0 <= stats["lo"] and stats["hi"] < k, (stats["lo"], stats["hi"])

    # 3. exactness: sample rows re-assigned via the PROVEN literal path in
    # 256-centroid chunks; fold chunk minima driver-side on (dist, cid)
    sample_n = 256
    sample = corpus(spark, n, dim).where(F.col("vec_id") < sample_n)
    expected: dict[int, tuple] = {}
    cids = sorted(cents)
    for lo in range(0, k, LITERAL_CENTROID_MAX):
        chunk = {c: cents[c] for c in cids[lo : lo + LITERAL_CENTROID_MAX]}
        got = assign_to_centroids(sample, chunk, method="literal").collect()
        for r in got:
            cand = (r["dist"], r["cluster"])
            if r["id"] not in expected or cand < expected[r["id"]]:
                expected[r["id"]] = cand
    # 3a. arrow path: same winning cluster, float64 dist within 1e-6
    actual = {
        r["id"]: (r["dist"], r["cluster"])
        for r in full.where(F.col("id") < sample_n).collect()
    }
    assert set(actual) == set(expected)
    for i, (dist, cluster) in actual.items():
        exp_dist, exp_cluster = expected[i]
        assert cluster == exp_cluster, (i, cluster, exp_cluster)
        assert abs(float(dist) - float(exp_dist)) < 1e-6, (i, dist, exp_dist)
    # 3b. broadcast (scaled-long) path: BIT-exact vs literal, full k
    exact = {
        r["id"]: (r["dist"], r["cluster"])
        for r in assign_to_centroids(
            sample, cents, method="broadcast"
        ).collect()
    }
    assert exact == expected, {
        i: (exact[i], expected[i]) for i in exact if exact[i] != expected[i]
    }

    # 4. flat scaling: 2n must not cost more than ~3x n (linear + overhead)
    t2 = time.monotonic()
    stats2 = (
        assign_to_centroids(corpus(spark, 2 * n, dim), cents)
        .agg(F.count("*").alias("n"), F.max("cluster").alias("hi"))
        .collect()[0]
    )
    run2_s = time.monotonic() - t2
    assert stats2["n"] == 2 * n
    assert stats2["hi"] < k
    assert run2_s < 3.5 * max(run_s, 1.0), (run_s, run2_s)

    print(
        f"large-k assignment n={n} k={k} dim={dim}: build {build_s:.1f}s, "
        f"run {run_s:.1f}s, 2n run {run2_s:.1f}s "
        f"(x{run2_s / max(run_s, 1e-9):.2f}); sample of {sample_n} exact vs "
        f"chunked-literal path"
    )
    print("PASS")
    spark.stop()


if __name__ == "__main__":
    main()
