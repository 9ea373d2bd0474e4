"""IVF-Flat ANN stress: recall vs brute force on a synthetic vector corpus.

Corpus generated fully JVM-side: 100k clustered vectors (64-dim) — each
vector is its cluster centre plus deterministic pseudo-noise derived from
xxhash64, so generation is an expression pipeline (no driver loop, no
Python UDF) and the corpus has real cluster structure for KMeans to find.

Measures: IVF build+search wall time, brute-force wall time on the same
queries, and recall@10 (fraction of true top-10 neighbours the IVF search
returns with n_probe lists of n_lists). Usage::

    python tools/stress_ann.py [n_vectors] [n_queries]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.similarity import cosine_topk, ivf_topk  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402

DIM = 64
N_CENTRES = 32


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_q = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark(app_name="stress_ann")

    # centre c of vector i = i % N_CENTRES; component d =
    # centre signal (hash of (c, d)) + small noise (hash of (i, d))
    def comp(d: int):
        c = F.col("id") % N_CENTRES
        signal = (F.xxhash64(c, F.lit(d)) % 1000).cast("double") / 500.0
        noise = (F.xxhash64(F.col("id"), F.lit(d + 10_000)) % 1000).cast(
            "double"
        ) / 5000.0
        return (signal + noise).cast("float")

    corpus = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[comp(d) for d in range(DIM)]).alias("embedding"),
    ).persist()
    corpus.count()
    queries = corpus.where(F.col("vec_id") % (n // n_q) == 1)

    t0 = time.time()
    ivf = ivf_topk(
        corpus, queries, k=10, n_lists=N_CENTRES, n_probe=4
    ).select("query", "neighbor").persist()
    n_ivf = ivf.count()
    t_ivf = time.time() - t0

    t0 = time.time()
    exact = cosine_topk(corpus, queries, k=10).select("query", "neighbor").persist()
    n_exact = exact.count()
    t_exact = time.time() - t0

    hits = ivf.join(exact, ["query", "neighbor"]).count()
    recall = hits / n_exact if n_exact else 0.0
    ok = recall >= 0.9
    print(
        f"vectors={n:,} queries={n_q} ivf={t_ivf:.1f}s exact={t_exact:.1f}s "
        f"ivf_rows={n_ivf} recall@10={recall:.3f} -> "
        f"{'OK' if ok else 'LOW RECALL'}"
    )
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
