"""MinHash-LSH dedupe stress: planted near-duplicates at 100k+ docs.

Corpus is generated fully JVM-side (spark.range + expression-derived words —
no driver loop, no Python UDF), so the harness itself scales: every doc is
30 words drawn deterministically from its id; every 20th doc gets a
near-duplicate twin with the last word replaced (shingle Jaccard ≈ 0.93).

Reports wall time and recall of planted pairs at threshold 0.7. Usage::

    python tools/stress_dedup.py [n_docs] [words_per_doc] [max_verify_shingles]

With ``words_per_doc`` large (e.g. 2000) and a small cap (e.g. 512) this
doubles as the adversarially-long-document harness: verification joins carry
bounded bottom-k sketches instead of full shingle sets, so executor memory
stays flat regardless of document length.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.dedup import minhash_dedupe_pairs  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="stress_dedup")

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(words)),
                lambda i: F.concat(
                    F.lit("w"), (F.xxhash64(F.col("id"), i) % 5000).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )
    twins = (
        base.where(F.col("doc_id") % 20 == 0)
        .select(
            (F.col("doc_id") + n).alias("doc_id"),
            F.concat(
                F.regexp_replace(F.col("text"), r" w-?\d+$", ""), F.lit(" wEDIT")
            ).alias("text"),
        )
    )
    docs = base.unionByName(twins).persist()
    n_twins = twins.count()

    t0 = time.time()
    pairs = minhash_dedupe_pairs(
        docs, "doc_id", "text", num_perm=32, bands=8, threshold=0.7,
        max_verify_shingles=cap,
    )
    found = (
        pairs.where(F.col("doc_b") - F.col("doc_a") == n)
        .where(F.col("doc_a") % 20 == 0)
        .count()
    )
    total_pairs = pairs.count()
    dt = time.time() - t0
    recall = found / n_twins if n_twins else 1.0
    ok = recall >= 0.95
    print(
        f"docs={docs.count():,} planted={n_twins:,} found={found:,} "
        f"recall={recall:.3f} total_pairs={total_pairs:,} "
        f"time={dt:.1f}s -> {'OK' if ok else 'LOW RECALL'}"
    )
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
