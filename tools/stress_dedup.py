"""MinHash-LSH dedupe stress: planted near-duplicates at 100k+ docs.

Corpus is generated fully JVM-side (spark.range + expression-derived words —
no driver loop, no Python UDF), so the harness itself scales: every doc is
30 words drawn deterministically from its id; every 20th doc gets a
near-duplicate twin with the last word replaced (shingle Jaccard ≈ 0.93).

Reports wall time and recall of planted pairs at threshold 0.7. Usage::

    python tools/stress_dedup.py [n_docs] [words_per_doc] [max_verify_shingles]
    python tools/stress_dedup.py --simhash [n_docs] [words_per_doc]
    python tools/stress_dedup.py --embedding [n_vecs] [dim]

With ``words_per_doc`` large (e.g. 2000) and a small cap (e.g. 512) this
doubles as the adversarially-long-document harness: verification joins carry
bounded bottom-k sketches instead of full shingle sets, so executor memory
stays flat regardless of document length.

``--simhash`` (round 10) is the regression harness for the scale-safe
SimHash configuration, driven through the SHIPPED default path:
``SimHashDeduper(bits='auto')``, whose width resolves from the corpus
count at dedupe() time. The harness pins the derivation (at the
measured-cliff region ≥100k docs auto must clear the 32-bit floor the
r9 sf1 probe established — 7.5× faster than the 16-bit demo with
candidates collapsed 24×) and asserts the model resolved exactly
``auto_simhash_bits(n)``. Recall is exact by pigeonhole, so the twin
subset asserts EQUALITY: every twin pair whose true signature hamming
≤ 3 is found, none invented. The full tier (1M docs) pins the r9
one-off 1M-doc confirmation at the auto-derived 40-bit width.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.dedup import minhash_dedupe_pairs  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402


def _corpus(spark, n: int, words: int):
    """Planted-twin corpus, fully JVM-side: every 20th doc gets a
    near-duplicate with the last word replaced."""
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
    return base, twins


def main_simhash() -> None:
    from matchbox_spark.operators.dedup import (
        auto_simhash_bits,
        simhash_values,
    )
    from matchbox_spark.operators.lsh_linkers import SimHashDeduper

    args = [int(a) for a in sys.argv[1:] if a.lstrip("-").isdigit()]
    n = args[0] if len(args) > 0 else 100_000
    words = args[1] if len(args) > 1 else 30
    max_hamming = 3
    spark = get_spark(app_name="stress_simhash")
    base, twins = _corpus(spark, n, words)
    docs = base.unionByName(twins).persist()
    n_docs = docs.count()

    # the SHIPPED default path: bits='auto' resolves the width from the
    # corpus count at dedupe() time. Pin the derivation itself: at the
    # measured-cliff region (>=100k docs) auto must clear the 32-bit
    # scale-safe floor the r9 sf1 probe established.
    bits = auto_simhash_bits(n_docs, max_hamming)
    if n_docs >= 100_000 and bits < 32:
        print(f"auto_simhash_bits({n_docs:,})={bits} < 32 -> SIZING BROKEN")
        sys.exit(1)

    # ground truth on the twin subset: each planted pair's true signature
    # hamming (one O(n) join — no quadratic work)
    sims = simhash_values(docs, "doc_id", "text", bits).persist()
    a = sims.where(F.col("doc") < n).select(
        F.col("doc").alias("doc_a"), F.col("simhash").alias("sa")
    )
    b = sims.where(F.col("doc") >= n).select(
        (F.col("doc") - n).alias("doc_a"), F.col("simhash").alias("sb")
    )
    expected = (
        a.join(b, "doc_a")
        .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= max_hamming)
        .count()
    )

    t0 = time.time()
    deduper = SimHashDeduper(
        id="doc_id", text_field="text", max_hamming=max_hamming
    )  # bits='auto' default — the path a user gets
    edges = deduper.dedupe(docs).persist()
    total_pairs = edges.count()
    dt = time.time() - t0
    resolved = deduper._resolved_bits()
    if resolved != bits:
        print(f"model resolved bits={resolved}, expected {bits} -> SIZING BROKEN")
        sys.exit(1)
    found = (
        edges.where(F.col("right_id") - F.col("left_id") == n)
        .where(F.col("left_id") % 20 == 0)
        .count()
    )
    ok = found == expected
    print(
        f"[simhash bits={bits} (auto) mh={max_hamming}] docs={n_docs:,} "
        f"twin_pairs_within_h{max_hamming}={expected:,} found={found:,} "
        f"total_pairs={total_pairs:,} time={dt:.1f}s -> "
        f"{'OK' if ok else 'RECALL BROKEN'}"
    )
    spark.stop()
    sys.exit(0 if ok else 1)


def main_embedding() -> None:
    """Batch EmbeddingDeduper through the SHIPPED default path
    (``bucket_dims='auto'``): planted sign-preserving twins over a
    JVM-generated vector corpus. A twin is the base vector with every
    component scaled by a positive factor, so all sign bits — hence the
    LSH home bucket — are IDENTICAL and cosine ≈ 0.9998: recall of
    planted pairs is exact by construction, making this an equality
    assert like the SimHash harness, not a recall estimate. Also pins
    the derivation: the model must resolve exactly
    ``auto_embedding_bucket_dims(n, dim)`` (log2-of-corpus bucket space,
    the rule that keeps occupancy flat at any scale).

    Usage: python tools/stress_dedup.py --embedding [n_vecs] [dim]
    """
    from matchbox_spark.operators.dedup import auto_embedding_bucket_dims
    from matchbox_spark.operators.lsh_linkers import EmbeddingDeduper

    args = [int(a) for a in sys.argv[1:] if a.lstrip("-").isdigit()]
    n = args[0] if len(args) > 0 else 200_000
    dim = args[1] if len(args) > 1 else 32
    spark = get_spark(app_name="stress_embedding_dedupe")

    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            # pmod keeps the sign bits balanced (plain % follows the
            # dividend's sign and would pile 75% of mass negative)
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2000)) - 999.5)
            / 1000.0,
        ).alias("embedding"),
    )
    twins = base.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x
            * (1.0 + F.pmod(F.xxhash64(F.lit(7), i), F.lit(100)) / 5000.0),
        ).alias("embedding"),
    )
    docs = base.unionByName(twins).persist()
    n_docs = docs.count()
    n_twins = (n + 19) // 20

    expected_dims = auto_embedding_bucket_dims(n_docs, dim)

    t0 = time.time()
    deduper = EmbeddingDeduper(id="doc_id", vector_field="embedding")
    edges = deduper.dedupe(docs).persist()
    total_pairs = edges.count()
    dt = time.time() - t0
    resolved = deduper._resolved_dims()
    if resolved != expected_dims:
        print(
            f"model resolved dims={resolved}, expected {expected_dims} "
            "-> SIZING BROKEN"
        )
        sys.exit(1)
    found = (
        edges.where(F.col("right_id") - F.col("left_id") == n)
        .where(F.col("left_id") % 20 == 0)
        .count()
    )
    ok = found == n_twins
    print(
        f"[embedding dims={len(resolved)} (auto, {1 << len(resolved):,} "
        f"buckets)] vecs={n_docs:,} planted={n_twins:,} found={found:,} "
        f"total_pairs={total_pairs:,} time={dt:.1f}s -> "
        f"{'OK' if ok else 'RECALL BROKEN'}"
    )
    spark.stop()
    sys.exit(0 if ok else 1)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    cap = int(sys.argv[3]) if len(sys.argv) > 3 else None
    spark = get_spark(app_name="stress_dedup")

    base, twins = _corpus(spark, n, words)
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
    if "--simhash" in sys.argv:
        main_simhash()
    elif "--embedding" in sys.argv:
        main_embedding()
    else:
        main()
