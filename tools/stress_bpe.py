"""BPE trainer stress: pair counting + greedy rewrite at vocabulary scale.

``bpe_train`` runs per-merge work over the DISTINCT-word table (weighted
by frequency) — the standard trick that makes BPE O(vocab)/merge instead
of O(corpus). This harness proves the plan holds when the vocab itself is
large: a JVM-generated corpus of ``n_words`` distinct words (Zipf-ish
frequencies, 3-12 chars from a 12-letter alphabet so pair counts are
dense), ``n_merges`` merges.

Asserts:
- merges complete with positive, NON-INCREASING pair frequencies (the
  argmax invariant: a later merge can never beat an earlier one, since
  merging only removes or splits existing adjacencies);
- the surviving-symbol total decreases strictly per extra merge;
- per-merge wall time stays flat-ish (last merge ≤ 3× first — each merge
  is the same aggregate + rewrite over the same-sized vocab).

Usage: python tools/stress_bpe.py [n_words] [n_merges]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.tokenize import bpe_train  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402


def main(n_words: int = 100_000, n_merges: int = 6) -> int:
    spark = get_spark(app_name="stress_bpe")
    spark.sparkContext.setLogLevel("ERROR")

    # one synthetic "document" per word, repeated Zipf-ishly via a
    # frequency column folded into text repetition (bpe_train counts word
    # occurrences, so emit each word (1 + id % 7) times space-joined)
    letters = "abcdefghijkl"
    word = F.concat(
        *[
            F.substring(
                F.lit(letters),
                (F.xxhash64("id", F.lit(i)) % 12 + 12) % 12 + 1,
                1,
            )
            for i in range(12)
        ]
    )
    docs = spark.range(n_words).select(
        F.concat_ws(
            " ",
            F.array_repeat(
                F.substring(word, 1, (F.col("id") % 10 + 3).cast("int")),
                (F.col("id") % 7 + 1).cast("int"),
            ),
        ).alias("text")
    )

    t0 = time.monotonic()
    # time per-merge by running cumulative merge counts
    prev_total, times = None, []
    freqs = []
    for m in range(1, n_merges + 1):
        t1 = time.monotonic()
        out = bpe_train(docs, n_merges=m, top_words=n_words).collect()
        times.append(time.monotonic() - t1)
        total = [r["pair_freq"] for r in out if r["it"] == -1][0]
        freqs = [r["pair_freq"] for r in out if r["it"] >= 0]
        if prev_total is not None:
            assert total < prev_total, (m, total, prev_total)
        prev_total = total
    assert all(f > 0 for f in freqs)
    assert all(freqs[i] >= freqs[i + 1] for i in range(len(freqs) - 1)), freqs
    # flatness: merge m costs m aggregates; normalise by merge count
    per_merge = [t / (i + 1) for i, t in enumerate(times)]
    assert per_merge[-1] < 3 * per_merge[0] + 2.0, per_merge
    print(
        f"bpe n_words={n_words}: {n_merges} merges, freqs={freqs}, "
        f"final symbols={prev_total}, per-merge sec="
        f"{' '.join(f'{t:.1f}' for t in per_merge)}, "
        f"total {time.monotonic() - t0:.1f}s"
    )
    print("PASS")
    spark.stop()
    return 0


def _gen_docs(spark, n_words: int):
    """Shared synthetic corpus: n_words distinct words, Zipf-ish repeats."""
    letters = "abcdefghijkl"
    word = F.concat(
        *[
            F.substring(
                F.lit(letters),
                (F.xxhash64("id", F.lit(i)) % 12 + 12) % 12 + 1,
                1,
            )
            for i in range(12)
        ]
    )
    return spark.range(n_words).select(
        F.concat_ws(
            " ",
            F.array_repeat(
                F.substring(word, 1, (F.col("id") % 10 + 3).cast("int")),
                (F.col("id") % 7 + 1).cast("int"),
            ),
        ).alias("text")
    )


def direct(n_words: int = 1_000_000, n_merges: int = 1000) -> int:
    """Vocabulary-scale tier (round 11): ONE bpe_train run at a large
    distinct vocabulary and merge count — per-merge cost must stay flat
    (each merge is the same O(vocab) aggregate + rewrite) and the round
    checkpoints must FREE as merges supersede them (the CC-round storage
    lesson applied to the trainer): live cached RDDs stay ~2 however many
    merges run, where the pre-r11 trainer leaked one per merge."""
    import os as _os

    parts = max(_os.cpu_count() or 8, min(512, n_words // 100_000 * 8))
    spark = get_spark(app_name="stress_bpe_direct", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    docs = _gen_docs(spark, n_words)

    t0 = time.monotonic()
    out = bpe_train(docs, n_merges=n_merges, top_words=n_words).collect()
    wall = time.monotonic() - t0
    freqs = [r["pair_freq"] for r in out if r["it"] >= 0]
    total = [r["pair_freq"] for r in out if r["it"] == -1][0]
    cached = len(spark.sparkContext._jsc.sc().getRDDStorageInfo())

    ok = (
        len(freqs) == n_merges
        and all(f > 0 for f in freqs)
        and all(freqs[i] >= freqs[i + 1] for i in range(len(freqs) - 1))
        and total > 0
        and cached <= 4  # round-freed: not O(n_merges)
    )
    print(
        f"BPE-DIRECT vocab={n_words:,} merges={n_merges} "
        f"first/last freq={freqs[0]:,}/{freqs[-1]:,} symbols={total:,} "
        f"cached_rdds_end={cached} (bound 4) "
        f"wall={wall:.1f}s ({wall * 1e3 / n_merges:.0f} ms/merge, "
        f"{wall * 1e6 / (n_merges * n_words):.3f} us/merge/word) "
        f"-> {'OK' if ok else 'FAIL'}"
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--direct":
        args = [int(a) for a in sys.argv[2:4]]
        sys.exit(direct(*args))
    args = [int(a) for a in sys.argv[1:3]]
    sys.exit(main(*args))
