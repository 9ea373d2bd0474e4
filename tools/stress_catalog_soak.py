"""Long-run catalog soak (VERDICT r11 #8): 100+ micro-batch appends.

The LSM binary-counter tiering was proven flat to 24 micro-batches by the
serving harness; this harness extends the curve to 100+ and pins the
three properties a long-lived incremental deployment needs:

1. **flat `_append` cost** — per-batch insert wall stays flat (tail
   median < 3x head median + slack): the binary-counter carry rewrites a
   run of size s only O(log s) times, so no batch pays O(total state);
2. **bounded plan width** — the per-table delta ledger (`_parts`) stays
   ≤ log2(batches) + compacted base, never one-frame-per-batch;
3. **bounded snapshot generations** — periodic `save()` keeps at most
   two snapshot directories on disk (live + one predecessor for
   concurrent readers), whatever the batch count;
4. exact final state — accumulated row counts match the arithmetic.

Usage: python tools/stress_catalog_soak.py [n_batches] [rows_per_batch] [save_every]
  quick: 40 2000 10   full: 120 5000 10
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.plans.catalog import Catalog  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    save_every = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app_name="stress_catalog_soak", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    path = tempfile.mkdtemp(prefix="mbspark_soak_") + "/cat"
    cat = Catalog(spark, path=path)

    batch_ms: list[float] = []
    widths: list[int] = []
    max_snap_dirs = 0
    for b in range(n_batches):
        # a fresh index delta: unique hashes per batch, 2 keys per hash
        delta = (
            spark.range(rows // 2)
            .select((F.col("id") + b * rows).alias("v"))
            .select(
                F.sha2(F.col("v").cast("string"), 256)
                .cast("binary")
                .alias("hash"),
                F.array(
                    F.concat(F.lit("k"), F.col("v")),
                    F.concat(F.lit("k"), F.col("v") + 500_000_000),
                ).alias("keys"),
            )
        )
        t0 = time.monotonic()
        cat.insert_source_index_delta("s", delta)
        batch_ms.append((time.monotonic() - t0) * 1000)
        widths.append(max(len(p) for p in cat._parts.values()))
        if (b + 1) % save_every == 0:
            cat.save()
            snaps = os.listdir(os.path.join(path, "snapshots"))
            max_snap_dirs = max(max_snap_dirs, len(snaps))

    k = 8
    head = statistics.median(batch_ms[1 : 1 + k])
    tail = statistics.median(batch_ms[-k:])
    print("per-batch ms:", " ".join(f"{d:.0f}" for d in batch_ms))
    print(f"head median {head:.0f} ms, tail median {tail:.0f} ms")
    print(f"max ledger width {max(widths)}, max snapshot dirs {max_snap_dirs}")

    # 1. flat append cost
    assert tail < 3 * head + 200, (head, tail)
    # 2. bounded plan width: log2(batches) + base + headroom
    import math

    bound = int(math.log2(n_batches)) + 6
    assert max(widths) <= bound, (max(widths), bound)
    # 3. bounded snapshot generations on disk
    assert max_snap_dirs <= 2, max_snap_dirs
    # 4. exact final state
    n_clusters = cat.clusters.count()
    n_keys = cat.cluster_keys.count()
    assert n_clusters == n_batches * (rows // 2), n_clusters
    assert n_keys == n_batches * (rows // 2) * 2, n_keys
    print(f"final: {n_clusters} clusters, {n_keys} keys")

    # reload from the last snapshot and re-verify (restore path)
    if n_batches % save_every == 0:
        cat2 = Catalog(spark, path=path)
        assert cat2.clusters.count() == n_clusters
        print("reload exact")

    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
