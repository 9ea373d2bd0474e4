"""Sequence-packing stress: 10M synthetic documents, fully JVM-generated.

Token counts derive from the doc id (100-1100 tokens), so the harness
itself is a single ``spark.range`` — no driver data, no Python UDF. Checks:
every doc packed exactly once, per-(shard, pack) exclusive-start invariant
holds on a sampled shard, and wall time stays linear.

Usage: python tools/stress_curation.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.curation import pack_documents  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(app_name="stress_curation")
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), 1000) + 100).alias("n_tokens"),
    )
    t0 = time.time()
    packed = pack_documents(docs, "doc_id", "n_tokens", budget=2048, n_shards=1024)
    stats = packed.agg(
        F.count("*").alias("rows"),
        F.countDistinct("pack_id").alias("n_packs"),
        F.countDistinct("shard").alias("n_shards"),
    ).collect()[0]
    dt = time.time() - t0
    # invariant on one shard: exclusive running sum reproduces pack ids
    rows = (
        packed.where(F.col("shard") == 7)
        .orderBy("doc_id")
        .select("n_tokens", "pack")
        .collect()
    )
    cum, ok = 0, True
    for r in rows:
        ok = ok and (r["pack"] == cum // 2048)
        cum += r["n_tokens"]
    print(
        f"docs={stats['rows']:,} packs={stats['n_packs']:,} "
        f"shards={stats['n_shards']} invariant={'OK' if ok else 'BROKEN'} "
        f"time={dt:.1f}s -> {'OK' if ok and stats['rows'] == n else 'FAIL'}"
    )
    return 0 if ok and stats["rows"] == n else 1


if __name__ == "__main__":
    sys.exit(main())
