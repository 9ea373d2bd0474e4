"""Streaming-ingest stress: per-batch wall time must stay flat as state grows.

Feeds N equal-sized micro-batches through ``incremental_index_stream`` (one
file per trigger) and reports each batch's duration from the streaming
progress log. The append-only delta insert does O(batch) writes and
read-only anti-joins against accumulated state, so batch k must not cost
O(k) — the old rewrite-per-batch shape would show a linear ramp here.

Usage: python tools/stress_streaming.py [n_batches] [rows_per_batch]
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, ".")

from matchbox_spark.plans.catalog import Catalog  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402
from matchbox_spark.streaming import incremental_index_stream  # noqa: E402


def main(n_batches: int = 16, rows_per_batch: int = 50_000) -> int:
    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="stress_streaming_")
    src, ckpt = f"{work}/in", f"{work}/ckpt"
    try:
        # half the content repeats across batches (exercises the
        # insert-if-absent path), half is new per batch
        for b in range(n_batches):
            spark.range(rows_per_batch).selectExpr(
                f"cast(id + {b} * {rows_per_batch} as string) as key",
                f"concat('doc-', cast(if(id % 2 = 0, id, id + {b} * {rows_per_batch}) as string)) as name",
            ).coalesce(1).write.mode("append").parquet(src)

        catalog = Catalog(spark)
        stream = (
            spark.readStream.schema("key string, name string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = incremental_index_stream(
            stream, catalog, "s", key_field="key", index_fields=["name"],
            checkpoint_dir=ckpt,
        )
        q.awaitTermination(1800)

        durs = [
            p["batchDuration"] / 1000.0
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
        n_clusters = catalog.clusters.count()
        n_keys = catalog.cluster_keys.count()
        print(f"batches={len(durs)} rows/batch={rows_per_batch}")
        print("per-batch sec:", " ".join(f"{d:.1f}" for d in durs))
        head = sum(durs[1:4]) / 3  # skip batch 0 (cold JVM/codegen)
        tail = sum(durs[-3:]) / 3
        ramp = tail / head if head else float("inf")
        print(f"head(avg b1-3)={head:.1f}s tail(avg last3)={tail:.1f}s ramp={ramp:.2f}x")
        print(f"clusters={n_clusters} keys={n_keys}")
        exp_keys = n_batches * rows_per_batch
        assert n_keys == exp_keys, (n_keys, exp_keys)
        # every batch: rows_per_batch/2 repeated contents + /2 new
        exp_clusters = rows_per_batch // 2 + n_batches * (rows_per_batch - rows_per_batch // 2)
        assert n_clusters == exp_clusters, (n_clusters, exp_clusters)
        ok = ramp < 2.0
        print("FLAT OK" if ok else "RAMP DETECTED")
        return 0 if ok else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:3]]
    raise SystemExit(main(*args))
