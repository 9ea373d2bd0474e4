"""Scale stress for distributed connected components.

Generates a graph with a KNOWN component structure entirely inside Spark
(no driver data): ``n_rings`` rings of ``ring_size`` nodes each (2 edges per
node, diameter ring_size/2 — adversarial for label propagation, fine for
star contraction) plus random chords within rings. Validates the component
count and the min-label invariant, and reports wall time.

Usage: python tools/stress_cc.py [n_rings] [ring_size]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.plans.resolvers import connected_components  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> int:
    n_rings = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    ring_size = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n = n_rings * ring_size

    spark = get_spark(app_name="stress_cc")
    nodes = spark.range(n)
    # ring edges: i -> next node in the same ring (wrapping)
    edges = nodes.select(
        F.col("id").alias("src"),
        (
            (F.col("id") - (F.col("id") % ring_size))
            + ((F.col("id") % ring_size) + 1) % ring_size
        ).alias("dst"),
    )
    # deterministic chords: i -> ring_start + (i*7 % ring_size)
    chords = nodes.select(
        F.col("id").alias("src"),
        (
            (F.col("id") - (F.col("id") % ring_size))
            + (F.col("id") * 7 % ring_size)
        ).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    graph = edges.union(chords)

    t0 = time.time()
    cc = connected_components(graph, strategy="distributed").localCheckpoint(eager=True)
    elapsed = time.time() - t0

    n_components = cc.select("component").distinct().count()
    n_nodes = cc.count()
    # min-label invariant: every component labelled by its minimum node =
    # its ring start (multiple of ring_size)
    bad_labels = cc.where(F.col("component") % ring_size != 0).count()

    ok = n_components == n_rings and n_nodes == n and bad_labels == 0
    print(
        f"nodes={n:,} edges~={2*n:,} components={n_components:,} "
        f"(expected {n_rings:,}) bad_labels={bad_labels} "
        f"time={elapsed:.1f}s -> {'OK' if ok else 'FAIL'}"
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
