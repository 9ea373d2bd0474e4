"""Per-phase wall-time probe of st7_incremental_resolve (guide §1).

Wraps the delta-link loop's phase functions with timers (module attrs are
patched BEFORE incremental_resolve_stream binds them), runs the declared
st7 query once warm, and prints seconds per phase summed over the 4
micro-batches. Not a record — a straggler-finder for the remaining
per-batch cost after the r13 driver twins.

Usage: python tools/probe_st7_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import __spark_entry__ as entrymod
    from matchbox_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="probe_st7_phases",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entrymod.queries()

    phases: dict[str, float] = defaultdict(float)
    calls: dict[str, int] = defaultdict(int)

    def timed(name, fn):
        def wrapper(*a, **k):
            t0 = time.time()
            try:
                return fn(*a, **k)
            finally:
                phases[name] += time.time() - t0
                calls[name] += 1
        return wrapper

    import matchbox_spark.plans.query as qmod
    import matchbox_spark.streaming.incremental as inc
    from matchbox_spark.plans.catalog import Catalog
    from matchbox_spark.plans.resolvers import Components
    from pyspark.sql import DataFrame

    inc._collect_edges_if_small = timed(
        "collect_edges", inc._collect_edges_if_small
    )
    inc._touched_star_edges = timed("star_edges", inc._touched_star_edges)
    inc._index_batch = timed("index_batch", inc._index_batch)
    qmod.query_data = timed("query_data_plan", qmod.query_data)
    Catalog.insert_model_edges_delta = timed(
        "edges_delta", Catalog.insert_model_edges_delta
    )
    Catalog.merge_resolver_clusters_delta = timed(
        "merge_resolver", Catalog.merge_resolver_clusters_delta
    )
    Components.compute_clusters = timed("cc", Components.compute_clusters)
    _orig_ckpt = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = timed("localCheckpoint_all", _orig_ckpt)
    from matchbox_spark.operators.dedupers import NaiveDeduper

    NaiveDeduper.dedupe = timed("model_dedupe_plan", NaiveDeduper.dedupe)

    # warm-up run (untimed)
    t0 = time.time()
    qs["st7_incremental_resolve"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    warm = time.time() - t0
    phases.clear()
    calls.clear()

    t0 = time.time()
    qs["st7_incremental_resolve"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    total = time.time() - t0

    print(f"warm-up run: {warm:.2f}s   timed run: {total:.2f}s")
    acc = 0.0
    for name, sec in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {sec:7.3f}s  x{calls[name]:<3d} {name}")
        if name != "localCheckpoint_all":
            acc += sec
    print(f"  accounted (excl. ckpt-all overlap): {acc:.2f}s of {total:.2f}s")


if __name__ == "__main__":
    main()
