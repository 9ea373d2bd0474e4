"""A/B probe of j7's serial floor: can the CC probe ride one job?

The auto-strategy connected_components pays TWO driver-blocking actions on
small graphs: (1) eager checkpoint + count/signature Observation, (2) Arrow
collect of the checkpointed edges. Variant B fuses them: one CollectLimit
job reads up to cap+1 deduped edges; ≤cap → union-find directly (no
checkpoint, no Observation), >cap → fall back to the unchanged
materialise+signature distributed path (paying the distinct shuffle twice —
the reason the fusion must stay behind a small-graph cap).

Runs the flagship pipeline (index → naive dedupe → components resolver →
unified query) N times per variant, interleaved A/B/A/B in ONE process, and
reports per-variant means. Decision rule from the round-4 verdict: adopt if
j7 ≤ 6.5 s same-process, else record that the floor is semantic.

Usage: python tools/probe_j7.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.dedupers import NaiveDeduper  # noqa: E402
from matchbox_spark.plans import resolvers as R  # noqa: E402
from matchbox_spark.plans.catalog import Catalog  # noqa: E402
from matchbox_spark.plans.dag import DAG  # noqa: E402
from matchbox_spark.plans.query import QueryConfig, unified_query  # noqa: E402
from matchbox_spark.plans.resolvers import Components  # noqa: E402
from matchbox_spark.session import get_spark  # noqa: E402
from matchbox_spark.sources.source import SourceConfig  # noqa: E402

_ORIG_CC = R.connected_components


def _fused_cc(edges, max_iter=50, checkpoint_every=1, strategy="auto",
              driver_edge_limit=None):
    """Variant B: fused capped-collect probe for the auto driver path."""
    spark = edges.sparkSession
    plan = (
        edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if strategy == "auto":
        limit = driver_edge_limit or R._driver_cc_edge_limit(spark)
        cap = min(limit, 2_000_000)
        pdf = plan.limit(cap + 1).toPandas()  # ONE job
        if len(pdf) == 0:
            return spark.createDataFrame([], "id long, component long")
        if len(pdf) <= cap:
            import pandas as pd

            mapping = R.connected_components_driver(
                zip(pdf["src"].tolist(), pdf["dst"].tolist())
            )
            lab = pd.DataFrame(mapping.items(), columns=["id", "component"])
            return spark.createDataFrame(
                lab.astype("int64"), "id long, component long"
            )
    return _ORIG_CC(edges, max_iter, checkpoint_every, "distributed",
                    driver_edge_limit)


def run_pipeline(spark, sf):
    t0 = time.monotonic()
    dag = DAG(spark, Catalog(spark))
    src = SourceConfig(
        name="cust",
        location=f"{sf}/customer.parquet",
        key_field="c_custkey",
        index_fields=["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    )
    dag.source(src)
    dag.model(
        "dedupe",
        NaiveDeduper(
            id="id", unique_fields=["cust_c_nationkey", "cust_c_mktsegment"]
        ),
        QueryConfig(sources=[src]),
    )
    dag.resolver("resolve", Components(method="auto"), model_inputs=["dedupe"])
    dag.run()
    ids = unified_query(
        dag.catalog, dag.resolver_lineage("resolve"), ["cust"], level="key"
    ).withColumn("custkey", F.col("key").cast("long"))
    rep = ids.groupBy("id").agg(F.min("custkey").alias("entity_rep"))
    n = ids.join(rep, "id").select("key", "entity_rep").count()
    return time.monotonic() - t0, n


def main(sf: str = "/root/testdata/sf0.1", rounds: int = 3) -> int:
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    run_pipeline(spark, sf)  # warmup (codegen, file listing)

    times = {"A": [], "B": []}
    counts = set()
    for _ in range(rounds):
        for tag, cc in (("A", _ORIG_CC), ("B", _fused_cc)):
            R.connected_components = cc
            # Components resolves the function at call time via the module
            try:
                dt, n = run_pipeline(spark, sf)
            finally:
                R.connected_components = _ORIG_CC
            times[tag].append(dt)
            counts.add(n)
    assert len(counts) == 1, f"variants disagree on rows: {counts}"
    for tag in ("A", "B"):
        xs = times[tag]
        print(f"{tag}: runs={['%.2f' % x for x in xs]} "
              f"mean={sum(xs)/len(xs):.2f}s min={min(xs):.2f}s")
    gain = (sum(times['A']) - sum(times['B'])) / len(times['A'])
    print(f"mean gain B vs A: {gain:+.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    raise SystemExit(main(sf, rounds))
