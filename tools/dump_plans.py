"""Dump `.explain("formatted")` for named declared queries to plans/<round>/.

Usage: python tools/dump_plans.py <suffix> [query ...]

Writes plans/$MBSPARK_PLAN_ROUND/<query>_<suffix>.txt (default r14) for each query (default: the bench
headline set). `suffix` is `before` / `after` per the optimization-round
deliverable: the committed files let a reviewer check plan-shape claims
(Exchange count, join strategy, PushedFilters) without running Spark.

The j7/j7b pipeline queries run their DAG first (the explain is of the
final retrieval plan; the pipeline's insert phases are probed separately
by tools/probe_j7_phases.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j2_naive_dedupe",
    "j5_weighted_link",
    "g1_connected_components",
    "j7_resolved_entities",
    "ev2_sessionize",
    "t1_token_stats",
    "d3_minhash_lsh",
    "v1_cosine_topk",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rnd = os.environ.get("MBSPARK_PLAN_ROUND", "r14")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as entrymod
    from matchbox_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="dump_plans",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
