"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}. Each query materialises via the
noop sink (full execution, no driver collect cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    import __spark_entry__ as entrymod
    from matchbox_spark.session import get_spark

    spark = get_spark(
        app_name="matchbox_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entrymod.queries()

    # warm the JVM + parquet footers outside timing
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def run(name: str) -> float:
        # the flagship's DAG cache is cleared per run so j7 always measures
        # the FULL pipeline (index → dedupe → resolve → query), never a
        # cached catalog
        getattr(entrymod, "_FLAGSHIP_CACHE", {}).clear()
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # one UNTIMED warm-up (plan compilation, codegen, page cache) then
    # best-of-3: single-machine timings swing ±20-50% on scheduler noise
    # (the r5 j7 delta); the minimum of three warm runs is the honest
    # capability number and keeps the driver-recorded total within ~1 s of
    # a same-session close run.
    timings: dict[str, float] = {}
    for name in HEADLINE:
        run(name)
        timings[name] = round(min(run(name) for _ in range(3)), 3)

    try:
        load1, load5, _ = os.getloadavg()
        with open("/proc/uptime") as f:
            uptime = float(f.read().split()[0])
        session = {
            "load1": round(load1, 2),
            "load5": round(load5, 2),
            "uptime_s": round(uptime),
            "cpus": int(cpus),
        }
    except OSError:
        session = {"cpus": int(cpus)}

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "session": session,
            }
        )
    )


if __name__ == "__main__":
    main()
