"""sf1 core-scaling rung (VERDICT r13 item 8).

At sf0.1 the headline queries are floor-bound (driver/Arrow + job
overhead), so 8-vs-32-core ratios ≈ 1 can no longer distinguish a real
optimization from a driver shortcut. This rung times named queries at the
derived sf1 (tools/make_sf1.py) under two core counts in FRESH sessions,
so the distributed branches (pair fan-outs, shuffles, budget-overflow
fallbacks) actually execute, and records the low/high-core wall ratio.

Usage: python tools/scale_rung.py [--out SCALING_CORES_r14.json] [query ...]
       (default queries: j7_resolved_entities d2_ngram_jaccard
        st7_incremental_resolve; default data: .localdata/sf1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_QUERIES = [
    "j7_resolved_entities",
    "d2_ngram_jaccard",
    "st7_incremental_resolve",
]


def child(queries, sf_dir, cpus):
    import __spark_entry__ as em
    from matchbox_spark.session import get_spark

    spark = get_spark(
        app_name=f"scale_rung_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = em.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm footers
    out = {}
    for name in queries:
        em._FLAGSHIP_CACHE.clear()
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 2)
    print("RUNG " + json.dumps(out), flush=True)


def main():
    if os.environ.get("_SCALE_RUNG_CHILD"):
        cfg = json.loads(os.environ["_SCALE_RUNG_CHILD"])
        child(cfg["queries"], cfg["sf_dir"], cfg["cpus"])
        return
    args = sys.argv[1:]
    out_path = os.path.join(ROOT, "SCALING_CORES_r14.json")
    if args and args[0] == "--out":
        out_path = args[1]
        args = args[2:]
    queries = args or DEFAULT_QUERIES
    sf_dir = os.environ.get("SCALE_RUNG_SF", os.path.join(ROOT, ".localdata", "sf1"))

    results = {}
    for cpus in (32, 8):
        env = dict(
            os.environ,
            _SCALE_RUNG_CHILD=json.dumps(
                {"queries": queries, "sf_dir": sf_dir, "cpus": cpus}
            ),
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        row = None
        for line in proc.stdout.splitlines():
            if line.startswith("RUNG "):
                row = json.loads(line[5:])
        if proc.returncode != 0 or row is None:
            sys.stderr.write(proc.stdout[-3000:] + proc.stderr[-3000:])
            raise RuntimeError(f"rung child (cpus={cpus}) failed")
        results[str(cpus)] = row
        print(f"cpus={cpus}: {row}")

    record = {
        "sf_dir": sf_dir,
        "queries": {
            q: {
                "sec_32": results["32"][q],
                "sec_8": results["8"][q],
                "ratio_8_over_32": round(
                    results["8"][q] / max(results["32"][q], 1e-9), 2
                ),
            }
            for q in queries
        },
        "protocol": "fresh session per core count, one warmed run per query",
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["queries"], indent=1))


if __name__ == "__main__":
    main()
