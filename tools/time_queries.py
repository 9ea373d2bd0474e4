"""Time specific declared queries via the noop sink — the optimization
iteration loop (guide §1.4): one session, one warm-up, then N timed runs
per query, min/median to stdout.

Usage: python tools/time_queries.py <query> [query ...] [--runs N] [--sf DIR]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1

    import __spark_entry__ as entrymod
    from matchbox_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="time_queries",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entrymod.queries()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in names:
        spark.sparkContext.setJobDescription(f"time:{name}")
        getattr(entrymod, "_FLAGSHIP_CACHE", {}).clear()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(runs):
            getattr(entrymod, "_FLAGSHIP_CACHE", {}).clear()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(time.time() - t0)
        print(
            f"{name}: min={min(ts):.3f} med={statistics.median(ts):.3f} "
            f"runs={[round(t, 3) for t in ts]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
