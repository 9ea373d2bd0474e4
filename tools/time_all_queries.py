"""Time EVERY declared query once (warm) at $SPARK_GRAFT_SF_DIR via the noop
sink — the optimization-round coverage sweep (guide §1: measure first).

One session, one warm-up + one timed run per query, JSON line per query to
stdout plus a sorted summary. Not the bench protocol (no fresh-session
medians) — this is a straggler-finder, not a record.

Usage: python tools/time_all_queries.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    import __spark_entry__ as entrymod
    from matchbox_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark(
        app_name="time_all_queries",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name in sorted(qs):
        try:
            getattr(entrymod, "_FLAGSHIP_CACHE", {}).clear()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm-up (plan compile, codegen, page cache)
            getattr(entrymod, "_FLAGSHIP_CACHE", {}).clear()
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — sweep must finish
            timings[name] = -1.0
            print(f"ERR {name}: {exc}", file=sys.stderr)
        print(f"TIMED {name} {timings[name]}", flush=True)
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    print(json.dumps({"sf_dir": sf_dir, "total": round(sum(timings.values()), 2),
                      "queries": dict(ranked)}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(dict(ranked), f, indent=1)


if __name__ == "__main__":
    main()
