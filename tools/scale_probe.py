"""One-shot scaling probe: headline queries at two SFs, interleaved.

VERDICT r8 item 3: convert "plans look scale-safe" into measured scaling.
Runs each headline query at sf0.1 then sf1 (derived by tools/make_sf1.py)
back-to-back in ONE session — interleaving per query, so box drift hits
both rungs of each comparison equally — and prints wall, wall-ratio, and
output rows at each rung. Each query runs once untimed at sf0.1 (codegen
warm-up) and once timed per rung; these are magnitude measurements, not
the round record (bench.py owns that).

Interpretation: sf1 = 10× rows. A scan/agg query should ratio ≈ ≤10
(often ≪, scheduling floors amortise). The ER pair generators (j2 naive
dedupe, j5 weighted link) have OUTPUT ~100× by construction (in-group
pairs are quadratic in group size) — their honest scale measure is
wall ÷ output-rows, printed separately.

Usage: python tools/scale_probe.py [sf_small] [sf_big] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
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


def main(sf_small: str, sf_big: str, names: list[str]) -> int:
    import __spark_entry__ as entrymod
    from matchbox_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str, sf: str) -> tuple[float, int]:
        getattr(entrymod, "_FLAGSHIP_CACHE", {}).clear()
        t0 = time.time()
        df = qs[name](spark, sf)
        n = df.count()
        return time.time() - t0, n

    out = {}
    for name in names:
        run(name, sf_small)  # warm-up (codegen, file listing)
        t_small, n_small = run(name, sf_small)
        t_big, n_big = run(name, sf_big)
        row = {
            "small_sec": round(t_small, 2),
            "big_sec": round(t_big, 2),
            "wall_ratio": round(t_big / t_small, 2) if t_small else None,
            "small_rows": n_small,
            "big_rows": n_big,
            "rows_ratio": round(n_big / n_small, 2) if n_small else None,
        }
        out[name] = row
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(x{row['wall_ratio']}) rows {n_small} -> {n_big} "
            f"(x{row['rows_ratio']})",
            flush=True,
        )
    print("SCALE_PROBE " + json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    names = sys.argv[3:] or QUERIES
    raise SystemExit(main(small, big, names))
