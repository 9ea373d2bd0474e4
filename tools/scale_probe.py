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

Round 10 (VERDICT r9 item 3): the probe is part of the close protocol —
``--round N`` writes ``SCALING_rN.json`` beside ``BENCH_rN.json`` with a
per-query verdict, so a super-linear regression is caught by protocol
instead of by someone happening to run the probe by hand (r9 caught d4b
only that way). Verdict rule: sf_big is 10× rows, so wall may grow up to
the LARGER of 10× and the query's own output growth (pair generators are
contractually quadratic in group size), with 1.5× slack for scheduling
noise; beyond that the query is flagged ``super_linear`` and the probe
exits non-zero.

Usage: python tools/scale_probe.py [sf_small] [sf_big] [query ...]
       python tools/scale_probe.py --round 10   # close-protocol record
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


#: wall may grow to slack × max(data growth, output growth) before flagging
SLACK = 1.5
DATA_RATIO = 10.0  # sf0.1 -> sf1


def _verdict(row: dict) -> str:
    bound = SLACK * max(DATA_RATIO, row["rows_ratio"] or DATA_RATIO)
    if row["wall_ratio"] is not None and row["wall_ratio"] > bound:
        return "super_linear"
    return "ok"


def main(sf_small: str, sf_big: str, names: list[str], record_round: int | None = None) -> int:
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
        row["verdict"] = _verdict(row)
        out[name] = row
        print(
            f"{name}: {t_small:.2f}s -> {t_big:.2f}s "
            f"(x{row['wall_ratio']}) rows {n_small} -> {n_big} "
            f"(x{row['rows_ratio']}) {row['verdict']}",
            flush=True,
        )
    flagged = [n for n, r in out.items() if r["verdict"] != "ok"]
    print("SCALE_PROBE " + json.dumps(out))
    if flagged:
        print("FLAGGED " + ", ".join(flagged))
    if record_round is not None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            f"SCALING_r{record_round:02d}.json",
        )
        with open(path, "w") as fh:
            json.dump(
                {
                    "sf_small": sf_small,
                    "sf_big": sf_big,
                    "slack": SLACK,
                    "queries": out,
                    "flagged": flagged,
                },
                fh,
                indent=1,
            )
        print(f"wrote {path}")
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    rnd = None
    if "--round" in argv:
        i = argv.index("--round")
        rnd = int(argv[i + 1])
        del argv[i : i + 2]
    small = argv[0] if len(argv) > 0 else "/root/testdata/sf0.1"
    big = argv[1] if len(argv) > 1 else "/root/repo/.localdata/sf1"
    names = argv[2:] or QUERIES
    raise SystemExit(main(small, big, names, record_round=rnd))
