"""Run every stress harness as one suite with assertion exit codes.

``--quick`` shrinks each harness to a CI-sized tier (the whole suite under
~5 minutes on local[32]; harnesses run up to 4 at a time — separate JVMs,
the box has the cores and memory) and exits 0 iff every harness exits 0.
``--full`` runs the published full sizes sequentially (the numbers quoted
in COVERAGE.md / README).

Usage:
    python tools/stress_all.py --quick
    python tools/stress_all.py --full
    python tools/stress_all.py --quick --only cc,dedup
"""

from __future__ import annotations

import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor

# name → (quick argv, full argv)
HARNESSES: dict[str, tuple[list[str], list[str]]] = {
    "cc": (["200", "50"], []),                       # rings × ring_size
    "cc_hub": (["--hub", "100000"], ["--hub", "10000000"]),  # power-law hub
    "dedup": (["5000", "20"], []),                   # docs, words
    "ann": (["5000", "10"], []),                     # vectors, queries
    "pipeline": (["50000", "10"], []),               # rows, group size
    "curation": (["200000"], []),                    # rows
    "round4": (["50000", "200000"], []),             # docs, events
    "streaming": (["4", "5000"], []),                # batches, rows/batch
    "streaming_resolve": (["6", "100", "10"], []),   # batches, groups, rows
    "clustering": (["20000", "8", "3"], []),         # vectors, k, iters
    "large_k": (["10000", "2048", "16"], ["1000000", "4096", "64"]),  # n, k, dim
    "plan_gate": (["--check"], ["--check"]),         # audit vs PLANS.md
    "serving": (["6", "50", "10"], ["24", "100", "10"]),  # batches, groups, rows
    "bpe": (["20000", "3"], ["100000", "6"]),        # vocab words, merges
    # vocabulary-scale single-run tier (round 11): flat per-merge cost +
    # bounded round storage at large vocab × merge count
    "bpe_direct": (
        ["--direct", "20000", "10"],
        ["--direct", "1000000", "30"],
    ),
    "sketches": (["1000000", "256"], ["10000000", "512"]),  # rows, k
    "probabilistic": (["50000", "10"], ["1000000", "10"]),  # records, block
    "blocking": (["200000", "5"], ["10000000", "5"]),  # rows, SNM window
    # full-registry dtype-strict oracle sweep (round 8: cannot be skipped
    # in a close) — sf0.01 in --quick, both certification SFs in --full
    "oracle_sweep": (
        ["/root/testdata/sf0.01"],
        ["/root/testdata/sf0.01", "/root/testdata/sf0.1"],
    ),
    # LSH-family SHIPPED defaults (bits='auto' / bucket_dims='auto')
    # driven end-to-end through the model surface: exact planted recall +
    # the derivation pinned against auto_*; full simhash tier pins the r9
    # 1M-doc confirmation at the auto-derived width
    "simhash": (["--simhash", "20000", "20"], ["--simhash", "1000000", "30"]),
    "embedding_dedupe": (
        ["--embedding", "20000", "32"],
        ["--embedding", "1000000", "32"],
    ),
    # full tier (round 13): 12 × 300k docs = 3.6M accumulated, the 10×
    # rung over the recorded 12×30k flat ramp
    "streaming_lsh": (["--lsh", "6", "100", "8"], ["--lsh", "12", "30000", "10"]),
    # round 12: deep-lineage J7 tower (16 resolvers full), skewed-leaf J7
    # rung (AQE skew split on the hierarchy join), 100+-batch catalog soak
    "lineage": (["1024", "10"], ["65536", "16"]),
    "skew_j7": (["300000", "30"], ["5000000", "30"]),
    "catalog_soak": (["40", "2000", "10"], ["120", "5000", "10"]),
    "streaming_embedding": (
        ["--embedding", "6", "100", "8"],
        ["--embedding", "12", "300", "10"],
    ),
}

# harnesses that are not tools/stress_<name>.py
SCRIPTS = {
    "bpe_direct": "tools/stress_bpe.py",
    "cc_hub": "tools/stress_cc.py",
    "plan_gate": "tools/plan_report.py",
    "simhash": "tools/stress_dedup.py",
    "embedding_dedupe": "tools/stress_dedup.py",
    "streaming_lsh": "tools/stress_streaming_resolve.py",
    "streaming_embedding": "tools/stress_streaming_resolve.py",
}

# the registry sweep runs every oracle twice per SF (Spark + DuckDB) and
# legitimately takes ~25-30 min per SF on a loaded box
TIMEOUTS = {"oracle_sweep": 7200}


def run_one(name: str, args: list[str]) -> tuple[str, int, float]:
    t0 = time.monotonic()
    proc = subprocess.run(
        [sys.executable, SCRIPTS.get(name, f"tools/stress_{name}.py"), *args],
        capture_output=True,
        text=True,
        timeout=TIMEOUTS.get(name, 1800),
    )
    dt = time.monotonic() - t0
    if proc.returncode != 0:
        tail = "\n".join((proc.stdout + proc.stderr).splitlines()[-15:])
        print(f"--- {name} FAILED (exit {proc.returncode}) ---\n{tail}")
    return name, proc.returncode, dt


def main() -> int:
    quick = "--quick" in sys.argv
    full = "--full" in sys.argv
    if quick == full:
        print(__doc__)
        return 2
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    jobs = {
        n: (q if quick else f)
        for n, (q, f) in HARNESSES.items()
        if only is None or n in only
    }
    results = []
    if quick:
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = [ex.submit(run_one, n, a) for n, a in jobs.items()]
            results = [f.result() for f in futs]
    else:
        results = [run_one(n, a) for n, a in jobs.items()]
    width = max(len(n) for n in jobs)
    bad = 0
    for name, rc, dt in sorted(results, key=lambda r: r[0]):
        status = "PASS" if rc == 0 else f"FAIL({rc})"
        print(f"{name:<{width}}  {status:<8} {dt:6.1f}s")
        bad += rc != 0
    print(f"{len(results) - bad}/{len(results)} harnesses passed")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
