"""Full-registry dtype-strict oracle sweep as a stress harness (round 8).

Round 7 ran the 152-query sweep by hand and it caught a real cross-engine
bug class (engine ROUND(double,6) ulp divergence → ieee_round6); wiring it
into ``stress_all`` makes it impossible to skip in a round close. Each
argument is an sf dir; the sweep runs ``tools/check_oracle.py`` (strict
dtype families — a value-equal int64-vs-float64 column still fails, the
class the driver's hash would redden) over EVERY registry entry at every
given SF and exits non-zero if any query fails anywhere.

Usage:
    python tools/stress_oracle_sweep.py /root/testdata/sf0.01
    python tools/stress_oracle_sweep.py /root/testdata/sf0.01 /root/testdata/sf0.1
"""

from __future__ import annotations

import subprocess
import sys
import time


def main(sf_dirs: list[str]) -> int:
    bad = 0
    for sf in sf_dirs:
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "tools/check_oracle.py", sf],
            capture_output=True,
            text=True,
        )
        dt = time.monotonic() - t0
        lines = proc.stdout.splitlines()
        n_ok = sum(1 for ln in lines if ln.startswith("OK "))
        fails = [ln for ln in lines if ln.startswith("FAIL")]
        rows_only = [ln for ln in lines if ln.startswith("ROWS")]
        print(
            f"[sweep {sf}] {n_ok} OK, {len(fails)} FAIL, "
            f"{len(rows_only)} rows-only, exit={proc.returncode} "
            f"[{dt:.0f}s]"
        )
        for ln in fails:
            print("  " + ln)
        if proc.returncode != 0 or fails:
            bad += 1
        if proc.returncode != 0 and not fails:
            # crashed before printing results — surface the tail
            print("\n".join((proc.stdout + proc.stderr).splitlines()[-10:]))
    print("SWEEP OK" if bad == 0 else "SWEEP FAILED")
    return 1 if bad else 0


if __name__ == "__main__":
    dirs = [a for a in sys.argv[1:] if not a.startswith("-")]
    raise SystemExit(main(dirs or ["/root/testdata/sf0.01"]))
