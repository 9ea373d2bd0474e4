"""KMV distinct-count sketch stress: accuracy + mergeability at 10M rows.

The corpus is generated fully JVM-side (spark.range), with a KNOWN
distinct count per group: value = id % n_distinct, group = id % n_groups,
so every group sees ~n_distinct/gcd distinct values with heavy repetition
— the regime the sketch exists for (shuffling the raw value stream is the
thing being avoided).

Checks, per run:
- every group's estimate lands within 5 standard errors of truth
  (σ ≈ 1/√(k−2)); with identical md5 inputs the draw is deterministic, so
  this is a fixed property of the recipe, not a flaky bound;
- sketch(even ids) ⊎ sketch(odd ids) == sketch(all) ROW-IDENTICAL — the
  merge property that lets per-source/day sketches roll up;
- the executed plan contains WindowGroupLimit (per-task top-k pre-pruning
  before the exchange) and no red-flag nodes.

Usage::

    python tools/stress_sketches.py [n_rows] [k]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from matchbox_spark.operators.sketches import (  # noqa: E402
    kmv_distinct,
    kmv_merge,
    kmv_sketch,
)
from matchbox_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    n_distinct = max(1000, n // 10)
    n_groups = 8
    spark = get_spark(app_name="stress_sketches")

    df = spark.range(n).select(
        (F.col("id") % n_groups).alias("g"),
        (F.col("id") % n_distinct).alias("v"),
    )

    t0 = time.monotonic()
    est = kmv_distinct(df, ["g"], "v", k=k).collect()
    dt = time.monotonic() - t0
    # group g sees values {g, g+8, ...} ∩ [0, n_distinct): n_distinct/8 each
    # (n_groups divides n_distinct by construction here)
    assert n_distinct % n_groups == 0
    truth = n_distinct // n_groups
    sigma = (k - 2) ** -0.5
    worst = 0.0
    for r in est:
        rel = abs(r["est_distinct"] - truth) / truth
        worst = max(worst, rel)
        assert rel < 5 * sigma, (
            f"group {r['g']}: est {r['est_distinct']} vs truth {truth} "
            f"({rel:.1%} > 5σ = {5 * sigma:.1%})"
        )
    print(
        f"estimate: {n:,} rows, {truth:,} distinct/group, k={k}: "
        f"worst rel err {worst:.2%} (5σ bound {5 * sigma:.1%}) in {dt:.1f}s"
    )

    t0 = time.monotonic()
    even = df.where(F.col("v") % 2 == 0)
    odd = df.where(F.col("v") % 2 == 1)
    merged = kmv_merge(
        [kmv_sketch(even, ["g"], "v", k=k), kmv_sketch(odd, ["g"], "v", k=k)],
        ["g"],
        k=k,
    )
    direct = kmv_sketch(df, ["g"], "v", k=k)
    m = sorted(map(tuple, merged.collect()))
    d = sorted(map(tuple, direct.collect()))
    assert m == d, "merged sketch differs from direct sketch"
    print(
        f"merge: sketch(even) ⊎ sketch(odd) == sketch(all), "
        f"{len(d)} rows identical in {time.monotonic() - t0:.1f}s"
    )

    plan = (
        kmv_sketch(df, ["g"], "v", k=k)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # WindowGroupLimit only fires for k <= spark.sql.window.group.limit
    # .threshold (default 1000) — measured here; documented in sketches.py
    if k <= 1000:
        assert "WindowGroupLimit" in plan, "top-k pre-pruning missing"
        print("plan: WindowGroupLimit present, no red flags")
    else:
        assert "WindowGroupLimit" not in plan  # the documented cliff
        print(f"plan: k={k} > 1000 threshold, WindowGroupLimit absent as documented")
    for flag in ("CartesianProduct", "BatchEvalPython"):
        assert flag not in plan, f"red flag {flag} in sketch plan"

    # histogram sketch: one-pass quantiles on a known distribution — the
    # value column is uniform on [0, n_distinct), so pⁿ truth is q·n_distinct
    # and the interpolated estimate must land within one bin width
    from matchbox_spark.operators.sketches import (  # noqa: E402
        histogram_quantiles,
        histogram_sketch,
    )

    t0 = time.monotonic()
    n_bins = 1000
    hs = histogram_sketch(
        df, "v", 0.0, float(n_distinct), n_bins, ["g"]
    )
    qs = histogram_quantiles(
        hs, [0.5, 0.9, 0.99], 0.0, float(n_distinct), n_bins, ["g"]
    ).collect()
    width = n_distinct / n_bins
    assert len(qs) == 3 * n_groups
    for r in qs:
        truth = r["q"] * n_distinct
        assert abs(r["est"] - truth) <= width + 1e-6, (
            f"g={r[0]} q={r['q']}: est {r['est']} vs truth {truth} "
            f"(bound {width})"
        )
    print(
        f"histogram: {n:,} rows, {n_bins} bins, p50/p90/p99 within one "
        f"bin width ({width:g}) in {time.monotonic() - t0:.1f}s"
    )

    # Bloom: filter built over the EVEN value ids, probed by the full
    # stream — no even value may fail (no false negatives), and the odd
    # pass rate is the false-positive rate, bounded analytically
    from matchbox_spark.operators.sketches import (  # noqa: E402
        bloom_build,
        bloom_contains,
    )

    t0 = time.monotonic()
    m_bits, k_h = 4 * n_distinct, 3
    evens = df.where(F.col("v") % 2 == 0).select("v").distinct()
    bloom = bloom_build(evens, "v", m_bits=m_bits, k_hashes=k_h).localCheckpoint(
        eager=True
    )
    probe = df.select("v").distinct()
    tagged = bloom_contains(probe, bloom, "v", m_bits=m_bits, k_hashes=k_h)
    miss = tagged.where((F.col("v") % 2 == 0) & ~F.col("bloom_pass")).count()
    assert miss == 0, f"{miss} false negatives"
    n_odd = probe.where(F.col("v") % 2 == 1).count()
    fp = tagged.where((F.col("v") % 2 == 1) & F.col("bloom_pass")).count()
    # load n/2 keys into 4n bits, k=3 → fp ≈ (1−e^{−3/8})³ ≈ 3.1%; allow 2×
    assert fp / max(1, n_odd) < 0.062, fp
    print(
        f"bloom: {n_distinct:,} distinct probed vs {m_bits:,}-bit filter: "
        f"0 false negatives, fp {fp / max(1, n_odd):.2%} in "
        f"{time.monotonic() - t0:.1f}s"
    )

    # CMS: per-value frequency is n/n_distinct exactly (by construction);
    # the estimate must never undercount and overcount within the e/width
    # mass bound
    from matchbox_spark.operators.sketches import (  # noqa: E402
        cms_build,
        cms_estimate,
    )

    t0 = time.monotonic()
    cw, cd = 8192, 4
    cms = cms_build(df, "v", width=cw, depth=cd).localCheckpoint(eager=True)
    true_f = n // n_distinct
    sample = probe.where(F.col("v") % 997 == 0)
    ests = cms_estimate(sample, cms, "v", width=cw, depth=cd).collect()
    bound = int(2.72 * n / cw) * 2
    for r in ests:
        assert true_f <= r["est_count"] <= true_f + bound, (
            r["v"],
            r["est_count"],
        )
    print(
        f"cms: {len(ests)} probes at true freq {true_f}: one-sided, "
        f"overcount ≤ {bound} in {time.monotonic() - t0:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
