"""Physical-plan audit: summarise every headline query's executed plan.

Writes PLANS.md with, per query: exchange (shuffle) count, broadcast vs
sort-merge joins, whole-stage-codegen span count, pushed filters / pruned
scan schemas, and any red flags (cartesian products, unpartitioned windows,
row-at-a-time Python evals). The file is the repo's standing answer to
"is this the plan you'd want at 100 TB?" — regenerate after plan-shape
changes: python tools/plan_report.py

GATE MODE (``--check``, wired into ``tools/stress_all.py --quick``):
re-audits the same queries and exits non-zero if any plan REGRESSED vs the
committed PLANS.md — a red flag appeared, or a scan that pushed filters
stopped doing so. Exchange/join counts are reported but not gated (they
legitimately move with plan work); the gate is for the two failure classes
that silently kill a 100 TB run.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

RED_FLAGS = (
    "CartesianProduct",
    "BatchEvalPython",  # row-at-a-time Python UDF
)

AUDITED = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j2_naive_dedupe",
    "j5_weighted_link",
    "ev2_sessionize",
    "t1_token_stats",
    "d3_minhash_lsh",
    "v1_cosine_topk",
    "b1_bm25_search",
    "d7_contamination",
    "c4_line_dedupe",
    "d9_span_dedupe",
    "q25_salted_heavy_hitters",
    "t8_unigram_logprob",
    "c5_chunk_documents",
    "o8_weighted_sample",
    "g5_triangle_count",
    "j12_fuzzy_link",
    "e2_moment_stats",
    "w2_running_revenue",
    "v5_kmeans_embed",
    "d11_semdedup",
    "b2_hybrid_rrf",
    "v6_ivf_pq",
    "g8_k_core",
    "j6_splink_compat",
    "j6b_splink_exotic",
    "j6c_fs_em_unrolled",
    "e3_kmv_distinct",
    "e4_histogram_quantiles",
    "e5_bloom_semijoin",
    "o9_dsir_selection",
    "o10_token_budget_mix",
    "t14_kn_perplexity",
    "q31_zorder_layout",
    "j13_sorted_neighborhood",
    "j13b_multipass_snm",
    "t15_kn_held_out",
    "t16_line_repetition",
    "d4b_simhash_neardups",
    "d4c_simhash_scaled",
]


def audit_rows(spark, qs, sf: str) -> list[dict]:
    rows = []
    for name in AUDITED:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows.append(
            {
                "name": name,
                # one entry per parquet scan NODE in the executed plan: a
                # multiply-referenced derived table whose lineage re-executes
                # shows up as extra scans (the r8 audit class) — gated below
                "scans": plan.count("Scan parquet"),
                "exchanges": plan.count("Exchange"),
                "bhj": plan.count("BroadcastHashJoin"),
                "smj": plan.count("SortMergeJoin"),
                "wsc": len(set(re.findall(r"\*\((\d+)\)", plan))),
                "pushed": "yes"
                if "PushedFilters: ["
                in plan.replace("PushedFilters: []", "")
                else "—",
                "flags": ", ".join(f for f in RED_FLAGS if f in plan)
                or "none",
            }
        )
    return rows


def parse_plans_md(path: str = "PLANS.md") -> dict[str, dict]:
    """Parse the committed audit table → {name: {pushed, flags}}."""
    out: dict[str, dict] = {}
    with open(path) as f:
        for line in f:
            m = re.match(
                r"\|\s*(\w+)\s*\|\s*(\d+)\s*\|\s*\d+\s*\|\s*\d+\s*\|\s*\d+\s*"
                r"\|\s*\d+\s*\|\s*([^|]+?)\s*\|\s*([^|]+?)\s*\|\s*$",
                line,
            )
            if m:
                out[m.group(1)] = {
                    "scans": int(m.group(2)),
                    "pushed": m.group(3),
                    "flags": m.group(4),
                }
    return out


def regressions(
    baseline: dict[str, dict], rows: list[dict]
) -> list[str]:
    """Gate comparison — pure so the tester itself is testable."""
    problems = []
    for r in rows:
        name = r["name"]
        if r["flags"] != "none":
            problems.append(f"{name}: red flag(s) appeared: {r['flags']}")
        old = baseline.get(name)
        if old is None:
            problems.append(
                f"{name}: not in PLANS.md — regenerate (tools/plan_report.py)"
            )
            continue
        if old["pushed"] == "yes" and r["pushed"] != "yes":
            problems.append(f"{name}: scan filter pushdown LOST")
        if "scans" in old and r["scans"] > old["scans"]:
            # round 11: the r8 scan-count audit as a standing gate — a
            # multiply-referenced derived table re-executing its lineage
            # multiplies parquet scans silently; an intentional plan change
            # regenerates PLANS.md
            problems.append(
                f"{name}: parquet scan count grew {old['scans']} → "
                f"{r['scans']} (lineage re-execution?) — if intentional, "
                "regenerate PLANS.md"
            )
    return problems


def main() -> None:
    check = "--check" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--check"]
    sf = args[0] if args else "/root/testdata/sf0.01"

    import __spark_entry__ as entry
    from matchbox_spark.session import get_spark

    spark = get_spark(app_name="plan_report", shuffle_partitions=8)
    qs = entry.queries()
    rows = audit_rows(spark, qs, sf)

    if check:
        problems = regressions(parse_plans_md(), rows)
        if problems:
            for p in problems:
                print(f"PLAN REGRESSION: {p}")
            sys.exit(1)
        print(f"plan gate clean ({len(rows)} plans vs PLANS.md)")
        return

    lines = [
        "# PLANS — physical-plan audit of representative queries",
        "",
        f"Generated by `tools/plan_report.py` over `{sf}` plans "
        "(plan SHAPE is scale-independent; AQE re-plans sizes at runtime).",
        "",
        "| query | parquet scans | exchanges | broadcast joins | SMJ |"
        " codegen spans | scan pushdown | red flags |",
        "|---|---|---|---|---|---|---|---|",
    ]
    flagged = []
    for r in rows:
        if r["flags"] != "none":
            flagged.append(r["name"])
        lines.append(
            f"| {r['name']} | {r['scans']} | {r['exchanges']} | {r['bhj']} |"
            f" {r['smj']} | {r['wsc']} | {r['pushed']} | {r['flags']} |"
        )
    lines += [
        "",
        "Red-flag definitions: `CartesianProduct` (unbounded pair blow-up), "
        "`BatchEvalPython` (row-at-a-time Python UDF in the hot path). "
        "Arrow-batched `mapInPandas` stages (multimodal codecs, streaming "
        "state) are deliberate and not flagged. Codegen spans counted from "
        "`*(n)` markers; AQE-wrapped plans may under-report them until "
        "runtime re-planning. `tools/stress_all.py --quick` runs this audit "
        "as a GATE (`--check`): a new red flag, lost scan pushdown, or a "
        "GROWN parquet-scan count (lineage re-execution — the r8 audit "
        "class) vs this committed table fails the suite.",
        "",
    ]
    out = "\n".join(lines)
    with open("PLANS.md", "w") as f:
        f.write(out)
    print(out)
    if flagged:
        print(f"RED FLAGS in: {flagged}")
        sys.exit(1)
    print("plan audit clean")


if __name__ == "__main__":
    main()
