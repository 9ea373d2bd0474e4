"""The plan-audit gate itself (tools/plan_report.py --check)."""

from __future__ import annotations

import importlib.util
import os


def _mod():
    spec = importlib.util.spec_from_file_location(
        "plan_report",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "plan_report.py"
        ),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_gate_passes_on_identical_rows():
    m = _mod()
    base = {"q1": {"pushed": "yes", "flags": "none"}}
    rows = [
        {"name": "q1", "exchanges": 2, "bhj": 0, "smj": 0, "wsc": 1,
         "pushed": "yes", "flags": "none"}
    ]
    assert m.regressions(base, rows) == []


def test_gate_fails_on_planted_red_flag():
    m = _mod()
    base = {"q1": {"pushed": "yes", "flags": "none"}}
    rows = [
        {"name": "q1", "exchanges": 2, "bhj": 0, "smj": 0, "wsc": 1,
         "pushed": "yes", "flags": "CartesianProduct"}
    ]
    out = m.regressions(base, rows)
    assert len(out) == 1 and "red flag" in out[0]


def test_gate_fails_on_lost_pushdown_and_missing_row():
    m = _mod()
    base = {"q1": {"pushed": "yes", "flags": "none"}}
    rows = [
        {"name": "q1", "exchanges": 2, "bhj": 0, "smj": 0, "wsc": 0,
         "pushed": "—", "flags": "none"},
        {"name": "q_new", "exchanges": 1, "bhj": 0, "smj": 0, "wsc": 0,
         "pushed": "yes", "flags": "none"},
    ]
    out = m.regressions(base, rows)
    assert any("pushdown LOST" in p for p in out)
    assert any("not in PLANS.md" in p for p in out)
    # exchange-count drift alone is NOT gated
    rows2 = [
        {"name": "q1", "exchanges": 9, "bhj": 3, "smj": 2, "wsc": 0,
         "pushed": "yes", "flags": "none"}
    ]
    assert m.regressions(base, rows2) == []


def test_parse_plans_md_round_trips_committed_table():
    m = _mod()
    parsed = m.parse_plans_md(
        os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    )
    assert set(m.AUDITED) <= set(parsed)
    assert all(v["flags"] == "none" for v in parsed.values())


def test_gate_fails_on_grown_scan_count():
    """Round 11: the r8 scan-count audit as a standing gate — a grown
    parquet-scan count (lineage re-execution) fails; a shrunk one passes."""
    m = _mod()
    base = {"q1": {"scans": 2, "pushed": "yes", "flags": "none"}}
    grown = [
        {"name": "q1", "scans": 4, "exchanges": 2, "bhj": 0, "smj": 0,
         "wsc": 1, "pushed": "yes", "flags": "none"}
    ]
    out = m.regressions(base, grown)
    assert len(out) == 1 and "scan count grew 2 → 4" in out[0]
    shrunk = [
        {"name": "q1", "scans": 1, "exchanges": 2, "bhj": 0, "smj": 0,
         "wsc": 1, "pushed": "yes", "flags": "none"}
    ]
    assert m.regressions(base, shrunk) == []


def test_parse_plans_md_reads_scan_column(tmp_path):
    m = _mod()
    p = tmp_path / "PLANS.md"
    p.write_text(
        "| query | parquet scans | exchanges | broadcast joins | SMJ |"
        " codegen spans | scan pushdown | red flags |\n"
        "|---|---|---|---|---|---|---|---|\n"
        "| q1 | 3 | 2 | 1 | 0 | 4 | yes | none |\n"
    )
    parsed = m.parse_plans_md(str(p))
    assert parsed == {"q1": {"scans": 3, "pushed": "yes", "flags": "none"}}
