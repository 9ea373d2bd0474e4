"""Pins for the generated correctness-rotation ledger (round 8).

Rounds 2-7 hand-maintained per-round _CHECKED/_TOUCHED sets to order the
driver's ~50-query certification sample; an editing mistake there could
silently starve a query of recertification. The ledger now derives from the
committed CORRECTNESS_r*.json files at import time — these tests prove the
derived map reproduces the retired hand ledgers exactly
(tests/fixtures/hand_ledgers_r7.json), pin the green-row predicate's
strictness, and pin the rotation-order invariants.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _entry():
    mod = sys.modules.get("__spark_entry__")
    if mod is None:
        spec = importlib.util.spec_from_file_location(
            "__spark_entry__", REPO / "__spark_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules["__spark_entry__"] = mod
        spec.loader.exec_module(mod)
    return mod


def test_derived_map_reproduces_hand_ledgers():
    """For every registry query, the JSON-derived last-green round
    restricted to rounds <= 6 equals the retired hand ledgers' bucket
    (max round across _CHECKED_R2.._R6; 0 = never listed)."""
    se = _entry()
    fix = json.loads((REPO / "tests/fixtures/hand_ledgers_r7.json").read_text())
    hand: dict[str, int] = {}
    for rnd in (2, 3, 4, 5, 6):
        for n in fix[f"CHECKED_R{rnd}"]:
            hand[n] = max(hand.get(n, 0), rnd)
    derived = se._last_green_rounds()
    # recompute the <=6 view independently of the module-level cache
    le6: dict[str, int] = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(p.stem.split("_r")[1])
        if rnd > 6:
            continue
        for name, row in json.loads(p.read_text()).items():
            if (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") is True
                and row.get("err") is None
            ):
                le6[name] = max(le6.get(name, 0), rnd)
    for n in se._REGISTRY:
        assert le6.get(n, 0) == hand.get(n, 0), n
        # and the live map is a superset refinement: >= the <=6 view
        assert derived.get(n, 0) >= le6.get(n, 0), n


def test_every_registry_query_has_a_green_row():
    """Zero never-certified: every registry entry is fully green in at
    least one committed driver round (the r7 verdict's invariant — a new
    query is allowed to be absent only until its first driver round)."""
    se = _entry()
    never = [
        n
        for n in se._REGISTRY
        if se._LAST_GREEN.get(n, 0) == 0 and n not in se._TOUCHED_R9
    ]
    # genuinely-new queries added THIS round sit in _TOUCHED_R9 or have no
    # green row yet by construction; everything else must be certified
    new_this_round = [n for n in never if n not in json.loads(
        (REPO / "tests/fixtures/hand_ledgers_r7.json").read_text()
    )["rotated_order_r7"]]
    assert never == new_this_round, (
        f"previously-certified queries lost their green row: "
        f"{sorted(set(never) - set(new_this_round))}"
    )


def test_green_predicate_is_strict(tmp_path):
    """A row missing ANY of the three matches, or carrying an error, never
    counts as green — including the driver's weaker rows-only records
    (hash_match None) and value-equal-but-dtype-red rows."""
    se = _entry()
    rows = {
        "full_green": {"rows_match": True, "schema_match": True,
                       "hash_match": True, "err": None},
        "rows_only": {"rows_match": True, "schema_match": None,
                      "hash_match": None, "err": "no_oracle"},
        "hash_red": {"rows_match": True, "schema_match": True,
                     "hash_match": False, "err": None},
        "crashed": {"rows_match": None, "schema_match": None,
                    "hash_match": None, "err": "boom"},
        "green_with_err": {"rows_match": True, "schema_match": True,
                           "hash_match": True, "err": "late failure"},
    }
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(rows))
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"full_green": rows["hash_red"]})  # later round, not green
    )
    (tmp_path / "CORRECTNESS_r09.json").write_text("{not json")  # ignored
    got = se._last_green_rounds(str(tmp_path))
    assert got == {"full_green": 3}


def test_rotation_order_invariants():
    """Touched-this-round first, then never-green, then ascending last-green
    round; registry insertion order is stable within a tier."""
    se = _entry()
    order = se._rotated()
    assert set(order) == set(se._REGISTRY) and len(order) == len(se._REGISTRY)

    def tier(n):
        if n in se._TOUCHED_R10:
            return 0
        return 1 + se._LAST_GREEN.get(n, 0)

    tiers = [tier(n) for n in order]
    assert tiers == sorted(tiers), "rotation is not sorted by staleness"
    # stability: within each tier, registry insertion order is preserved
    reg_pos = {n: i for i, n in enumerate(se._REGISTRY)}
    for t in set(tiers):
        members = [reg_pos[n] for n in order if tier(n) == t]
        assert members == sorted(members), f"tier {t} reordered"
    # the head of the sample is this round's touched set
    assert set(order[: len(se._TOUCHED_R10)]) == se._TOUCHED_R10
