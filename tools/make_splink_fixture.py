"""Generate the Splink-parity score fixture (tests/fixtures/splink_*).

Writes a frozen dataset of pairwise match scores computed by an
INDEPENDENT, pure-Python implementation of Splink's documented prediction
semantics — written from Splink's public mathematical documentation
(Fellegi–Sunter match weights, first-match-wins comparison levels,
``is_null_level`` = no evidence, term-frequency adjustment with the
greater of the two value frequencies raised to ``tf_adjustment_weight``)
and sharing NO code with ``matchbox_spark.operators.probabilistic``. The
parity test (tests/test_splink_fixture.py) runs ``SplinkCompatLinker``
over the same records/settings and asserts per-pair score equality, so
the settings-dict semantics of the reference's SplinkLinker
(splinklinker.py:56-175) are pinned by frozen DATA, not by re-deriving
the same formulas inside the test.

Real Splink is not installable in this environment (documented in
README); this fixture is the closest independently-derived stand-in:
two separate implementations of the published semantics agreeing
pairwise on concrete records, frozen so any engine regression breaks
against data it cannot re-derive.

Run: python tools/make_splink_fixture.py   (idempotent, seeded)
"""

from __future__ import annotations

import json
import math
import os
import random

import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")

PRIOR = 0.01

SETTINGS = {
    "link_type": "link_only",
    "probability_two_random_records_match": PRIOR,
    "blocking_rules_to_generate_predictions": [
        'l."surname" = r."surname"',
        'l."dob" = r."dob"',
    ],
    "comparisons": [
        {
            "output_column_name": "first_name",
            "comparison_levels": [
                {
                    "sql_condition": (
                        'l."first_name" IS NULL OR r."first_name" IS NULL'
                    ),
                    "is_null_level": True,
                },
                {
                    "sql_condition": 'l."first_name" = r."first_name"',
                    "m_probability": 0.90,
                    "u_probability": 0.02,
                    "tf_adjustment_column": "first_name",
                    "tf_adjustment_weight": 1.0,
                },
                {
                    "sql_condition": (
                        'levenshtein(l."first_name", r."first_name") <= 2'
                    ),
                    "m_probability": 0.60,
                    "u_probability": 0.10,
                    "tf_adjustment_column": "first_name",
                    "tf_adjustment_weight": 0.5,
                },
                {
                    "sql_condition": "ELSE",
                    "m_probability": 0.05,
                    "u_probability": 0.88,
                },
            ],
        },
        {
            "output_column_name": "dob",
            "comparison_levels": [
                {
                    "sql_condition": 'l."dob" IS NULL OR r."dob" IS NULL',
                    "is_null_level": True,
                },
                {
                    "sql_condition": 'l."dob" = r."dob"',
                    "m_probability": 0.95,
                    "u_probability": 0.01,
                },
                {
                    "sql_condition": (
                        'substr(l."dob", 1, 7) = substr(r."dob", 1, 7)'
                    ),
                    "m_probability": 0.70,
                    "u_probability": 0.05,
                },
                {
                    "sql_condition": "ELSE",
                    "m_probability": 0.02,
                    "u_probability": 0.94,
                },
            ],
        },
        {
            "output_column_name": "city",
            "comparison_levels": [
                {
                    "sql_condition": 'l."city" IS NULL OR r."city" IS NULL',
                    "is_null_level": True,
                },
                {
                    "sql_condition": 'l."city" = r."city"',
                    "m_probability": 0.80,
                    "u_probability": 0.08,
                    "tf_adjustment_column": "city",
                    "tf_adjustment_weight": 0.5,
                },
                {
                    "sql_condition": "ELSE",
                    "m_probability": 0.20,
                    "u_probability": 0.92,
                },
            ],
        },
    ],
}


def make_records() -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = random.Random(42)
    first_names = [
        "john", "jane", "ahmed", "maria", "chen", "fatima", "ivan",
        "sofia", "liam", "noor",
    ]
    surnames = ["smith", "jones", "garcia", "khan", "li", "novak", "okafor"]
    # skewed city distribution: "london" common (TF downweights a match),
    # "slough" rare (TF upweights)
    cities = ["london"] * 6 + ["leeds"] * 2 + ["york", "slough"]

    def dob(rng):
        return (
            f"19{rng.randint(50, 99):02d}-"
            f"{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
        )

    left_rows, right_rows = [], []
    for i in range(40):
        fn = rng.choice(first_names)
        sn = rng.choice(surnames)
        d = dob(rng)
        ct = rng.choice(cities)
        left_rows.append((i + 1, fn, sn, d, ct))
        # ~half the right records are perturbed copies of a left record
        # (same surname or dob keeps them inside a blocking rule)
        if rng.random() < 0.5:
            fn2 = fn
            roll = rng.random()
            if roll < 0.25:
                fn2 = fn[:-1] + "x"  # levenshtein-1 typo
            elif roll < 0.35:
                fn2 = None  # null level
            elif roll < 0.45:
                fn2 = rng.choice(first_names)  # likely ELSE
            d2 = d
            if rng.random() < 0.25:
                d2 = d[:8] + f"{rng.randint(1, 28):02d}"  # same month
            elif rng.random() < 0.1:
                d2 = None
            ct2 = ct if rng.random() < 0.7 else rng.choice(cities)
            right_rows.append((1000 + i, fn2, sn, d2, ct2))
        else:
            right_rows.append(
                (
                    1000 + i,
                    rng.choice(first_names + [None]),
                    rng.choice(surnames),
                    dob(rng) if rng.random() > 0.1 else None,
                    rng.choice(cities + [None]),
                )
            )
    cols = ["id", "first_name", "surname", "dob", "city"]
    return (
        pd.DataFrame(left_rows, columns=cols),
        pd.DataFrame(right_rows, columns=cols),
    )


# ---- independent reference implementation of Splink predict() ----------


def strip_trained(settings: dict) -> dict:
    """The EM-trained fixture's settings: same comparisons with every
    per-level m/u REMOVED, so the engine must train (no pre-trained
    pass-through path)."""
    import copy

    s = copy.deepcopy(settings)
    for comp in s["comparisons"]:
        for lvl in comp["comparison_levels"]:
            lvl.pop("m_probability", None)
            lvl.pop("u_probability", None)
    return s


def _levenshtein(a: str, b: str) -> int:
    if a is None or b is None:
        return 10**9
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _gamma(lrow, rrow):
    """First-match-wins level index per comparison; -1 = null level."""
    out = []
    # first_name: null / exact / lev<=2 / else  (level numbering includes
    # the null level, matching the engine's enumerate-based gamma values)
    lf, rf = lrow["first_name"], rrow["first_name"]
    if lf is None or rf is None:
        out.append(-1)
    elif lf == rf:
        out.append(1)
    elif _levenshtein(lf, rf) <= 2:
        out.append(2)
    else:
        out.append(3)
    ld, rd = lrow["dob"], rrow["dob"]
    if ld is None or rd is None:
        out.append(-1)
    elif ld == rd:
        out.append(1)
    elif ld[:7] == rd[:7]:
        out.append(2)
    else:
        out.append(3)
    lc, rc = lrow["city"], rrow["city"]
    if lc is None or rc is None:
        out.append(-1)
    elif lc == rc:
        out.append(1)
    else:
        out.append(2)
    return tuple(out)


def _block_pairs(lrec, rrec):
    """Blocking: union of rules, SQL null-rejecting equality, pair-dedupe."""
    pairs = {}
    for lr in lrec:
        for rr in rrec:
            if (
                lr["surname"] is not None and lr["surname"] == rr["surname"]
            ) or (lr["dob"] is not None and lr["dob"] == rr["dob"]):
                pairs[(lr["id"], rr["id"])] = (lr, rr)
    return pairs


def _term_freqs(lrec, rrec):
    """Term frequencies over the vertical concat of both inputs (non-null)."""
    tf = {}
    for col in ("first_name", "city"):
        vals = [r[col] for r in lrec + rrec if r[col] is not None]
        total = len(vals) or 1
        freq = {}
        for v in vals:
            freq[v] = freq.get(v, 0) + 1
        tf[col] = {v: n / total for v, n in freq.items()}
    return tf


def reference_predict(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Pure-Python Splink predict: blocking → gamma → FS posterior → TF."""
    lrec = left.where(pd.notnull(left), None).to_dict("records")
    rrec = right.where(pd.notnull(right), None).to_dict("records")
    pairs = _block_pairs(lrec, rrec)
    tf = _term_freqs(lrec, rrec)

    comps = SETTINGS["comparisons"]
    m = [
        [lvl.get("m_probability", 1.0) for lvl in c["comparison_levels"]]
        for c in comps
    ]
    u = [
        [lvl.get("u_probability", 1.0) for lvl in c["comparison_levels"]]
        for c in comps
    ]
    tf_conf = [
        [
            (lvl.get("tf_adjustment_column"), lvl.get("tf_adjustment_weight", 1.0))
            for lvl in c["comparison_levels"]
        ]
        for c in comps
    ]

    rows = []
    for (lid, rid), (lr, rr) in sorted(pairs.items()):
        g = _gamma(lr, rr)
        pm, pu = PRIOR, 1 - PRIOR
        for i, gi in enumerate(g):
            if gi < 0:
                continue
            pm *= m[i][gi]
            pu *= u[i][gi]
        score = pm / (pm + pu)
        # TF adjustment in log-odds space (greater of the two value
        # frequencies; weight w; u_level is the average collision rate)
        p = min(max(score, 1e-15), 1 - 1e-15)
        logodds = math.log(p / (1 - p))
        for i, gi in enumerate(g):
            if gi < 0:
                continue
            tf_col, w = tf_conf[i][gi]
            if not tf_col:
                continue
            tl = tf[tf_col].get(lr[tf_col])
            tr = tf[tf_col].get(rr[tf_col])
            vals = [v for v in (tl, tr) if v is not None]
            if not vals:
                continue
            tf_v = max(vals)
            logodds += w * (math.log(u[i][gi]) - math.log(tf_v))
        adjusted = 1.0 / (1.0 + math.exp(-logodds))
        rows.append((lid, rid, adjusted, *g))
    return pd.DataFrame(
        rows, columns=["left_id", "right_id", "score", "g0", "g1", "g2"]
    )


# ---- independent EM trainer (the trained-path fixture) -----------------
#
# Re-implements, from the documented spec only, the categorical
# Fellegi–Sunter EM the engine trains when the settings dict carries no
# per-level m/u (ref splinklinker.py:177-257 trains the same model through
# real Splink): gamma patterns are the sufficient statistics; null levels
# (gamma = -1) carry no evidence and are excluded from both the E- and
# M-steps; the documented deterministic init is geometric over non-null
# level ranks (m decays 0.3 from the strongest level down, u decays 0.15
# reversed so non-matches concentrate on ELSE); λ starts at 0.1; m/u clamp
# to [1e-6, 1-1e-6]; convergence is total L1 parameter change < 1e-6,
# max 60 iterations. Shares no code with operators/probabilistic.py.

N_LEVELS = [4, 4, 3]
NULL_MASKS = [
    [True, False, False, False],
    [True, False, False, False],
    [True, False, False],
]


def _init_dist(n: int, mask: list[bool], decay: float, reverse: bool):
    ranks = [lvl for lvl in range(n) if not mask[lvl]]
    raw = {}
    for r, lvl in enumerate(ranks):
        exponent = (len(ranks) - 1 - r) if reverse else r
        raw[lvl] = decay**exponent
    z = sum(raw.values())
    return [raw.get(lvl, 1e-6) / z for lvl in range(n)]


def reference_em(
    counts: list[tuple[tuple[int, ...], int]],
    init_lambda: float = 0.1,
    max_iter: int = 60,
    tol: float = 1e-6,
):
    """Categorical EM over gamma-pattern counts → (λ, m, u)."""
    k = len(N_LEVELS)
    lam = init_lambda
    m = [_init_dist(n, msk, 0.3, False) for n, msk in zip(N_LEVELS, NULL_MASKS)]
    u = [_init_dist(n, msk, 0.15, True) for n, msk in zip(N_LEVELS, NULL_MASKS)]
    total = sum(c for _, c in counts)
    for _ in range(max_iter):
        post = []
        for g, c in counts:
            pm, pu = lam, 1.0 - lam
            for i in range(k):
                if g[i] >= 0:
                    pm *= m[i][g[i]]
                    pu *= u[i][g[i]]
            post.append(pm / (pm + pu) if pm + pu > 0 else 0.0)
        new_lam = sum(w * c for w, (_, c) in zip(post, counts)) / total
        new_m, new_u = [], []
        for i in range(k):
            dm = sum(w * c for w, (g, c) in zip(post, counts) if g[i] >= 0)
            du = sum(
                (1 - w) * c for w, (g, c) in zip(post, counts) if g[i] >= 0
            )
            mi, ui = [], []
            for lvl in range(N_LEVELS[i]):
                nm = sum(w * c for w, (g, c) in zip(post, counts) if g[i] == lvl)
                nu = sum(
                    (1 - w) * c for w, (g, c) in zip(post, counts) if g[i] == lvl
                )
                mi.append(min(max(nm / dm if dm else 0.5, 1e-6), 1 - 1e-6))
                ui.append(min(max(nu / du if du else 0.5, 1e-6), 1 - 1e-6))
            new_m.append(mi)
            new_u.append(ui)
        delta = abs(new_lam - lam) + sum(
            abs(a - b)
            for i in range(k)
            for a, b in zip(new_m[i] + new_u[i], m[i] + u[i])
        )
        lam, m, u = new_lam, new_m, new_u
        if delta < tol:
            break
    return lam, m, u


def reference_predict_em(left: pd.DataFrame, right: pd.DataFrame):
    """Trained-path predict: blocking → gamma counts → EM → score + TF.

    Returns (scores DataFrame, params dict). TF adjustment uses the
    TRAINED u for the level's collision rate — same formula as the
    pre-trained path, different parameter source.
    """
    lrec = left.where(pd.notnull(left), None).to_dict("records")
    rrec = right.where(pd.notnull(right), None).to_dict("records")
    pairs = _block_pairs(lrec, rrec)
    tf = _term_freqs(lrec, rrec)

    gam = {key: _gamma(lr, rr) for key, (lr, rr) in pairs.items()}
    count_map: dict[tuple, int] = {}
    for g in gam.values():
        count_map[g] = count_map.get(g, 0) + 1
    counts = sorted(count_map.items())
    lam, m, u = reference_em(counts)

    comps = SETTINGS["comparisons"]
    tf_conf = [
        [
            (lvl.get("tf_adjustment_column"), lvl.get("tf_adjustment_weight", 1.0))
            for lvl in c["comparison_levels"]
        ]
        for c in comps
    ]
    rows = []
    for (lid, rid), (lr, rr) in sorted(pairs.items()):
        g = gam[(lid, rid)]
        pm, pu = lam, 1.0 - lam
        for i, gi in enumerate(g):
            if gi >= 0:
                pm *= m[i][gi]
                pu *= u[i][gi]
        score = pm / (pm + pu)
        p = min(max(score, 1e-15), 1 - 1e-15)
        logodds = math.log(p / (1 - p))
        for i, gi in enumerate(g):
            if gi < 0:
                continue
            tf_col, w = tf_conf[i][gi]
            if not tf_col:
                continue
            tl = tf[tf_col].get(lr[tf_col])
            tr = tf[tf_col].get(rr[tf_col])
            vals = [v for v in (tl, tr) if v is not None]
            if not vals:
                continue
            logodds += w * (math.log(u[i][gi]) - math.log(max(vals)))
        adjusted = 1.0 / (1.0 + math.exp(-logodds))
        rows.append((lid, rid, adjusted, *g))
    scores = pd.DataFrame(
        rows, columns=["left_id", "right_id", "score", "g0", "g1", "g2"]
    )
    return scores, {"lambda": lam, "m": m, "u": u}


# ---- exotic comparison templates: array-intersect + distance-in-km -----
#
# Splink's ArrayIntersectAtSizes template emits DuckDB
# ``array_length(list_intersect(l.col, r.col)) >= n``; the distance_in_km
# template thresholds a great-circle distance. Both are pure SQL over the
# pair — the engine transpiles the list functions to Spark's
# array_intersect/size and passes the trig through — so the parity fixture
# pins the settings-dict surface on its two non-scalar level families.
# Scores use the PRE-TRAINED path (array/geo semantics are orthogonal to
# EM, which the em fixture already covers).

EXOTIC_PRIOR = 0.02

# haversine great-circle distance in km — identical function names in
# DuckDB and Spark SQL, so the level condition runs verbatim in both
_DIST_KM_SQL = (
    '2 * 6371 * asin(sqrt('
    'pow(sin(radians(r."lat" - l."lat") / 2), 2) '
    '+ cos(radians(l."lat")) * cos(radians(r."lat")) '
    '* pow(sin(radians(r."lon" - l."lon") / 2), 2)))'
)

EXOTIC_SETTINGS = {
    "link_type": "link_only",
    "probability_two_random_records_match": EXOTIC_PRIOR,
    "blocking_rules_to_generate_predictions": [
        'l."region" = r."region"',
    ],
    "comparisons": [
        {
            "output_column_name": "emails",
            "comparison_levels": [
                {
                    "sql_condition": (
                        'l."emails" IS NULL OR r."emails" IS NULL'
                    ),
                    "is_null_level": True,
                },
                {
                    "sql_condition": (
                        'array_length(list_intersect(l."emails", r."emails")) >= 2'
                    ),
                    "m_probability": 0.85,
                    "u_probability": 0.005,
                },
                {
                    "sql_condition": (
                        'array_length(list_intersect(l."emails", r."emails")) >= 1'
                    ),
                    "m_probability": 0.60,
                    "u_probability": 0.06,
                },
                {
                    "sql_condition": "ELSE",
                    "m_probability": 0.05,
                    "u_probability": 0.935,
                },
            ],
        },
        {
            "output_column_name": "location",
            "comparison_levels": [
                {
                    "sql_condition": (
                        'l."lat" IS NULL OR r."lat" IS NULL '
                        'OR l."lon" IS NULL OR r."lon" IS NULL'
                    ),
                    "is_null_level": True,
                },
                {
                    "sql_condition": _DIST_KM_SQL + " <= 10",
                    "m_probability": 0.88,
                    "u_probability": 0.04,
                },
                {
                    "sql_condition": _DIST_KM_SQL + " <= 100",
                    "m_probability": 0.70,
                    "u_probability": 0.20,
                },
                {
                    "sql_condition": "ELSE",
                    "m_probability": 0.04,
                    "u_probability": 0.76,
                },
            ],
        },
    ],
}


def make_exotic_records() -> tuple[pd.DataFrame, pd.DataFrame]:
    """40×40 records with an email ARRAY column and lat/lon coordinates.

    ~half the right records are perturbations of a left record inside the
    same blocking region: email lists share 2+/1/0 addresses, coordinates
    jitter within 10 km / 100 km / far, with nulls planted on both
    comparison families.
    """
    rng = random.Random(2026)
    domains = ["a.com", "b.org", "c.net"]
    regions = ["north", "south", "east"]

    def emails(rng, uid):
        return sorted(
            f"u{uid}x{j}@{rng.choice(domains)}"
            for j in range(rng.randint(1, 4))
        )

    left_rows, right_rows = [], []
    for i in range(40):
        uid = i + 1
        em = emails(rng, uid)
        # UK-ish coordinate box; degrees → km is ~111/lat, ~70/lon here
        lat = round(51.0 + rng.random() * 2.0, 6)
        lon = round(-1.0 + rng.random() * 2.0, 6)
        reg = rng.choice(regions)
        left_rows.append((uid, em if rng.random() > 0.08 else None, lat, lon, reg))
        if rng.random() < 0.5:
            # perturbed copy: overlap 2+ / 1 / 0 emails, jitter coords
            roll = rng.random()
            if roll < 0.4 and len(em) >= 2:
                em2 = em[:2] + [f"extra{uid}@{rng.choice(domains)}"]
            elif roll < 0.7:
                em2 = [em[0], f"other{uid}@{rng.choice(domains)}"]
            elif roll < 0.85:
                em2 = [f"new{uid}a@{rng.choice(domains)}", f"new{uid}b@{rng.choice(domains)}"]
            else:
                em2 = None
            jro = rng.random()
            if jro < 0.4:
                # within ~10 km
                lat2 = round(lat + rng.uniform(-0.04, 0.04), 6)
                lon2 = round(lon + rng.uniform(-0.04, 0.04), 6)
            elif jro < 0.7:
                # within ~100 km but beyond 10
                lat2 = round(lat + rng.choice([-1, 1]) * rng.uniform(0.2, 0.6), 6)
                lon2 = round(lon + rng.uniform(-0.3, 0.3), 6)
            elif jro < 0.85:
                lat2 = round(lat + rng.choice([-1, 1]) * rng.uniform(3.0, 5.0), 6)
                lon2 = round(lon + rng.uniform(-0.3, 0.3), 6)
            else:
                lat2, lon2 = None, None
            right_rows.append((1000 + uid, sorted(em2) if em2 else None, lat2, lon2, reg))
        else:
            right_rows.append(
                (
                    1000 + uid,
                    emails(rng, 500 + uid) if rng.random() > 0.08 else None,
                    round(51.0 + rng.random() * 2.0, 6),
                    round(-1.0 + rng.random() * 2.0, 6),
                    rng.choice(regions),
                )
            )
    cols = ["id", "emails", "lat", "lon", "region"]
    return (
        pd.DataFrame(left_rows, columns=cols),
        pd.DataFrame(right_rows, columns=cols),
    )


def _haversine_km(lat1, lon1, lat2, lon2) -> float:
    """Great-circle distance — the same haversine formula the SQL level
    evaluates (R = 6371 km), computed independently in Python math."""
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dphi = math.radians(lat2 - lat1)
    dlam = math.radians(lon2 - lon1)
    a = (
        math.sin(dphi / 2.0) ** 2
        + math.cos(p1) * math.cos(p2) * math.sin(dlam / 2.0) ** 2
    )
    return 2.0 * 6371.0 * math.asin(math.sqrt(a))


def _gamma_exotic(lrow, rrow):
    le, re_ = lrow["emails"], rrow["emails"]
    if le is None or re_ is None:
        g0 = -1
    else:
        n = len(set(le) & set(re_))
        g0 = 1 if n >= 2 else (2 if n >= 1 else 3)
    if (
        lrow["lat"] is None
        or rrow["lat"] is None
        or lrow["lon"] is None
        or rrow["lon"] is None
    ):
        g1 = -1
    else:
        d = _haversine_km(lrow["lat"], lrow["lon"], rrow["lat"], rrow["lon"])
        g1 = 1 if d <= 10 else (2 if d <= 100 else 3)
    return (g0, g1)


def reference_predict_exotic(
    left: pd.DataFrame, right: pd.DataFrame
) -> pd.DataFrame:
    """Pure-Python predict over the exotic settings (pre-trained path)."""
    lrec = left.where(pd.notnull(left), None).to_dict("records")
    rrec = right.where(pd.notnull(right), None).to_dict("records")
    # numpy arrays from parquet round-trips -> plain lists / None
    for rec in lrec + rrec:
        if rec["emails"] is not None and not isinstance(rec["emails"], list):
            rec["emails"] = list(rec["emails"])
        if isinstance(rec["lat"], float) and math.isnan(rec["lat"]):
            rec["lat"] = None
        if isinstance(rec["lon"], float) and math.isnan(rec["lon"]):
            rec["lon"] = None
    pairs = {}
    for lr in lrec:
        for rr in rrec:
            if lr["region"] is not None and lr["region"] == rr["region"]:
                pairs[(lr["id"], rr["id"])] = (lr, rr)

    comps = EXOTIC_SETTINGS["comparisons"]
    m = [
        [lvl.get("m_probability", 1.0) for lvl in c["comparison_levels"]]
        for c in comps
    ]
    u = [
        [lvl.get("u_probability", 1.0) for lvl in c["comparison_levels"]]
        for c in comps
    ]
    rows = []
    for (lid, rid), (lr, rr) in sorted(pairs.items()):
        g = _gamma_exotic(lr, rr)
        pm, pu = EXOTIC_PRIOR, 1 - EXOTIC_PRIOR
        for i, gi in enumerate(g):
            if gi < 0:
                continue
            pm *= m[i][gi]
            pu *= u[i][gi]
        rows.append((lid, rid, pm / (pm + pu), *g))
    return pd.DataFrame(
        rows, columns=["left_id", "right_id", "score", "g0", "g1"]
    )


def to_real_dialect(settings: dict) -> dict:
    """Re-express a settings dict exactly as splink's
    ``SettingsCreator.create_settings_dict("duckdb")`` serialises it — the
    string the reference's SplinkLinker round-trips (splinklinker.py:170-175).

    Two differences from the hand-written fixtures: comparison-level
    conditions use the pairwise frame's SUFFIXED columns (``"name_l" =
    "name_r"``) rather than l./r. aliases (blocking rules keep l./r. —
    that is what ``block_on`` emits), and the dict carries the full
    SettingsCreator boilerplate (retain flags, em_convergence,
    unique_id_column_name, sql_dialect, per-comparison
    ``comparison_description`` / per-level ``label_for_charts``) that a
    real settings file contains and a compat parser must tolerate."""
    import copy
    import re

    out = copy.deepcopy(settings)

    def suffix(cond: str) -> str:
        # l."col" → "col_l" (and r. → _r); operates only on the alias form
        return re.sub(
            r'\b([lr])\."((?:[^"]|"")+)"',
            lambda m: f'"{m.group(2)}_{m.group(1)}"',
            cond,
        )

    for comp in out.get("comparisons", []):
        comp.setdefault(
            "comparison_description",
            f"{comp.get('output_column_name', 'cmp')} comparison",
        )
        for lvl in comp["comparison_levels"]:
            if lvl["sql_condition"].strip().upper() != "ELSE":
                lvl["sql_condition"] = suffix(lvl["sql_condition"])
            lvl.setdefault("label_for_charts", lvl["sql_condition"][:40])
    out.update(
        {
            "sql_dialect": "duckdb",
            "unique_id_column_name": "uid",
            "retain_matching_columns": True,
            "retain_intermediate_calculation_columns": False,
            "max_iterations": 25,
            "em_convergence": 0.0001,
            "additional_columns_to_retain": [],
            "source_dataset_column_name": "source_dataset",
        }
    )
    return out


def main():
    os.makedirs(OUT, exist_ok=True)
    left, right = make_records()
    scores = reference_predict(left, right)
    left.to_parquet(os.path.join(OUT, "splink_left.parquet"), index=False)
    right.to_parquet(os.path.join(OUT, "splink_right.parquet"), index=False)
    scores.to_parquet(os.path.join(OUT, "splink_scores.parquet"), index=False)
    with open(os.path.join(OUT, "splink_settings.json"), "w") as f:
        json.dump(SETTINGS, f, indent=2)
    # coverage summary: the fixture must exercise every semantic branch
    cov = {
        "pairs": len(scores),
        "tf_exact_first_name": int((scores.g0 == 1).sum()),
        "fuzzy_first_name": int((scores.g0 == 2).sum()),
        "else_first_name": int((scores.g0 == 3).sum()),
        "null_first_name": int((scores.g0 == -1).sum()),
        "null_dob": int((scores.g1 == -1).sum()),
        "month_dob": int((scores.g1 == 2).sum()),
        "tf_city": int((scores.g2 == 1).sum()),
    }
    print(json.dumps(cov, indent=2))
    assert all(v > 0 for v in cov.values()), "fixture misses a branch"

    # EM-trained fixture: same records, m/u stripped so the engine trains
    em_scores, em_params = reference_predict_em(left, right)
    em_scores.to_parquet(
        os.path.join(OUT, "splink_em_scores.parquet"), index=False
    )
    with open(os.path.join(OUT, "splink_em_settings.json"), "w") as f:
        json.dump(strip_trained(SETTINGS), f, indent=2)
    with open(os.path.join(OUT, "splink_em_params.json"), "w") as f:
        json.dump(em_params, f, indent=2)
    print(
        json.dumps(
            {
                "em_pairs": len(em_scores),
                "em_lambda": em_params["lambda"],
                "em_score_spread": float(
                    em_scores.score.max() - em_scores.score.min()
                ),
            },
            indent=2,
        )
    )
    # the trained model must actually separate: λ in (0,1) and scores split
    assert 0.0 < em_params["lambda"] < 1.0
    assert (em_scores.score > 0.9).any() and (em_scores.score < 0.1).any()

    # exotic-template fixture: array-intersect sizes + distance-in-km
    eleft, eright = make_exotic_records()
    escores = reference_predict_exotic(eleft, eright)
    eleft.to_parquet(os.path.join(OUT, "splink_exotic_left.parquet"), index=False)
    eright.to_parquet(
        os.path.join(OUT, "splink_exotic_right.parquet"), index=False
    )
    escores.to_parquet(
        os.path.join(OUT, "splink_exotic_scores.parquet"), index=False
    )
    with open(os.path.join(OUT, "splink_exotic_settings.json"), "w") as f:
        json.dump(EXOTIC_SETTINGS, f, indent=2)
    ecov = {
        "exotic_pairs": len(escores),
        "emails_2plus": int((escores.g0 == 1).sum()),
        "emails_1": int((escores.g0 == 2).sum()),
        "emails_else": int((escores.g0 == 3).sum()),
        "emails_null": int((escores.g0 == -1).sum()),
        "dist_10km": int((escores.g1 == 1).sum()),
        "dist_100km": int((escores.g1 == 2).sum()),
        "dist_else": int((escores.g1 == 3).sum()),
        "dist_null": int((escores.g1 == -1).sum()),
    }
    print(json.dumps(ecov, indent=2))
    assert all(v > 0 for v in ecov.values()), "exotic fixture misses a branch"

    # real-dialect twins (round 11): the SAME models serialised the way
    # splink itself does — suffixed comparison conditions + SettingsCreator
    # boilerplate. Scores are identical by construction, so the frozen
    # splink_scores / splink_exotic_scores parquet pins BOTH dialects.
    with open(os.path.join(OUT, "splink_real_settings.json"), "w") as f:
        json.dump(to_real_dialect(SETTINGS), f, indent=2)
    with open(os.path.join(OUT, "splink_exotic_real_settings.json"), "w") as f:
        json.dump(to_real_dialect(EXOTIC_SETTINGS), f, indent=2)
    print("real-dialect settings written")


if __name__ == "__main__":
    main()
