"""Fellegi–Sunter EM linker + similarity linkers tests."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from matchbox_spark.operators.lsh_linkers import EmbeddingLinker, MinHashLinker
from matchbox_spark.operators.probabilistic import FellegiSunterLinker


@pytest.fixture(scope="module")
def noisy_pair_data(spark):
    """Two sources over 40 entities: matching pairs agree on name ~95% and
    city ~80%; non-matching candidate pairs agree on name ~2%, city ~20%."""
    rng = random.Random(42)
    left_rows, right_rows = [], []
    cities = [f"city{c}" for c in range(5)]
    for e in range(40):
        name = f"entity-{e}"
        city = rng.choice(cities)
        zip_ = f"Z{e % 8}"  # blocking key: 8 blocks of 5 entities
        left_rows.append((e, name, city, zip_))
        r_name = name if rng.random() < 0.95 else f"entity-x{e}"
        r_city = city if rng.random() < 0.8 else rng.choice(cities)
        right_rows.append((1000 + e, r_name, r_city, zip_))
    left = spark.createDataFrame(
        left_rows, "id long, name string, city string, zip string"
    )
    right = spark.createDataFrame(
        right_rows, "id long, name string, city string, zip string"
    )
    return left, right


def test_fellegi_sunter_separates_matches(spark, noisy_pair_data):
    left, right = noisy_pair_data
    linker = FellegiSunterLinker(
        left_id="id",
        right_id="id",
        blocking_rules=["l.zip = r.zip"],
        comparisons=["l.name = r.name", "l.city = r.city"],
        threshold=0.5,
    )
    edges = linker.link(left, right)
    got = {(r["left_id"], r["right_id"]): r["score"] for r in edges.collect()}
    true_pairs = {(e, 1000 + e) for e in range(40)}
    found_true = set(got) & true_pairs
    # at threshold 0.5 EM keeps exactly the both-fields-agree pairs (city
    # agreement is near-universal among matches here, so single-field
    # disagreement is strong counter-evidence — correct FS behaviour)
    assert len(found_true) >= 30
    false_found = set(got) - true_pairs
    assert not false_found, f"false positives: {false_found}"
    assert all(0.5 <= s <= 1.0 for s in got.values())

    # a permissive threshold additionally recovers name-only-agreeing true
    # pairs without admitting any candidates agreeing on nothing
    permissive = FellegiSunterLinker(
        left_id="id",
        right_id="id",
        blocking_rules=["l.zip = r.zip"],
        comparisons=["l.name = r.name", "l.city = r.city"],
        threshold=0.05,
    )
    got2 = {
        (r["left_id"], r["right_id"]) for r in permissive.link(left, right).collect()
    }
    assert len(got2 & true_pairs) > len(found_true)

    # fitted parameters are sane: name agreement much likelier under match
    weights = {w["comparison"]: w for w in linker.match_weights()}
    assert weights["l.name = r.name"]["m"] > weights["l.name = r.name"]["u"]
    assert weights["l.name = r.name"]["match_weight"] > 1.0


def test_fellegi_sunter_requires_blocking(spark, noisy_pair_data):
    left, right = noisy_pair_data
    with pytest.raises(ValueError):
        FellegiSunterLinker(
            left_id="id", right_id="id", comparisons=["l.name = r.name"]
        ).link(left, right)


def test_minhash_linker_cross_source(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "near the warm fire and the birds sing in the tall green trees"
    )
    left = spark.createDataFrame(
        [(1, base), (2, "totally unrelated words about spark shuffles and joins here")],
        "id long, text string",
    )
    right = spark.createDataFrame(
        [(10, base.replace("lazy dog", "lazy hound")), (20, "other different content entirely about databases")],
        "id long, text string",
    )
    edges = MinHashLinker(
        left_id="id", right_id="id", num_perm=32, bands=8, threshold=0.5
    ).link(left, right)
    got = {(r["left_id"], r["right_id"]): r["score"] for r in edges.collect()}
    assert set(got) == {(1, 10)}
    assert 0.5 <= got[(1, 10)] <= 1.0


def test_embedding_linker(spark):
    left = spark.createDataFrame(
        [(1, [1.0, 0.2, 0.5, -0.3]), (2, [-0.9, 0.8, -0.1, 0.4])],
        "id long, embedding array<float>",
    )
    right = spark.createDataFrame(
        [(10, [0.99, 0.21, 0.5, -0.3]), (20, [0.0, -1.0, 0.0, 1.0])],
        "id long, embedding array<float>",
    )
    edges = EmbeddingLinker(
        left_id="id", right_id="id", threshold=0.95, bucket_dims=[0, 1, 2, 3]
    ).link(left, right)
    got = {(r["left_id"], r["right_id"]) for r in edges.collect()}
    assert got == {(1, 10)}


# ---------------------------------------------------------------------------
# Splink settings-dict compatibility
# ---------------------------------------------------------------------------


def _splink_settings():
    """The shape splink's SettingsCreator.create_settings_dict() emits —
    what a migrating user's stored config looks like."""
    return {
        "link_type": "link_only",
        "blocking_rules_to_generate_predictions": [
            'l."postcode" = r."postcode"',
        ],
        "comparisons": [
            {
                "output_column_name": "company_name",
                "comparison_levels": [
                    {
                        "sql_condition": 'l."company_name" IS NULL OR r."company_name" IS NULL',
                        "is_null_level": True,
                    },
                    {"sql_condition": 'l."company_name" = r."company_name"'},
                    {
                        "sql_condition": 'levenshtein(l."company_name", r."company_name") <= 2'
                    },
                    {"sql_condition": "ELSE"},
                ],
            },
            {
                "output_column_name": "city",
                "comparison_levels": [
                    {
                        "sql_condition": 'l."city" IS NULL OR r."city" IS NULL',
                        "is_null_level": True,
                    },
                    {"sql_condition": 'l."city" = r."city"'},
                    {"sql_condition": "ELSE"},
                ],
            },
        ],
    }


def _company_frames(spark):
    """12 entities in 3 postcode blocks: 6 exact name matches, 4 one-edit
    typos, a null name, and an unrelated name — enough mass per comparison
    level for EM to separate the mixture."""
    names = [
        "Acme Ltd", "Bravo Inc", "Cobra Plc", "Delta LLP", "Echo GmbH",
        "Foxtrot SA", "Golf BV", "Hotel AG", "India Co", "Juliet KK",
    ]
    left_rows, right_rows = [], []
    for i, name in enumerate(names):
        block = f"B{i % 3}"
        city = f"City{i}"  # true pairs agree on city; others differ
        left_rows.append((i, name, block, city))
        if i < 6:
            right_rows.append((100 + i, name, block, city))  # exact name
        else:
            right_rows.append((100 + i, name + "x", block, city))  # typo
    left_rows.append((20, None, "B0", "City0"))  # null name level
    right_rows.append((120, "Zzz Totally Other", "B1", "Nowhere"))  # ELSE
    left = spark.createDataFrame(
        left_rows, "uid long, company_name string, postcode string, city string"
    )
    right = spark.createDataFrame(
        right_rows, "uid long, company_name string, postcode string, city string"
    )
    return left, right


def test_splink_compat_linker_accepts_reference_surface(spark):
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    linker = SplinkCompatLinker(
        left_id="uid",
        right_id="uid",
        linker_settings=_splink_settings(),
        linker_training_functions=[
            {
                "function": "estimate_u_using_random_sampling",
                "arguments": {"max_pairs": 1e6},
            }
        ],
        threshold=0.5,
    )
    left, right = _company_frames(spark)
    edges = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }
    # every exact pair and every typo pair survives the threshold
    for i in range(6):
        assert (i, 100 + i) in edges, f"exact pair {i} missing"
    for i in range(6, 10):
        assert (i, 100 + i) in edges, f"typo pair {i} missing"
    # ELSE-level pairs do not
    assert not any(r == 120 for (_, r) in edges)
    # exact level scores at least as high as the levenshtein level
    assert edges[(0, 100)] >= edges[(6, 106)]
    # diagnostics expose per-level m/u like splink's match weights chart
    w = linker.match_weights()
    assert {x["comparison"] for x in w} == {"company_name", "city"}
    assert len(w) == 7  # one row per level (4 + 3)


def test_splink_compat_block_on_lists_and_validation(spark):
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    # block_on("postcode") serialises to a column list — accepted too
    s = _splink_settings()
    s["blocking_rules_to_generate_predictions"] = [["postcode"]]
    linker = SplinkCompatLinker(
        left_id="uid", right_id="uid", linker_settings=s, threshold=0.5
    )
    left, right = _company_frames(spark)
    assert linker.link(left, right).count() >= 3

    with pytest.raises(ValueError, match="link_only"):
        SplinkCompatLinker(
            left_id="uid", right_id="uid",
            linker_settings={**_splink_settings(), "link_type": "dedupe_only"},
        )
    with pytest.raises(ValueError, match="must match"):
        SplinkCompatLinker(
            left_id="a", right_id="b", linker_settings=_splink_settings()
        )
    bad = _splink_settings()
    bad["comparisons"][0]["comparison_levels"][2]["sql_condition"] = (
        'jaro_winkler_similarity(l."company_name", r."company_name") > 0.9'
    )
    with pytest.raises(ValueError, match="jaro_winkler"):
        SplinkCompatLinker(
            left_id="uid", right_id="uid", linker_settings=bad
        )


def _pretrained_settings():
    """A fully-specified (pre-trained) Splink settings dict: explicit
    per-level m/u + match prior, the shape a saved Splink model carries.
    City's exact-match level opts into term-frequency adjustment."""
    s = _splink_settings()
    s["probability_two_random_records_match"] = 0.2
    name_levels = s["comparisons"][0]["comparison_levels"]
    name_levels[1].update({"m_probability": 0.7, "u_probability": 0.01})
    name_levels[2].update({"m_probability": 0.25, "u_probability": 0.04})
    name_levels[3].update({"m_probability": 0.05, "u_probability": 0.95})
    city_levels = s["comparisons"][1]["comparison_levels"]
    city_levels[1].update(
        {
            "m_probability": 0.8,
            "u_probability": 0.1,
            "tf_adjustment_column": "city",
            "tf_adjustment_weight": 1.0,
        }
    )
    city_levels[2].update({"m_probability": 0.2, "u_probability": 0.9})
    return s


def test_splink_pretrained_params_skip_em_and_match_closed_form(spark):
    """A fully-specified settings dict scores with the given parameters (no
    EM), and every pair's score equals the documented Splink formula —
    including the per-value term-frequency adjustment
    (u_level / tf(v))^w on the city exact-match level."""
    import math

    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    linker = SplinkCompatLinker(
        left_id="uid",
        right_id="uid",
        linker_settings=_pretrained_settings(),
        threshold=0.0,
    )
    left, right = _company_frames(spark)
    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }
    # parameters are the dict's, not EM output
    assert linker.lambda_ == 0.2
    assert linker.m_[0][1] == 0.7 and linker.u_[1][1] == 0.1

    # closed-form re-derivation (pure Python, no Spark)
    lrows = [
        (r["uid"], r["company_name"], r["postcode"], r["city"])
        for r in left.collect()
    ]
    rrows = [
        (r["uid"], r["company_name"], r["postcode"], r["city"])
        for r in right.collect()
    ]
    cities = [c for *_, c in lrows + rrows if c is not None]
    tf = {c: cities.count(c) / len(cities) for c in set(cities)}

    def lev(a, b):
        if a is None or b is None:
            return None
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    lam, m, u = 0.2, linker.m_, linker.u_
    expected = {}
    for luid, lname, lpc, lcity in lrows:
        for ruid, rname, rpc, rcity in rrows:
            if lpc != rpc:
                continue
            # gamma: company_name levels (null, exact, lev<=2, ELSE)
            if lname is None or rname is None:
                g0 = -1
            elif lname == rname:
                g0 = 1
            elif lev(lname, rname) <= 2:
                g0 = 2
            else:
                g0 = 3
            g1 = -1 if (lcity is None or rcity is None) else (
                1 if lcity == rcity else 2
            )
            pm, pu = lam, 1 - lam
            for i, g in enumerate((g0, g1)):
                if g < 0:
                    continue
                pm *= m[i][g]
                pu *= u[i][g]
            score = pm / (pm + pu)
            if g1 == 1:  # tf-adjusted level matched
                logodds = math.log(score / (1 - score)) + 1.0 * (
                    math.log(u[1][1]) - math.log(max(tf[lcity], tf[rcity]))
                )
                score = 1 / (1 + math.exp(-logodds))
            expected[(luid, ruid)] = score

    assert set(got) == set(expected)
    for pair, sc in expected.items():
        # edges carry float32 scores — compare at that precision
        assert abs(got[pair] - sc) < 1e-6, (pair, got[pair], sc)

    # the adjustment moves scores: City0 appears 3x (left 0, left 20,
    # right 100 share it) vs City1 2x — the rarer-city exact pair must
    # outscore an otherwise-identical common-city pair
    assert got[(1, 101)] > got[(0, 100)]


def test_tf_adjustment_requires_full_spec_to_skip_em(spark):
    """Missing one u_probability → the dict is not pre-trained → EM runs."""
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    s = _pretrained_settings()
    del s["comparisons"][0]["comparison_levels"][1]["u_probability"]
    linker = SplinkCompatLinker(
        left_id="uid", right_id="uid", linker_settings=s, threshold=0.0
    )
    assert linker._fixed_params is None
    left, right = _company_frames(spark)
    assert linker.link(left, right).count() > 0
    # EM fitted something other than the dict's partial values
    assert linker.lambda_ != 0.2


# -- Fellegi–Sunter ground-truth pinning -------------------------------------
# Real Splink is not installable in this environment; what CAN be pinned is
# the public mathematics both engines implement (Fellegi & Sunter 1969;
# Splink's documented model: P(match|γ) = λ·∏m / (λ·∏m + (1−λ)·∏u), EM over
# gamma-pattern counts). These fixtures hold the model to that maths exactly:
# EM must recover known generating parameters from exact mixture counts, and
# the posterior must equal an independent pure-Python evaluation.


def _fs_expected_counts(lam, m, u, total):
    """Exact expected pattern counts under a known FS model (no sampling)."""
    import itertools

    k = len(m)
    counts = []
    for gamma in itertools.product(*[range(len(mi)) for mi in m]):
        pm, pu = lam, 1 - lam
        for i in range(k):
            pm *= m[i][gamma[i]]
            pu *= u[i][gamma[i]]
        counts.append((gamma, (pm + pu) * total))
    return counts


def test_level_em_recovers_known_fs_parameters():
    from matchbox_spark.operators.probabilistic import (
        SplinkCompatSettings,
        _em_levels,
    )

    true_lam = 0.25
    true_m = [[0.85, 0.10, 0.05], [0.9, 0.1], [0.7, 0.3]]
    true_u = [[0.02, 0.18, 0.80], [0.05, 0.95], [0.1, 0.9]]
    counts = _fs_expected_counts(true_lam, true_m, true_u, total=1_000_000)
    s = SplinkCompatSettings(
        left_id="id", right_id="id", max_iter=1000, tol=1e-13
    )
    lam, m, u = _em_levels(counts, [3, 2, 2], s)
    assert abs(lam - true_lam) < 0.01
    for mi, tmi in zip(m, true_m):
        for a, b in zip(mi, tmi):
            assert abs(a - b) < 0.02
    for ui, tui in zip(u, true_u):
        for a, b in zip(ui, tui):
            assert abs(a - b) < 0.02


def test_splink_compat_posterior_matches_closed_form(spark):
    import math

    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    linker = SplinkCompatLinker(
        left_id="uid",
        right_id="uid",
        linker_settings=_splink_settings(),
        threshold=0.0,
    )
    left, right = _company_frames(spark)
    edges = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }
    lam, m, u = linker.lambda_, linker.m_, linker.u_

    # independently recompute each pair's gamma pattern... the linker's
    # per-level m/u diagnostics give the mapping; here we verify the
    # posterior identity over the FITTED parameters for the exact-match
    # pattern (gamma = level index of the first/strongest level per
    # comparison — first-match-wins on identical rows)
    def posterior(gamma):
        pm, pu = lam, 1 - lam
        for i, g in enumerate(gamma):
            if g < 0:
                continue
            pm *= m[i][g]
            pu *= u[i][g]
        return pm / (pm + pu)

    # rows 0..5 are byte-identical across frames → strongest level of every
    # comparison fires: company_name level 1 (exact; level 0 is the null
    # level) — recover the gamma by inverting the score through all
    # candidate patterns and asserting ONE pattern explains it
    for pair, score in edges.items():
        cands = [
            (g0, g1)
            for g0 in range(-1, len(m[0]))
            for g1 in range(-1, len(m[1]))
        ]
        assert any(
            math.isclose(posterior(g), score, rel_tol=1e-6, abs_tol=1e-6)
            for g in cands
        ), f"score {score} for {pair} not explained by any gamma pattern"

    # match weights are log2(m/u) — the Splink diagnostic identity
    for w in linker.match_weights():
        if 0 < w["u"] < 1 and w["m"] > 0:
            assert math.isclose(
                w["match_weight"], math.log2(w["m"] / w["u"]), rel_tol=1e-12
            )


class TestLiteralSafeTranspile:
    """Round-8 (ADVICE r7): validation scans and rewrites must never touch
    single-quoted string literals."""

    def test_forbidden_name_inside_literal_passes(self):
        from matchbox_spark.operators.probabilistic import splink_sql_to_spark

        out = splink_sql_to_spark("""l."note" = 'call len(x) or jaccard(a)'""")
        assert out == "l.`note` = 'call len(x) or jaccard(a)'"

    def test_rename_inside_literal_is_untouched(self):
        from matchbox_spark.operators.probabilistic import splink_sql_to_spark

        out = splink_sql_to_spark(
            """l."tag" = 'list_intersect(' AND """
            """array_length(list_intersect(l."xs", r."xs")) >= 2"""
        )
        assert out == (
            "l.`tag` = 'list_intersect(' AND "
            "size(array_intersect(l.`xs`, r.`xs`)) >= 2"
        )

    def test_quoted_word_inside_literal_not_backticked(self):
        from matchbox_spark.operators.probabilistic import splink_sql_to_spark

        out = splink_sql_to_spark('''l."a" = 'he said "hi" to len'world''' + "'")
        # escaped '' stays one literal; the inner "hi" is literal text
        assert '`hi`' not in out and out.startswith("l.`a` = ")

    def test_forbidden_name_outside_literal_still_rejected(self):
        import pytest as _pytest

        from matchbox_spark.operators.probabilistic import splink_sql_to_spark

        with _pytest.raises(ValueError, match="len\\(\\)"):
            splink_sql_to_spark("""len(l."name") > 3 AND l."x" = 'ok'""")
        with _pytest.raises(ValueError, match="jaccard"):
            splink_sql_to_spark("""jaccard(l."a", r."a") > 0.5""")
