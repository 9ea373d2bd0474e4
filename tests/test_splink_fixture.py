"""Splink settings-dict parity against a frozen score fixture.

The fixture (tests/fixtures/splink_*, built by tools/make_splink_fixture.py)
holds pairwise scores computed by an independent pure-Python implementation
of Splink's documented prediction semantics — no code shared with
``matchbox_spark.operators.probabilistic``. The tests here run
``SplinkCompatLinker`` over the same records and settings and assert the
engine reproduces every frozen score, covering the reference SplinkLinker's
settings-dict semantics (splinklinker.py:56-175) with DATA: level ordering
(first match wins), ``is_null_level`` no-evidence handling, ELSE fallback,
pre-trained m/u pass-through (no EM), and term-frequency adjustment on both
an exact and a fuzzy level (greater-of-two frequencies, fractional weight).
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def fixture():
    with open(os.path.join(FIXDIR, "splink_settings.json")) as f:
        settings = json.load(f)
    return {
        "settings": settings,
        "left": pd.read_parquet(os.path.join(FIXDIR, "splink_left.parquet")),
        "right": pd.read_parquet(os.path.join(FIXDIR, "splink_right.parquet")),
        "scores": pd.read_parquet(os.path.join(FIXDIR, "splink_scores.parquet")),
    }


def test_splink_compat_matches_frozen_scores(spark, fixture):
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    left = spark.createDataFrame(fixture["left"])
    right = spark.createDataFrame(fixture["right"])
    linker = SplinkCompatLinker(
        linker_settings=fixture["settings"], threshold=0.0
    )
    # fully-specified settings must take the pre-trained path (no EM)
    assert linker._fixed_params is not None

    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }
    expected = {
        (int(r.left_id), int(r.right_id)): float(r.score)
        for r in fixture["scores"].itertuples()
    }
    assert set(got) == set(expected), (
        f"pair sets differ: {len(got)} vs {len(expected)}"
    )
    worst = max(abs(got[k] - expected[k]) for k in expected)
    # engine emits float32 scores; parity bound is float32 resolution
    assert worst < 5e-6, f"worst score divergence {worst}"


def test_fixture_exercises_every_semantic_branch(fixture):
    s = fixture["scores"]
    # gamma numbering: level index in settings order, -1 = null level
    assert (s.g0 == 1).any(), "no exact first_name (TF-adjusted) pair"
    assert (s.g0 == 2).any(), "no fuzzy first_name (fractional-TF) pair"
    assert (s.g0 == 3).any(), "no ELSE first_name pair"
    assert (s.g0 == -1).any(), "no null first_name pair"
    assert (s.g1 == -1).any(), "no null dob pair"
    assert (s.g1 == 2).any(), "no same-month dob pair"
    assert (s.g2 == 1).any(), "no TF-adjusted city pair"
    # TF adjustment must actually move scores: two pairs with identical
    # gammas but different city frequencies score differently
    tf_city = s[(s.g0 == 3) & (s.g1 == 3) & (s.g2 == 1)]
    if len(tf_city) >= 2:
        assert tf_city.score.nunique() > 1


@pytest.fixture(scope="module")
def em_fixture():
    with open(os.path.join(FIXDIR, "splink_em_settings.json")) as f:
        settings = json.load(f)
    with open(os.path.join(FIXDIR, "splink_em_params.json")) as f:
        params = json.load(f)
    return {
        "settings": settings,
        "params": params,
        "left": pd.read_parquet(os.path.join(FIXDIR, "splink_left.parquet")),
        "right": pd.read_parquet(os.path.join(FIXDIR, "splink_right.parquet")),
        "scores": pd.read_parquet(
            os.path.join(FIXDIR, "splink_em_scores.parquet")
        ),
    }


def test_splink_em_matches_frozen_fixed_point(spark, em_fixture):
    """EM-TRAINED parity (ref splinklinker.py:177-257): the settings dict
    carries no m/u, so the engine must train; the frozen fixture holds the
    (λ, m, u) fixed point and per-pair scores an independent pure-Python
    EM (tools/make_splink_fixture.py:reference_em) converged to on the
    same gamma-pattern counts. Both implementations follow the documented
    init/stop spec, so they must land on the same fixed point within
    float32 — trained parameters AND TF-adjusted scores."""
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    left = spark.createDataFrame(em_fixture["left"])
    right = spark.createDataFrame(em_fixture["right"])
    linker = SplinkCompatLinker(
        linker_settings=em_fixture["settings"], threshold=0.0
    )
    # stripped settings must NOT take the pre-trained pass-through
    assert linker._fixed_params is None

    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }

    params = em_fixture["params"]
    assert abs(linker.lambda_ - params["lambda"]) < 5e-6
    for mine, frozen in ((linker.m_, params["m"]), (linker.u_, params["u"])):
        for comp_mine, comp_frozen in zip(mine, frozen):
            for a, b in zip(comp_mine, comp_frozen):
                assert abs(a - b) < 5e-6, (mine, frozen)

    expected = {
        (int(r.left_id), int(r.right_id)): float(r.score)
        for r in em_fixture["scores"].itertuples()
    }
    assert set(got) == set(expected)
    worst = max(abs(got[k] - expected[k]) for k in expected)
    assert worst < 5e-6, f"worst trained-score divergence {worst}"


def test_em_fixture_regenerates_identically():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mkfix",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "make_splink_fixture.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    left, right = mod.make_records()
    scores, params = mod.reference_predict_em(left, right)
    frozen = pd.read_parquet(os.path.join(FIXDIR, "splink_em_scores.parquet"))
    pd.testing.assert_frame_equal(
        scores.reset_index(drop=True), frozen.reset_index(drop=True)
    )
    with open(os.path.join(FIXDIR, "splink_em_params.json")) as f:
        assert params == json.load(f)


@pytest.fixture(scope="module")
def exotic_fixture():
    with open(os.path.join(FIXDIR, "splink_exotic_settings.json")) as f:
        settings = json.load(f)
    return {
        "settings": settings,
        "left": pd.read_parquet(
            os.path.join(FIXDIR, "splink_exotic_left.parquet")
        ),
        "right": pd.read_parquet(
            os.path.join(FIXDIR, "splink_exotic_right.parquet")
        ),
        "scores": pd.read_parquet(
            os.path.join(FIXDIR, "splink_exotic_scores.parquet")
        ),
    }


def _exotic_spark_frames(spark, fixture):
    """Arrays come back from parquet as numpy arrays with NaN floats for
    null coordinates — normalise to Python lists / None before
    createDataFrame so the Spark schema is array<string> + double."""
    import math as _math

    def conv(df):
        recs = []
        for r in df.to_dict("records"):
            em = r["emails"]
            if em is not None and not isinstance(em, list):
                em = list(em)
            lat = r["lat"]
            lon = r["lon"]
            if isinstance(lat, float) and _math.isnan(lat):
                lat = None
            if isinstance(lon, float) and _math.isnan(lon):
                lon = None
            recs.append((int(r["id"]), em, lat, lon, r["region"]))
        return spark.createDataFrame(
            recs,
            "id long, emails array<string>, lat double, lon double, region string",
        )

    return conv(fixture["left"]), conv(fixture["right"])


def test_splink_exotic_templates_match_frozen_scores(spark, exotic_fixture):
    """Exotic comparison templates (ref splinklinker.py settings-dict
    surface): ArrayIntersectAtSizes — DuckDB
    ``array_length(list_intersect(...)) >= n``, transpiled to Spark
    ``size(array_intersect(...))`` — and distance_in_km (haversine SQL
    level). Frozen scores come from an independent pure-Python
    implementation (set intersection + math.asin haversine); the engine
    must reproduce every score through Catalyst expression evaluation of
    the transpiled conditions."""
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    left, right = _exotic_spark_frames(spark, exotic_fixture)
    linker = SplinkCompatLinker(
        linker_settings=exotic_fixture["settings"], threshold=0.0
    )
    assert linker._fixed_params is not None  # pre-trained path

    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }
    expected = {
        (int(r.left_id), int(r.right_id)): float(r.score)
        for r in exotic_fixture["scores"].itertuples()
    }
    assert set(got) == set(expected), (
        f"pair sets differ: {len(got)} vs {len(expected)}"
    )
    worst = max(abs(got[k] - expected[k]) for k in expected)
    assert worst < 5e-6, f"worst exotic-score divergence {worst}"


def test_exotic_fixture_exercises_every_branch(exotic_fixture):
    s = exotic_fixture["scores"]
    for col, levels in (("g0", (1, 2, 3, -1)), ("g1", (1, 2, 3, -1))):
        for lvl in levels:
            assert (s[col] == lvl).any(), f"no {col}=={lvl} pair"


def test_exotic_fixture_regenerates_identically():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mkfix",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "make_splink_fixture.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    left, right = mod.make_exotic_records()
    scores = mod.reference_predict_exotic(left, right)
    frozen = pd.read_parquet(
        os.path.join(FIXDIR, "splink_exotic_scores.parquet")
    )
    pd.testing.assert_frame_equal(
        scores.reset_index(drop=True), frozen.reset_index(drop=True)
    )


def test_duckdb_list_functions_transpile():
    """The DuckDB spellings Splink emits land on Spark builtins."""
    from matchbox_spark.operators.probabilistic import splink_sql_to_spark

    out = splink_sql_to_spark(
        'array_length(list_intersect(l."emails", r."emails")) >= 2'
    )
    assert out == "size(array_intersect(l.`emails`, r.`emails`)) >= 2"
    # still rejects similarity funcs with no Spark builtin
    with pytest.raises(ValueError, match="jaro_winkler"):
        splink_sql_to_spark('jaro_winkler_similarity(l."a", r."a") > 0.9')


def test_fixture_regenerates_identically():
    """The generator is deterministic — the committed fixture IS its output
    (guards against silent drift between fixture and generator)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mkfix",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "make_splink_fixture.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    left, right = mod.make_records()
    scores = mod.reference_predict(left, right)
    frozen = pd.read_parquet(os.path.join(FIXDIR, "splink_scores.parquet"))
    pd.testing.assert_frame_equal(
        scores.reset_index(drop=True), frozen.reset_index(drop=True)
    )


def _real(name):
    with open(os.path.join(FIXDIR, name)) as f:
        return json.load(f)


def test_real_dialect_settings_reproduce_frozen_scores(spark, fixture):
    """Round 11 interop pin: the SAME model serialised the way splink
    itself does — ``SettingsCreator.create_settings_dict("duckdb")``
    boilerplate plus comparison conditions over the pairwise frame's
    SUFFIXED columns (``"first_name_l" = "first_name_r"``), the exact
    string the reference's SplinkLinker round-trips
    (splinklinker.py:170-175). Must parse (unknown keys tolerated, suffix
    dialect transpiled) and reproduce every frozen score."""
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    settings = _real("splink_real_settings.json")
    # the file really is in the suffix dialect, not the alias dialect
    conds = [
        lvl["sql_condition"]
        for c in settings["comparisons"]
        for lvl in c["comparison_levels"]
    ]
    assert any('_l"' in c for c in conds) and not any(
        'l."' in c for c in conds
    )
    assert settings["sql_dialect"] == "duckdb"  # boilerplate present

    left = spark.createDataFrame(fixture["left"])
    right = spark.createDataFrame(fixture["right"])
    linker = SplinkCompatLinker(linker_settings=settings, threshold=0.0)
    assert linker._fixed_params is not None  # pre-trained path
    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }
    expected = {
        (int(r.left_id), int(r.right_id)): float(r.score)
        for r in fixture["scores"].itertuples()
    }
    assert set(got) == set(expected)
    worst = max(abs(got[k] - expected[k]) for k in expected)
    assert worst < 5e-6, f"worst real-dialect divergence {worst}"


def test_real_dialect_exotic_settings_reproduce_frozen_scores(
    spark, exotic_fixture
):
    """Suffix dialect through the exotic templates too: DuckDB list
    functions over suffixed array columns
    (``list_intersect("emails_l", "emails_r")``) and the haversine level
    with suffixed lat/lon — parsing + transpile + scoring pinned against
    the same frozen parquet as the alias-dialect file."""
    from matchbox_spark.operators.probabilistic import SplinkCompatLinker

    settings = _real("splink_exotic_real_settings.json")
    left, right = _exotic_spark_frames(spark, exotic_fixture)
    linker = SplinkCompatLinker(linker_settings=settings, threshold=0.0)
    assert linker._fixed_params is not None
    got = {
        (r["left_id"], r["right_id"]): r["score"]
        for r in linker.link(left, right).collect()
    }
    expected = {
        (int(r.left_id), int(r.right_id)): float(r.score)
        for r in exotic_fixture["scores"].itertuples()
    }
    assert set(got) == set(expected)
    worst = max(abs(got[k] - expected[k]) for k in expected)
    assert worst < 5e-6, f"worst exotic real-dialect divergence {worst}"


def test_real_dialect_files_regenerate_identically():
    """to_real_dialect(SETTINGS/EXOTIC_SETTINGS) IS the committed file."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "mkfix",
        os.path.join(
            os.path.dirname(__file__), "..", "tools", "make_splink_fixture.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.to_real_dialect(mod.SETTINGS) == _real(
        "splink_real_settings.json"
    )
    assert mod.to_real_dialect(mod.EXOTIC_SETTINGS) == _real(
        "splink_exotic_real_settings.json"
    )
