"""Adapter-style tests over the build-once scenario system.

Mirrors the reference's snapshot-cached backend scenarios
(scenarios.py:41-910): each named state builds once per session; every test
here queries the prebuilt catalog instead of reconstructing a pipeline.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.plans.query import query_data, unified_query
from matchbox_spark.plans.query import QueryConfig
from matchbox_spark.scenarios import SCENARIOS, scenario


def test_bare_declares_but_does_not_sync(spark):
    s = scenario(spark, "bare")
    assert set(s.sources) == {"crn", "cdms"}
    assert s.catalog.clusters.count() == 0
    assert s.catalog.steps == {}


def test_index_creates_content_clusters(spark):
    s = scenario(spark, "index")
    assert s.catalog.clusters.count() > 0
    # every key of every DECLARED source landed in cluster_keys (the kit
    # also generates 'dh', which this scenario does not declare)
    n_keys = sum(
        len(s.kit.sources[name].key_to_entity) for name in s.sources
    )
    assert s.catalog.cluster_keys.count() == n_keys
    assert set(s.catalog.steps) == {"crn", "cdms"}


def test_scenario_cache_returns_same_build(spark):
    a = scenario(spark, "index")
    b = scenario(spark, "index")
    assert a is b


def test_dedupe_resolves_crn_entities(spark):
    s = scenario(spark, "dedupe")
    ids = unified_query(
        s.catalog, s.dag.resolver_lineage(s.resolver), ["crn"], level="key"
    )
    clusters: dict[int, set[str]] = {}
    for r in ids.collect():
        clusters.setdefault(r["id"], set()).add(r["key"])
    expected = set(
        frozenset(v) for v in s.kit.sources["crn"].expected_entity_keys().values()
    )
    assert {frozenset(v) for v in clusters.values()} == expected


def test_link_spans_sources(spark):
    s = scenario(spark, "link")
    proj = unified_query(
        s.catalog,
        s.dag.resolver_lineage(s.resolver),
        ["crn", "cdms"],
        level="key",
    )
    by_id: dict[int, set[str]] = {}
    for r in proj.collect():
        by_id.setdefault(r["id"], set()).add(f"{r['source']}:{r['key']}")
    spanning = [m for m in by_id.values()
                if any(k.startswith("crn:") for k in m)
                and any(k.startswith("cdms:") for k in m)]
    assert len(spanning) == len(s.kit.true_entities)


# -- convergent: the reference's content-hash-collision scenario -------------


def test_convergent_sources_share_clusters(spark):
    s = scenario(spark, "convergent")
    # identical generation → identical content hashes → indexing foo_b added
    # ZERO new clusters beyond foo_a's (only new keys)
    keys = s.catalog.cluster_keys
    a_clusters = {
        r["cluster_id"]
        for r in keys.where(F.col("source") == "foo_a").collect()
    }
    b_clusters = {
        r["cluster_id"]
        for r in keys.where(F.col("source") == "foo_b").collect()
    }
    assert a_clusters == b_clusters


def test_convergent_repetition_collapses_to_one_cluster_per_content(spark):
    s = scenario(spark, "convergent")
    # repetition=1 → every row generated twice under fresh keys; content
    # addressing must map both keys to ONE cluster
    per_cluster = (
        s.catalog.cluster_keys.where(F.col("source") == "foo_a")
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert all(r["n"] >= 2 for r in per_cluster)


def test_convergent_resolvers_agree(spark):
    s = scenario(spark, "convergent")
    # both sources' dedupe resolvers must recover the same entity partition
    # (by ground-truth entity ids) — the convergence property
    partitions = {}
    for sname in ("foo_a", "foo_b"):
        ids = unified_query(
            s.catalog,
            s.dag.resolver_lineage(f"resolver_naive_{sname}"),
            [sname],
            level="key",
        )
        k2e = s.kit.sources[sname].key_to_entity
        part = {}
        for r in ids.collect():
            part.setdefault(r["id"], set()).add(k2e[r["key"]])
        partitions[sname] = {frozenset(v) for v in part.values()}
    assert partitions["foo_a"] == partitions["foo_b"]


def test_convergent_query_through_model_config(spark):
    s = scenario(spark, "convergent")
    df = query_data(
        spark,
        s.catalog,
        QueryConfig(
            sources=[s.sources["foo_a"]],
            resolvers=s.dag.resolver_lineage("resolver_naive_foo_a"),
        ),
    )
    # dedupe on company_name: ids collapse to one per (entity, variation)
    assert df.select("id").distinct().count() < df.count()


def test_mega_scales_and_links(spark):
    s = scenario(spark, "mega", n_true_entities=8)  # → 32 entities
    assert len(s.kit.true_entities) == 32
    proj = unified_query(
        s.catalog, s.dag.resolver_lineage(s.resolver), ["crn", "cdms"],
        level="key",
    )
    assert proj.select("id").distinct().count() == 32


@pytest.mark.parametrize("name", SCENARIOS)
def test_all_scenarios_build(spark, name):
    s = scenario(spark, name)
    assert s.name == name


def test_scored_dedupe_recovers_truth_with_varying_scores(spark):
    """Reference 'scored_dedupe': per-source scored models whose edges all
    clear the 0.5 resolver threshold — clusters equal the entity groups —
    while scores genuinely vary inside (0.5, 0.99)."""
    sc = scenario(spark, "scored_dedupe", n_true_entities=6)
    edges = sc.catalog.model_edges.where(F.col("step") == "scored_crn")
    scores = [float(r["score"]) for r in edges.collect()]
    assert scores and all(0.5 <= s <= 0.99 for s in scores)
    assert len(set(scores)) > 1, "expected varying scores"
    ids = unified_query(
        sc.catalog, sc.dag.resolver_lineage("resolver_scored_crn"),
        ["crn"], level="key",
    )
    produced: dict[int, set[str]] = {}
    for r in ids.collect():
        produced.setdefault(r["id"], set()).add(r["key"])
    from matchbox_spark.factories import diff_entities

    expected = sc.kit.sources["crn"].expected_entity_keys()
    identical, report = diff_entities(expected.values(), produced.values())
    assert identical, report


def test_alt_dedupe_rival_models_agree_on_clusters(spark):
    """Reference 'alt_dedupe': two rival scored models over one source —
    different edge scores (different seeds), identical resolved clusters."""
    sc = scenario(spark, "alt_dedupe", n_true_entities=6)
    e0 = {
        (r["left_id"], r["right_id"]): round(float(r["score"]), 6)
        for r in sc.catalog.model_edges.where(
            F.col("step") == "alt_dedupe_0"
        ).collect()
    }
    e1 = {
        (r["left_id"], r["right_id"]): round(float(r["score"]), 6)
        for r in sc.catalog.model_edges.where(
            F.col("step") == "alt_dedupe_1"
        ).collect()
    }
    assert set(e0) == set(e1), "rival models must see the same pair set"
    assert e0 != e1, "rival models must score differently"

    def clusters(resolver):
        ids = unified_query(
            sc.catalog, sc.dag.resolver_lineage(resolver), ["foo_a"],
            level="key",
        )
        out: dict[int, frozenset] = {}
        grouped: dict[int, set] = {}
        for r in ids.collect():
            grouped.setdefault(r["id"], set()).add(r["key"])
        return {frozenset(v) for v in grouped.values()}

    assert clusters("resolver_alt_0") == clusters("resolver_alt_1")


def test_convergent_partial_completes_on_run(spark):
    """Reference 'convergent_partial': sources indexed, models/resolvers
    declared with no results; a later dag.run() completes exactly the
    pending steps."""
    sc = scenario(spark, "convergent_partial", n_true_entities=6)
    cat = sc.catalog
    assert "foo_a" in cat.steps and "foo_b" in cat.steps
    assert "naive_foo_a" not in cat.steps, "model must be pending"
    assert cat.model_edges.where(F.col("step") == "naive_foo_a").isEmpty()
    # second run completes the pending models + resolvers idempotently:
    # the already-synced sources re-gate (no new clusters/keys)
    n_keys = cat.cluster_keys.count()
    sc.dag.run()
    assert "naive_foo_a" in cat.steps and "resolver_naive_foo_a" in cat.steps
    assert cat.cluster_keys.count() == n_keys  # source re-sync gated
    ids = unified_query(
        cat, sc.dag.resolver_lineage("resolver_naive_foo_a"), ["foo_a"],
        level="key",
    )
    assert ids.count() == len(sc.kit.sources["foo_a"].key_to_entity)
