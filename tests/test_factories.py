"""Factory-driven methodology tests (reference §5 strategy: parametrised
dedupers/linkers over seeded testkits, asserting exact cluster/edge sets)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.factories import (
    diff_clusters,
    linked_sources_factory,
    source_factory,
    make_true_entities,
    SuffixRule,
)
from matchbox_spark.operators.dedupers import NaiveDeduper
from matchbox_spark.operators.linkers import DeterministicLinker
from matchbox_spark.plans.resolvers import Components


@pytest.fixture(scope="module")
def kit(spark):
    return linked_sources_factory(spark, n_true_entities=8, seed=42)


def test_factory_shapes(kit):
    crn, dh, cdms = kit.sources["crn"], kit.sources["dh"], kit.sources["cdms"]
    assert crn.data.count() == 8 * 4  # base + 3 suffix variations
    assert dh.data.count() == 4  # half universe, no variations
    assert cdms.data.count() == 8 * 2  # repetition=1


def test_factory_determinism(spark):
    a = linked_sources_factory(spark, n_true_entities=5, seed=7)
    b = linked_sources_factory(spark, n_true_entities=5, seed=7)
    assert sorted(a.sources["crn"].data.collect()) == sorted(
        b.sources["crn"].data.collect()
    )
    c = linked_sources_factory(spark, n_true_entities=5, seed=8)
    assert sorted(a.sources["crn"].data.collect()) != sorted(
        c.sources["crn"].data.collect()
    )


def test_naive_dedupe_recovers_crn_entities(spark, kit):
    """Dedupe crn on the stable crn field → exactly the true entities."""
    crn = kit.sources["crn"]
    data = crn.data.withColumn("id", F.monotonically_increasing_id())
    id_map = {r["key"]: r["id"] for r in data.select("key", "id").collect()}

    edges = NaiveDeduper(id="id", unique_fields=["crn"]).dedupe(data)
    got = {(r["left_id"], r["right_id"]) for r in edges.collect()}
    assert got == crn.expected_pairs(id_map)

    # resolve → cluster key-sets equal ground truth entity key-sets
    assignments = Components(method="driver").compute_clusters({"m": edges})
    inv = {v: k for k, v in id_map.items()}
    produced: dict[int, set[str]] = {}
    for r in assignments.collect():
        produced.setdefault(r["parent_id"], set()).add(inv[r["child_id"]])
    p_only, e_only = diff_clusters(produced, crn.expected_entity_keys())
    assert not p_only and not e_only


def test_deterministic_link_recovers_cross_source(spark, kit):
    """Link crn ↔ cdms on crn equality → exactly the same-entity key pairs."""
    crn, cdms = kit.sources["crn"], kit.sources["cdms"]
    linker = DeterministicLinker(
        left_id="key", right_id="key", comparisons=["l.crn = r.crn"]
    )
    edges = linker.link(crn.data, cdms.data)
    got = {(r["left_id"], r["right_id"]) for r in edges.collect()}
    assert got == kit.expected_cross_pairs("crn", "cdms")


def test_replace_rule_and_cleaning_roundtrip(spark):
    """Suffix-varied names dedupe only after cleaning strips the suffix —
    the e2e cleaning scenario (test_e2e_dag.py:33-55 in the reference)."""
    ents = make_true_entities(5, seed=1)
    src = source_factory(
        spark,
        "s",
        ents,
        ["company_name"],
        variations={"company_name": [SuffixRule(" Ltd"), SuffixRule(" Limited")]},
    )
    raw = src.data.withColumn("id", F.monotonically_increasing_id())
    # without cleaning: names differ → no pairs beyond exact dupes
    edges_raw = NaiveDeduper(id="id", unique_fields=["company_name"]).dedupe(raw)
    assert edges_raw.count() == 0

    cleaned = raw.withColumn(
        "company_name", F.regexp_replace("company_name", r" (Ltd|Limited)$", "")
    )
    edges = NaiveDeduper(id="id", unique_fields=["company_name"]).dedupe(cleaned)
    id_map = {r["key"]: r["id"] for r in raw.select("key", "id").collect()}
    assert {(r["left_id"], r["right_id"]) for r in edges.collect()} == (
        src.expected_pairs(id_map)
    )
