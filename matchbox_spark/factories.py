"""Synthetic-entity factories with tracked ground truth (SURVEY §5).

Re-creates the reference's test backbone (factories/sources.py:532-900,
entities.py:49-365) without the Faker dependency: seeded ``random`` word
generators produce "true entities"; per-source feature subsets, variation
rules (suffix/prefix/replace), and repetition (exact duplicate rows under new
keys) derive the observable rows. Every row carries its true-entity id
internally so tests can assert produced clusters/edges against exact expected
sets (the reference's ClusterEntity/SourceEntity tracking).

Default linked scenario mirrors FIXTURES.md §1: three sources (crn, dh, cdms)
over one company universe — crn has 3 suffix variations per entity, dh covers
half the universe, cdms duplicates every row once.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from itertools import combinations
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_WORDS = (
    "Acme Global Northern Southern United Allied Prime Apex Summit Crest "
    "Harbor River Valley Stone Iron Copper Silver Gold Crystal Swift"
).split()
_KINDS = "Trading Holdings Logistics Industries Consulting Labs Systems Works".split()


@dataclass(frozen=True)
class SuffixRule:
    suffix: str

    def apply(self, value: str) -> str:
        return value + self.suffix


@dataclass(frozen=True)
class PrefixRule:
    prefix: str

    def apply(self, value: str) -> str:
        return self.prefix + value


@dataclass(frozen=True)
class ReplaceRule:
    old: str
    new: str

    def apply(self, value: str) -> str:
        return value.replace(self.old, self.new)


VariationRule = SuffixRule | PrefixRule | ReplaceRule


@dataclass
class TrueEntity:
    """One ground-truth entity with its full feature pool."""

    entity_id: int
    features: dict[str, str]


@dataclass
class SourceTestkit:
    """A generated source plus its ground truth."""

    name: str
    data: DataFrame  # key + feature columns
    key_to_entity: dict[str, int]
    features: list[str]

    def expected_entity_keys(self) -> dict[int, set[str]]:
        out: dict[int, set[str]] = {}
        for key, ent in self.key_to_entity.items():
            out.setdefault(ent, set()).add(key)
        return out

    def expected_pairs(self, id_map: dict[str, int] | None = None) -> set[tuple]:
        """All same-entity unordered pairs (by key, or by mapped id)."""
        pairs: set[tuple] = set()
        for keys in self.expected_entity_keys().values():
            ids = sorted(id_map[k] for k in keys) if id_map else sorted(keys)
            pairs.update(combinations(sorted(set(ids)), 2))
        return pairs


@dataclass
class LinkedSourcesTestkit:
    """Several sources over one entity universe."""

    true_entities: list[TrueEntity]
    sources: dict[str, SourceTestkit] = field(default_factory=dict)

    def expected_cross_pairs(self, a: str, b: str) -> set[tuple[str, str]]:
        """(key_a, key_b) pairs referring to the same entity."""
        ents_a = self.sources[a].expected_entity_keys()
        ents_b = self.sources[b].expected_entity_keys()
        out: set[tuple[str, str]] = set()
        for ent, keys_a in ents_a.items():
            for ka in keys_a:
                for kb in ents_b.get(ent, ()):  # noqa: B905
                    out.add((ka, kb))
        return out

    def diff_model_edges(
        self,
        edges,
        sources: list[str],
        left_clusters: dict,
        right_clusters: dict | None = None,
        threshold: float = 0.0,
    ) -> tuple[bool, dict]:
        """Diff model edges against the kit's ground truth (reference
        sources.py:226-261): union-find the thresholded edges into merged
        entities (``scores_to_results_entities``), compare with the true
        entity key sets restricted to ``sources`` via ``diff_entities``."""
        expected: dict[int, set[str]] = {}
        for s in sources:
            for ent, keys in self.sources[s].expected_entity_keys().items():
                expected.setdefault(ent, set()).update(keys)
        actual = scores_to_results_entities(
            edges, left_clusters, right_clusters, threshold
        )
        return diff_entities(expected.values(), actual)


def make_true_entities(n: int, seed: int = 42) -> list[TrueEntity]:
    rng = random.Random(seed)
    entities = []
    for i in range(n):
        name = f"{rng.choice(_WORDS)} {rng.choice(_WORDS)} {rng.choice(_KINDS)} {i}"
        entities.append(
            TrueEntity(
                entity_id=i,
                features={
                    "company_name": name,
                    "crn": f"{rng.randrange(10**8):08d}-{i:04d}",
                    "dh": f"{rng.randrange(10**8):08d}",
                    "cdms": f"ORG-{rng.randrange(10**8):08d}",
                    "address": f"{rng.randrange(1, 999)} {rng.choice(_WORDS)} Street",
                },
            )
        )
    return entities


def source_factory(
    spark: SparkSession,
    name: str,
    true_entities: list[TrueEntity],
    features: list[str],
    variations: dict[str, list[VariationRule]] | None = None,
    repetition: int = 0,
    seed: int = 42,
) -> SourceTestkit:
    """Generate one source: base row per entity + variation rows + repeats.

    ``variations`` maps a feature to rules; each rule adds one extra row per
    entity with that feature varied. ``repetition`` repeats every generated
    row N extra times under fresh keys (exact duplicates, the reference's
    ``repetition`` knob).
    """
    variations = variations or {}
    rows: list[dict] = []
    key_to_entity: dict[str, int] = {}
    counter = 0

    def emit(ent: TrueEntity, feat_values: dict[str, str]) -> None:
        nonlocal counter
        for _ in range(1 + repetition):
            key = f"{name}-{counter}"
            counter += 1
            key_to_entity[key] = ent.entity_id
            rows.append({"key": key, **feat_values})

    for ent in true_entities:
        base = {f: ent.features[f] for f in features}
        emit(ent, base)
        for feat, rules in variations.items():
            for rule in rules:
                varied = dict(base)
                varied[feat] = rule.apply(base[feat])
                emit(ent, varied)

    schema = "key string, " + ", ".join(f"{f} string" for f in features)
    data = spark.createDataFrame(
        [(row["key"], *[row[f] for f in features]) for row in rows], schema
    )
    return SourceTestkit(
        name=name, data=data, key_to_entity=key_to_entity, features=features
    )


def linked_sources_factory(
    spark: SparkSession, n_true_entities: int = 10, seed: int = 42
) -> LinkedSourcesTestkit:
    """The canonical 3-source company scenario (FIXTURES.md §1)."""
    entities = make_true_entities(n_true_entities, seed)
    kit = LinkedSourcesTestkit(true_entities=entities)
    kit.sources["crn"] = source_factory(
        spark,
        "crn",
        entities,
        ["company_name", "crn"],
        variations={
            "company_name": [
                SuffixRule(" Limited"),
                SuffixRule(" UK"),
                SuffixRule(" Company"),
            ]
        },
        seed=seed,
    )
    kit.sources["dh"] = source_factory(
        spark,
        "dh",
        entities[: max(1, n_true_entities // 2)],
        ["company_name", "dh"],
        seed=seed,
    )
    kit.sources["cdms"] = source_factory(
        spark, "cdms", entities, ["crn", "cdms"], repetition=1, seed=seed
    )
    return kit


def diff_clusters(
    produced: dict[int, set[str]], expected: dict[int, set[str]]
) -> tuple[set[frozenset], set[frozenset]]:
    """Symmetric difference of two clusterings as key-set families.

    Returns (produced_only, expected_only); both empty ⇔ identical
    clusterings (label-invariant), the reference's diff_clusters contract.
    """
    p = {frozenset(v) for v in produced.values()}
    e = {frozenset(v) for v in expected.values()}
    return p - e, e - p


def make_scored_deduper(
    id_col: str,
    unique_fields: list[str],
    score_range: tuple[float, float] = (0.5, 0.99),
    seed: int = 42,
):
    """A deduper emitting ground-truth pairs with SEEDED varying scores.

    The reference's ``query_to_model_factory`` analogue
    (factories/models.py — synthetic probability edges over known truth,
    ``score_range=(0.5, 0.99)``): pairs come from grouping on an
    entity-stable field (truth by construction), scores derive
    relationally from ``xxhash64(left, right, seed)`` scaled into the
    range — deterministic, reproducible, no driver-side loop. Used by the
    ``scored_dedupe`` / ``alt_dedupe`` scenarios.
    """
    from pyspark.sql import functions as F

    from matchbox_spark.operators.dedupers import NaiveDeduper

    class ScoredDeduper(NaiveDeduper):
        def dedupe(self, data: DataFrame) -> DataFrame:
            base = super().dedupe(data)
            lo, hi = score_range
            u = (
                F.pmod(
                    F.xxhash64("left_id", "right_id", F.lit(seed)),
                    F.lit(1_000_000),
                )
                / 1_000_000.0
            )
            return base.withColumn(
                "score", (F.lit(lo) + u * F.lit(hi - lo)).cast("float")
            )

    return ScoredDeduper(id=id_col, unique_fields=unique_fields)


def scores_to_results_entities(
    edges,
    left_clusters: dict,
    right_clusters: dict | None = None,
    threshold: float = 0.0,
) -> set[frozenset]:
    """Union-find model edges at a threshold into merged key-set entities.

    The reference's ``scores_to_results_entities`` (entities.py:526-563):
    every input cluster joins the disjoint set (unmerged singletons emerge
    as themselves), edges with ``score >= threshold`` union their
    endpoints, and each component's key sets merge. ``left_clusters`` /
    ``right_clusters`` map an edge-id to that input cluster's key set; for
    raw source rows that is ``{key: {key}}``. ``edges`` is a DataFrame
    with ``left_id/right_id/score`` or an iterable of such triples.
    """
    right = left_clusters if right_clusters is None else right_clusters
    # namespace the two sides: reference ids are globally unique objects,
    # plain dict keys may collide between left and right
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    nodes = {("l", i) for i in left_clusters} | {
        ("l" if right_clusters is None else "r", i) for i in right
    }
    for n in nodes:
        parent[n] = n
    rows = (
        edges.collect() if isinstance(edges, DataFrame) else list(edges)
    )
    rside = "l" if right_clusters is None else "r"
    for r in rows:
        left_id, right_id, score = r[0], r[1], r[2]
        if score >= threshold:
            union(("l", left_id), (rside, right_id))
    comps: dict = {}
    for side, i in nodes:
        keys = left_clusters[i] if side == "l" else right[i]
        comps.setdefault(find((side, i)), set()).update(keys)
    return {frozenset(v) for v in comps.values()}


def diff_entities(expected, actual) -> tuple[bool, dict]:
    """Detailed clustering diff, the reference report contract
    (entities.py:566-613): ``(identical, {})`` when the key-set families
    match, else counts of actual entities that are ``perfect`` / ``subset``
    / ``superset`` of an expected entity, ``invalid`` (carry keys no
    expected entity has), or ``wrong`` (overlap expected keys but match no
    containment relation)."""
    expected_set = {frozenset(e) for e in expected}
    actual_set = {frozenset(a) for a in actual}
    if expected_set == actual_set:
        return True, {}
    all_expected = frozenset().union(*expected_set) if expected_set else frozenset()
    perfect = expected_set & actual_set
    report = {
        "perfect": len(perfect),
        "subset": 0,
        "superset": 0,
        "wrong": 0,
        "invalid": 0,
    }
    for a in actual_set - perfect:
        if any(a < e for e in expected_set):
            report["subset"] += 1
        elif not a <= all_expected:
            report["invalid"] += 1
        elif any(e < a for e in expected_set):
            report["superset"] += 1
        else:
            report["wrong"] += 1
    return False, report


# ---------------------------------------------------------------------------
# probability-edge generation with graph invariants (SURVEY §5.2;
# reference factories/models.py:209-439)
# ---------------------------------------------------------------------------


def calculate_min_max_edges(n_nodes: int, n_components: int) -> tuple[int, int]:
    """Theoretical edge-count bounds for ``n_nodes`` split as evenly as
    possible into ``n_components`` connected components: min = spanning
    forest (n - k), max = sum of complete graphs over the component sizes."""
    if not 0 < n_components <= n_nodes:
        raise ValueError(
            f"need 0 < n_components <= n_nodes, got {n_components}/{n_nodes}"
        )
    base, rem = divmod(n_nodes, n_components)
    sizes = [base + (1 if i < rem else 0) for i in range(n_components)]
    min_edges = n_nodes - n_components
    max_edges = sum(s * (s - 1) // 2 for s in sizes)
    return min_edges, max_edges


def generate_component_edges(
    spark: SparkSession,
    n_nodes: int,
    n_components: int,
    n_edges: int | None = None,
    score_range: tuple[float, float] = (0.6, 1.0),
    seed: int = 42,
) -> tuple[DataFrame, dict[int, int]]:
    """Seeded scored edges forming EXACTLY ``n_components`` components.

    Nodes 1..n assign round-robin to components; each component gets a
    spanning chain (the minimum), then random in-component extras top the
    count up to ``n_edges`` (validated against ``calculate_min_max_edges``
    bounds — the reference's invariant check). Returns (edges DF with
    ``left_id/right_id/score``, node → expected-component-min ground truth),
    so tests can assert any resolver threshold below ``score_range[0]``
    recovers the exact clustering.
    """
    mn, mx = calculate_min_max_edges(n_nodes, n_components)
    if n_edges is None:
        n_edges = mn
    if not mn <= n_edges <= mx:
        raise ValueError(f"n_edges must be within [{mn}, {mx}], got {n_edges}")
    rng = random.Random(seed)
    groups = [list(range(c, n_nodes, n_components)) for c in range(n_components)]
    edges: set[tuple[int, int]] = set()
    for g in groups:
        for a, b in zip(g, g[1:]):
            edges.add((a, b))
    attempts = 0
    while len(edges) < n_edges and attempts < 100 * n_edges:
        attempts += 1
        g = rng.choice(groups)
        if len(g) < 2:
            continue
        a, b = rng.sample(g, 2)
        edges.add((min(a, b), max(a, b)))
    rows = [
        (a + 1, b + 1, round(rng.uniform(*score_range), 6))
        for a, b in sorted(edges)
    ]
    truth = {node + 1: min(g) + 1 for g in groups for node in g}
    df = spark.createDataFrame(rows, "left_id long, right_id long, score double")
    return df, truth
