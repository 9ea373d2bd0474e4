"""Named, build-once test scenarios over the factories (reference parity:
src/matchbox/common/factories/scenarios.py:41-910).

The reference builds named backend states (``bare``/``index``/``dedupe``/
``link``/``convergent``/``mega``) once per test session and snapshot-caches
them so dozens of adapter tests run against rich prebuilt pipelines instead
of each rebuilding its world. Spark-side the same idea is cheaper: the built
``DAG`` + ``Catalog`` live as session state (checkpointed DataFrames), so the
cache is an in-process dict keyed by (session, scenario, size, seed).

Scenario ladder (each includes the previous):

- ``bare``       sources declared, nothing synced
- ``index``      sources content-indexed into the catalog
- ``dedupe``     NaiveDeduper over crn + Components resolver
- ``link``       DeterministicLinker crn↔cdms over the deduped crn + stacked
                 resolver (the reference ``link`` scenario shape)
- ``convergent`` two sources generated IDENTICALLY (same features, same
                 entities, repetition) so their content hashes collide across
                 sources — indexing the second adds keys but no clusters —
                 each with its own naive dedupe model + resolver (reference
                 ``convergent``: scenarios.py:763-910)
- ``mega``       ``link`` at 4× entity count with repetition (stress shape)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from matchbox_spark.factories import LinkedSourcesTestkit, linked_sources_factory
from matchbox_spark.operators.dedupers import NaiveDeduper
from matchbox_spark.operators.linkers import DeterministicLinker
from matchbox_spark.plans.dag import DAG
from matchbox_spark.plans.query import QueryConfig
from matchbox_spark.plans.resolvers import Components
from matchbox_spark.sources.source import SourceConfig

SCENARIOS = ("bare", "index", "dedupe", "link", "convergent", "mega")

_CACHE: dict[tuple, "Scenario"] = {}


@dataclass
class Scenario:
    """A built pipeline state: the DAG (with catalog), its sources, and the
    ground-truth testkit."""

    name: str
    dag: DAG
    kit: LinkedSourcesTestkit
    sources: dict[str, SourceConfig] = field(default_factory=dict)
    # the top resolver to query with, when the scenario has one
    resolver: str | None = None

    @property
    def catalog(self):
        return self.dag.catalog


def _declare_sources(spark: SparkSession, kit: LinkedSourcesTestkit, dag: DAG):
    """Register each generated source as a temp view and declare it (S9
    temp-table ingest path — no filesystem round-trip)."""
    out: dict[str, SourceConfig] = {}
    specs = {
        "crn": ["company_name", "crn"],
        "cdms": ["crn", "cdms"],
    }
    for name, index_fields in specs.items():
        view = f"__scenario_{name}"
        kit.sources[name].data.createOrReplaceTempView(view)
        cfg = SourceConfig(
            name=name,
            location=view,
            key_field="key",
            index_fields=index_fields,
            format="table",
        )
        dag.source(cfg)
        out[name] = cfg
    return out


def scenario(
    spark: SparkSession,
    name: str,
    n_true_entities: int = 8,
    seed: int = 42,
) -> Scenario:
    """Build (once per session/config) and return the named scenario."""
    if name not in SCENARIOS:
        raise ValueError(f"unknown scenario {name!r}; known: {SCENARIOS}")
    key = (id(spark), name, n_true_entities, seed)
    if key in _CACHE:
        return _CACHE[key]

    if name == "mega":
        n_true_entities = n_true_entities * 4

    resolver: str | None = None
    if name != "convergent":
        kit = linked_sources_factory(
            spark, n_true_entities=n_true_entities, seed=seed
        )
        dag = DAG(spark)
        sources = _declare_sources(spark, kit, dag)
        crn, cdms = sources["crn"], sources["cdms"]

    if name in ("dedupe", "link", "mega"):
        dag.model(
            "dedupe_crn",
            NaiveDeduper(id="id", unique_fields=["crn_crn"]),
            QueryConfig(sources=[crn]),
        )
        dag.resolver("resolve_crn", Components(method="auto"), ["dedupe_crn"])
        resolver = "resolve_crn"
    if name in ("link", "mega"):
        dag.model(
            "link_crn_cdms",
            DeterministicLinker(
                left_id="id",
                right_id="id",
                comparisons=["l.crn_crn = r.cdms_crn"],
            ),
            QueryConfig(sources=[crn], resolvers=["resolve_crn"]),
            QueryConfig(sources=[cdms]),
        )
        dag.resolver(
            "resolve_linked", Components(method="auto"), ["link_crn_cdms"]
        )
        resolver = "resolve_linked"
    if name == "convergent":
        # replace the default sources: foo_a and foo_b generate IDENTICALLY
        # (same entity universe, same features, repetition) so their indexed
        # rows share content hashes — indexing foo_b adds keys to existing
        # clusters, not new clusters; each source gets its own naive dedupe
        # model + resolver (reference convergent scenario shape)
        from matchbox_spark.factories import (
            SuffixRule,
            make_true_entities,
            source_factory,
        )

        entities = make_true_entities(n_true_entities, seed)
        kit = LinkedSourcesTestkit(true_entities=entities)
        dag = DAG(spark)
        sources = {}
        for sname in ("foo_a", "foo_b"):
            tk = source_factory(
                spark,
                sname,
                entities,
                ["company_name"],
                variations={"company_name": [SuffixRule(" UK")]},
                repetition=1,
                seed=seed,
            )
            kit.sources[sname] = tk
            view = f"__scenario_{sname}"
            tk.data.createOrReplaceTempView(view)
            cfg = SourceConfig(
                name=sname,
                location=view,
                key_field="key",
                index_fields=["company_name"],
                format="table",
            )
            dag.source(cfg)
            sources[sname] = cfg
            dag.model(
                f"naive_{sname}",
                NaiveDeduper(id="id", unique_fields=[f"{sname}_company_name"]),
                QueryConfig(sources=[cfg]),
            )
            dag.resolver(
                f"resolver_naive_{sname}",
                Components(method="auto"),
                [f"naive_{sname}"],
            )
        resolver = "resolver_naive_foo_a"

    if name != "bare":
        dag.run()

    built = Scenario(
        name=name, dag=dag, kit=kit, sources=sources, resolver=resolver
    )
    _CACHE[key] = built
    return built
