"""Pins for round-13 optimization internals.

1. `_sum6` fast default grid (floor-long micros, shift/mask split) is
   value-identical to the legacy decimal accumulation on adversarial
   inputs: negatives, nulls, all-null groups, 2/4-dp grids, zero.
2. WeightedDeterministicLinker's low-parallelism repartition rescue keeps
   the scored pair set identical on a narrow (single-partition) input.
3. The extended driver-local catalog paths (multi-source index insert via
   the clusters mirror, resolver insert via the contains mirror with G4
   expansion) produce a byte-identical catalog to the distributed paths
   on the full multi-source stacked-resolver pipeline shape.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as em

    return em


def test_sum6_fast_matches_legacy_adversarial(spark, entry):
    rows = [
        (1, 0.07),
        (1, -3.5),
        (1, None),
        (1, 123456.78),
        (1, -0.0001),
        (2, None),  # all-null group
        (3, 0.123456),
        (3, -98765.4321),
        (3, 1e9),
        (3, -1e9),
        (4, 0.0),
    ]
    df = spark.createDataFrame(rows, "g int, v double")
    fast = (
        df.groupBy("g").agg(entry._sum6(F.col("v")).alias("s")).orderBy("g")
    ).collect()
    legacy = (
        df.groupBy("g")
        .agg(entry._sum6(F.col("v"), dec=entry._dec6).alias("s"))
        .orderBy("g")
    ).collect()
    assert [r.asDict() for r in fast] == [r.asDict() for r in legacy]
    # dtype parity: both decimal(28,6)
    fdf = df.groupBy("g").agg(entry._sum6(F.col("v")).alias("s"))
    assert fdf.schema["s"].dataType.simpleString() == "decimal(28,6)"


def test_weighted_linker_rescue_same_pairs(spark):
    from matchbox_spark.operators.linkers import WeightedDeterministicLinker

    left = spark.createDataFrame(
        [(i, i % 5, float(i % 3)) for i in range(200)],
        "lid long, k int, b double",
    ).coalesce(1)
    right = spark.createDataFrame(
        [(100 + j, j % 5, float(j % 3)) for j in range(50)],
        "rid long, k int, b double",
    ).coalesce(1)
    linker = WeightedDeterministicLinker(
        left_id="lid",
        right_id="rid",
        weighted_comparisons=[
            {"comparison": "l.k = r.k", "weight": 2.0},
            {"comparison": "l.b = r.b", "weight": 1.0},
        ],
        threshold=0.66,
    )
    out = linker.link(left, right)
    got = {(r.left_id, r.right_id, round(r.score, 6)) for r in out.collect()}

    # independent reference: per-rule distinct pair sets, then weight sum
    lp = {(r.lid, r.k, r.b) for r in left.collect()}
    rp = {(r.rid, r.k, r.b) for r in right.collect()}
    exp = {}
    for lid, lk, lb in lp:
        for rid, rk, rb in rp:
            w = (2.0 if lk == rk else 0.0) + (1.0 if lb == rb else 0.0)
            if w / 3.0 >= 0.66:
                exp[(lid, rid)] = round(w / 3.0, 6)
    assert got == {(k[0], k[1], v) for k, v in exp.items()}


def _linked_catalog(spark, sf_dir):
    """The j7b linked-DAG shape: two sources, per-source dedupe resolvers,
    a cross-source linker, a stacked top resolver."""
    from matchbox_spark.operators.dedupers import NaiveDeduper
    from matchbox_spark.operators.linkers import DeterministicLinker
    from matchbox_spark.plans.catalog import Catalog
    from matchbox_spark.plans.dag import DAG
    from matchbox_spark.plans.query import QueryConfig
    from matchbox_spark.plans.resolvers import Components
    from matchbox_spark.sources.source import SourceConfig

    dag = DAG(spark, Catalog(spark))
    custx = SourceConfig(
        name="custx",
        location=f"{sf_dir}/customer.parquet",
        key_field="c_custkey",
        index_fields=["c_name", "c_nationkey", "c_mktsegment"],
    )
    suppx = SourceConfig(
        name="suppx",
        location=f"{sf_dir}/supplier.parquet",
        key_field="s_suppkey",
        index_fields=["s_name", "s_nationkey"],
    )
    dag.source(custx)
    dag.source(suppx)
    dag.model(
        "dedupe_cust",
        NaiveDeduper(
            id="id", unique_fields=["custx_c_nationkey", "custx_c_mktsegment"]
        ),
        QueryConfig(sources=[custx]),
    )
    dag.resolver("resolve_cust", Components(method="auto"), ["dedupe_cust"])
    dag.model(
        "dedupe_supp",
        NaiveDeduper(id="id", unique_fields=["suppx_s_nationkey"]),
        QueryConfig(sources=[suppx]),
    )
    dag.resolver("resolve_supp", Components(method="auto"), ["dedupe_supp"])
    dag.model(
        "link_cs",
        DeterministicLinker(
            left_id="id",
            right_id="id",
            comparisons=[
                "l.custx_c_nationkey = r.suppx_s_nationkey "
                "AND l.custx_c_mktsegment = 'BUILDING'"
            ],
        ),
        QueryConfig(sources=[custx], resolvers=["resolve_cust"]),
        QueryConfig(sources=[suppx], resolvers=["resolve_supp"]),
    )
    dag.resolver("resolve_link", Components(method="auto"), ["link_cs"])
    dag.run()
    return dag


def _catalog_state(cat):
    """Canonical content of every catalog table + step fingerprints."""
    state = {"steps": {k: v.get("fingerprint") for k, v in cat.steps.items()}}
    for name in cat._table_names():
        df = getattr(cat, name)
        rows = [
            tuple(
                v.hex() if isinstance(v, (bytes, bytearray)) else v
                for v in r
            )
            for r in df.collect()
        ]
        state[name] = sorted(rows)
    state["max_id"] = cat._max_id
    return state


def test_local_and_distributed_catalog_paths_byte_identical(
    spark, sf_dir, monkeypatch
):
    # local paths live (default): mirrors survive the whole pipeline
    local_dag = _linked_catalog(spark, sf_dir)
    assert local_dag.catalog._driver_cluster_hashes is not None
    assert local_dag.catalog._driver_contains is not None
    local_state = _catalog_state(local_dag.catalog)

    # force every insert through the distributed branches
    monkeypatch.setenv("MATCHBOX_SPARK_INDEX_DRIVER_BYTES", "0")
    dist_dag = _linked_catalog(spark, sf_dir)
    assert dist_dag.catalog._driver_cluster_hashes is None
    dist_state = _catalog_state(dist_dag.catalog)

    assert local_state == dist_state


def test_contains_mirror_matches_table(spark, sf_dir):
    dag = _linked_catalog(spark, sf_dir)
    cat = dag.catalog
    mirror = cat._driver_contains
    table = {}
    for r in cat.contains.collect():
        table.setdefault(r["root"], []).append(r["leaf"])
    assert mirror == {k: tuple(sorted(v)) for k, v in table.items()}
    cmirror = cat._driver_cluster_hashes
    rows = {r["cluster_id"]: bytes(r["cluster_hash"]) for r in cat.clusters.collect()}
    assert cmirror == rows


def _overlap_catalogs(spark):
    """Two source inserts whose index HASHES overlap (h2, h3 shared):
    the second insert must reuse the existing cluster ids for the shared
    hashes and only mint ids for the new one — the rev-lookup branch of
    the mirror path that distinct-field pipelines never exercise."""
    import hashlib

    import pandas as pd

    from matchbox_spark.plans.catalog import Catalog

    def digest(s):
        return hashlib.sha256(s.encode()).digest()

    def index(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "hash": [digest(h) for h, _ in rows],
                    "keys": [list(k) for _, k in rows],
                }
            ),
            "hash binary, keys array<string>",
        )

    cat = Catalog(spark)
    cat.insert_source_index(
        "srcA", index([("h1", ["a1"]), ("h2", ["a2", "a2x"]), ("h3", ["a3"])])
    )
    cat.insert_source_index(
        "srcB", index([("h2", ["b2"]), ("h3", ["b3"]), ("h4", ["b4"])])
    )
    return cat


def test_overlapping_hash_insert_local_matches_distributed(spark, monkeypatch):
    local = _overlap_catalogs(spark)
    assert local._driver_cluster_hashes is not None  # stayed on the mirror path
    local_state = _catalog_state(local)
    assert len(local_state["clusters"]) == 4  # h2/h3 reused, only h4 minted

    monkeypatch.setenv("MATCHBOX_SPARK_INDEX_DRIVER_BYTES", "0")
    dist = _overlap_catalogs(spark)
    assert dist._driver_cluster_hashes is None
    assert local_state == _catalog_state(dist)
