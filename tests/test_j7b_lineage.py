"""j7b: multi-resolver lineage priority over real testdata, pinned against
the first-principles oracle AND against a deliberately WRONG priority.

The driver's hash check (CORRECTNESS j7b_lineage_priority) proves the
output matches the oracle; this pin additionally proves the oracle has
discriminating power — reversing the COALESCE priority produces a
DIFFERENT answer, so a priority regression cannot silently pass.
Reference semantics: server/postgresql/utils/query.py:36-117 (chained
per-resolver LEFT JOINs + COALESCE) and orm.py:326-405 (closure-level
ordering).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def linked(spark, sf_dir):
    import __spark_entry__ as e

    return e._linked_dag(spark, sf_dir)


def _project(dag, lineage) -> pd.DataFrame:
    from matchbox_spark.plans.query import unified_query

    proj = unified_query(dag.catalog, lineage, ["custx", "suppx"], level="key")
    member = F.when(
        F.col("source") == "suppx",
        F.concat(F.lit("a:"), F.lpad("key", 12, "0")),
    ).otherwise(F.concat(F.lit("c:"), F.lpad("key", 12, "0")))
    w = Window.partitionBy("id")
    pdf = (
        proj.select(
            "key",
            "source",
            F.min(member).over(w).alias("entity_rep"),
            F.count(F.lit(1)).over(w).alias("n_keys"),
        )
        .toPandas()
        .sort_values(["source", "key"], ignore_index=True)
    )
    pdf["n_keys"] = pdf["n_keys"].astype("int64")
    return pdf


def test_lineage_is_depth_two(linked):
    assert linked.resolver_lineage("resolve_link") == [
        "resolve_link",
        "resolve_cust",
        "resolve_supp",
    ]


def test_priority_matches_oracle_and_discriminates(linked, sf_dir):
    import duckdb

    import __spark_entry__ as e

    lineage = linked.resolver_lineage("resolve_link")
    good = _project(linked, lineage)
    bad = _project(linked, list(reversed(lineage)))

    con = duckdb.connect()
    for t in ("customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracle = (
        con.execute(e._J7B_ORACLE)
        .df()
        .sort_values(["source", "key"], ignore_index=True)
    )
    oracle["n_keys"] = oracle["n_keys"].astype("int64")

    pd.testing.assert_frame_equal(good[oracle.columns], oracle)
    assert not bad[oracle.columns].equals(oracle), (
        "reversed priority produced the same answer — the oracle lost its "
        "discriminating power (fixture drift?)"
    )


def test_all_three_coalesce_branches_populated(linked):
    """Some keys resolve at the link level, some at the per-source dedupe
    level, and (at sf0.001) singleton groups fall through to the leaf —
    the fixture must keep exercising every branch."""
    lineage = linked.resolver_lineage("resolve_link")
    good = _project(linked, lineage)
    cust = good[good.source == "custx"]
    linked_keys = cust.entity_rep.str.startswith("a:")
    assert linked_keys.any(), "no customer key resolved by the link resolver"
    assert (~linked_keys).any(), "every customer key was link-resolved"
    # dedupe-resolved groups (n_keys > 1) and singletons both present
    fallthrough = cust[~linked_keys]
    assert (fallthrough.n_keys > 1).any()
