"""JDBC source integration: a real end-to-end read through SourceConfig.

The reference's primary source location is an RDBMS
(reference src/matchbox/client/locations.py:355-393); the jdbc reader here
had never executed against a live database. PySpark ships the embedded
Apache Derby driver (used for the Hive metastore), so this test runs the
full round-trip in-process: write a table over JDBC, then read it back via
``SourceConfig(format="jdbc")`` with ``fetchsize`` batching and the S2
key-filter path, and index it into a catalog.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from matchbox_spark.plans.catalog import Catalog
from matchbox_spark.sources.source import SourceConfig

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark):
    path = tempfile.mkdtemp(prefix="mbspark_derby_") + "/db"
    url = f"jdbc:derby:{path};create=true"
    src = spark.createDataFrame(
        [(i, f"name-{i % 7}", float(i) * 1.5) for i in range(100)],
        "id int, name string, amount double",
    )
    (
        src.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "people")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )
    return url


def test_jdbc_read_roundtrip_with_fetchsize(spark, derby_url):
    cfg = SourceConfig(
        name="people",
        location=derby_url,
        key_field="id",
        index_fields=["name", "amount"],
        format="jdbc",
        options={"dbtable": "people", "driver": DRIVER, "fetchsize": "10"},
    )
    df = cfg.read(spark)
    assert df.count() == 100
    # key field is cast to string per the reference invariant
    assert dict(df.dtypes)["id"] == "string"
    row = df.where(F.col("id") == "42").collect()
    assert len(row) == 1 and row[0]["amount"] == 63.0


def test_jdbc_key_filter_pushdown(spark, derby_url):
    cfg = SourceConfig(
        name="people",
        location=derby_url,
        key_field="id",
        index_fields=["name"],
        format="jdbc",
        options={"dbtable": "people", "driver": DRIVER, "fetchsize": "10"},
    )
    out = cfg.read(spark, keys=["1", "2", "3"])
    assert sorted(r["id"] for r in out.collect()) == ["1", "2", "3"]


def test_jdbc_source_indexes_into_catalog(spark, derby_url):
    cfg = SourceConfig(
        name="people",
        location=derby_url,
        key_field="id",
        index_fields=["name"],
        format="jdbc",
        options={"dbtable": "people", "driver": DRIVER},
    )
    cat = Catalog(spark)
    cat.insert_source_index("people", cfg.index(spark))
    # 7 distinct names → 7 content clusters, 100 keys spread across them
    assert cat.clusters.count() == 7
    assert cat.cluster_keys.count() == 100
    per = cat.cluster_keys.groupBy("cluster_id").count().collect()
    assert sum(r["count"] for r in per) == 100
