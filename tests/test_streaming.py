"""Incremental indexing via Structured Streaming (file source, availableNow)."""

from __future__ import annotations

from pyspark.sql import functions as F

from matchbox_spark.plans.catalog import Catalog
from matchbox_spark.streaming import incremental_index_stream


def test_incremental_index_two_batches(spark, tmp_path):
    src_dir = tmp_path / "incoming"
    src_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [("k1", "alice"), ("k2", "alice"), ("k3", "bob")], "key string, name string"
    ).write.parquet(str(src_dir / "batch1"))

    catalog = Catalog(spark)
    schema = "key string, name string"
    stream = spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(
        str(src_dir)
    )
    q = incremental_index_stream(
        stream, catalog, "s", key_field="key", index_fields=["name"],
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(120)

    assert catalog.clusters.count() == 2  # alice, bob
    keys = {
        r["key"] for r in catalog.cluster_keys.where(F.col("source") == "s").collect()
    }
    assert keys == {"k1", "k2", "k3"}

    # second batch: one known content (alice — new key only), one new (carol)
    spark.createDataFrame(
        [("k4", "alice"), ("k5", "carol")], "key string, name string"
    ).write.parquet(str(src_dir / "batch2"))
    q2 = incremental_index_stream(
        spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(
            str(src_dir)
        ),
        catalog, "s", key_field="key", index_fields=["name"],
        checkpoint_dir=ckpt,
    )
    q2.awaitTermination(120)

    assert catalog.clusters.count() == 3  # + carol only; alice deduped by hash
    keys = {
        r["key"] for r in catalog.cluster_keys.where(F.col("source") == "s").collect()
    }
    assert keys == {"k1", "k2", "k3", "k4", "k5"}

    # alice's cluster carries all three of her keys
    alice_keys = (
        catalog.cluster_keys.groupBy("cluster_id")
        .agg(F.collect_set("key").alias("ks"))
        .where(F.size("ks") == 3)
        .collect()
    )
    assert len(alice_keys) == 1
    assert set(alice_keys[0]["ks"]) == {"k1", "k2", "k4"}
