"""Hash determinism + reference-recipe compatibility tests (SURVEY §2.8).

The pure-Python expected values below re-derive the recipe independently
(row recipe follows /root/reference/src/matchbox/common/hash.py:83-217
semantics): sha256 over "{col}␟{value}␞" concatenation; table hash = tree
fold — rows bucket by the first 20 bits of their digest, each bucket folds
its sorted digests through sha256, buckets fold in order.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from matchbox_spark.functions import hashing as H


def _py_row_hash(cols_vals: list[tuple[str, str]]) -> bytes:
    s = "".join(f"{c}{H.UNIT_SEP}{v}{H.RECORD_SEP}" for c, v in cols_vals)
    return hashlib.sha256(s.encode()).digest()


def _py_table_hash(rows: list[bytes]) -> bytes:
    buckets: dict[int, list[bytes]] = {}
    for h in rows:
        buckets.setdefault(int(h.hex()[:5], 16), []).append(h)
    acc = hashlib.sha256()
    for b in sorted(buckets):
        acc.update(hashlib.sha256(b"".join(sorted(buckets[b]))).digest())
    return acc.digest()


def test_row_hash_matches_reference_recipe(spark):
    df = spark.createDataFrame(
        [("alice", 1, None), ("bob", 2, 3.5)], "name string, n int, x double"
    )
    out = {
        r["name"]: r["h"]
        for r in df.withColumn(
            "h", H.row_hash_expr(df.schema, ["name", "n", "x"])
        ).collect()
    }
    assert out["alice"] == _py_row_hash([("name", "alice"), ("n", "1"), ("x", "\x00")])
    assert out["bob"] == _py_row_hash([("name", "bob"), ("n", "2"), ("x", "3.5")])


def test_row_hash_binary_and_array_normalisation(spark):
    df = spark.createDataFrame(
        [(bytearray(b"\xde\xad"), ["b", "a"])], "b binary, arr array<string>"
    )
    got = df.select(H.row_hash_expr(df.schema, ["b", "arr"]).alias("h")).collect()[0][
        "h"
    ]
    # binary → lowercase hex, list → ","-join
    assert got == _py_row_hash([("b", "dead"), ("arr", "b,a")])


def test_row_hash_null_normalisation_matches_reference(spark):
    """Reference parity for nulls (ref hash.py:93-107): a NULL binary is
    filled BEFORE hex-encoding ("00", not the raw sentinel); a null
    ELEMENT nulls the whole array join (sentinel) instead of being
    silently dropped — ["a", null] must NOT collide with ["a"]; a null
    struct FIELD stays in the JSON."""
    df = spark.createDataFrame(
        [(None, ["a", None], ("x", None)), (bytearray(b"\xde"), ["a"], ("x", 1))],
        "b binary, arr array<string>, s struct<p: string, q: int>",
    )
    rows = df.withColumn(
        "h", H.row_hash_expr(df.schema, ["b", "arr", "s"])
    ).collect()
    assert rows[0]["h"] == _py_row_hash(
        [("b", "00"), ("arr", "\x00"), ("s", '{"p":"x","q":null}')]
    )
    assert rows[1]["h"] == _py_row_hash(
        [("b", "de"), ("arr", "a"), ("s", '{"p":"x","q":1}')]
    )
    # the collision the dropped-null join would create
    assert rows[0]["h"] != rows[1]["h"]


def test_table_hash_row_and_column_order_invariant(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    b = spark.createDataFrame([(2, "y"), (1, "x")], "id long, v string").select(
        "v", "id"
    )
    assert H.hash_table(a) == H.hash_table(b)
    # and matches the pure-python recipe
    rows = [
        _py_row_hash([("id", "1"), ("v", "x")]),
        _py_row_hash([("id", "2"), ("v", "y")]),
    ]
    assert H.hash_table(a) == _py_table_hash(rows)


def test_table_hash_partitioning_invariant(spark):
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    assert H.hash_table(df.repartition(1)) == H.hash_table(df.repartition(13))


def test_table_hash_empty(spark):
    df = spark.createDataFrame([], "id long")
    assert H.hash_table(df) == H.EMPTY_TABLE_HASH


def test_model_results_hash_pair_order_invariant(spark):
    e1 = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.8)], "left_id long, right_id long, score double"
    )
    e2 = spark.createDataFrame(
        [(2, 1, 0.9), (4, 3, 0.8)], "left_id long, right_id long, score double"
    )
    assert H.hash_model_results(e1) == H.hash_model_results(e2)
    e3 = spark.createDataFrame(
        [(1, 2, 0.9), (3, 4, 0.7)], "left_id long, right_id long, score double"
    )
    assert H.hash_model_results(e1) != H.hash_model_results(e3)


def test_cluster_hash_invariances(spark):
    base = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20)], "parent_id long, child_id long"
    )
    relabeled = spark.createDataFrame(
        [(7, 20), (9, 11), (9, 10)], "parent_id long, child_id long"
    )
    different = spark.createDataFrame(
        [(1, 10), (2, 11), (2, 20)], "parent_id long, child_id long"
    )
    assert H.hash_clusters(base) == H.hash_clusters(relabeled)
    assert H.hash_clusters(base) != H.hash_clusters(different)


def test_cluster_hash_duplicate_clusters_and_nulls(spark):
    # two distinct parents with identical member sets are a different
    # clustering than one parent with that member set (multiset semantics)
    dup = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11)], "parent_id long, child_id long"
    )
    single = spark.createDataFrame(
        [(1, 10), (1, 11)], "parent_id long, child_id long"
    )
    assert H.hash_clusters(dup) != H.hash_clusters(single)
    # null members are preserved, not dropped
    with_null = spark.createDataFrame(
        [(1, 10), (1, None)], "parent_id long, child_id long"
    )
    just_ten = spark.createDataFrame([(1, 10)], "parent_id long, child_id long")
    assert H.hash_clusters(with_null) != H.hash_clusters(just_ten)


def test_leaf_set_hash_expr_matches_python(spark):
    h1, h2 = hashlib.sha256(b"a").digest(), hashlib.sha256(b"b").digest()
    expected = H.hash_cluster_leaves([h1, h2])
    df = spark.createDataFrame([([h2, h1],)], "leaves array<binary>")
    got = df.select(H.leaf_set_hash_expr(F.col("leaves")).alias("h")).collect()[0]["h"]
    assert got == expected


def test_hash_values_order_insensitive():
    assert H.hash_values("a", "b") == H.hash_values("b", "a")
    with pytest.raises(TypeError):
        H.hash_values("a", 1)


def test_base64_roundtrip():
    d = hashlib.sha256(b"x").digest()
    assert H.base64_to_hash(H.hash_to_base64(d)) == d


def test_unordered_fingerprint_invariant(spark):
    df = spark.range(0, 500).withColumn("v", F.col("id") % 7)
    assert H.hash_table_unordered(df.repartition(7)) == H.hash_table_unordered(
        df.repartition(2)
    )

def test_table_hash_tree_fold_matches_python_many_buckets(spark):
    """1000 rows land in ~1000 distinct 20-bit buckets — pins the executor
    tree fold (bucket → sorted sha256 fold → ordered driver fold) against
    the pure-Python re-derivation at multi-bucket scale."""
    df = spark.range(0, 1000).withColumn(
        "v", F.concat(F.lit("row-"), F.col("id"))
    )
    rows = [
        _py_row_hash([("id", str(i)), ("v", f"row-{i}")]) for i in range(1000)
    ]
    assert H.hash_table(df.repartition(13)) == _py_table_hash(rows)


def test_table_hash_rejects_non_sha256():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sha256"):
        H.hash_table(None, method="xxhash64")
