"""Deterministic sf1 derivation: 10x sf0.1, written under .localdata/sf1.

The driver provides sf{0.001,0.01,0.1} read-only; this tool derives the
next scale rung for the VERDICT r8 item-3 scaling measurement without
touching /root/testdata. Derivation = 10 key-offset copies of every sf0.1
fact table, so value DISTRIBUTIONS are identical and only cardinality
grows — the property a scaling bench needs:

- fact keys shift by copy * (max_key + 1), foreign keys consistently
  (orders.o_custkey tracks customer, lineitem tracks orders/part/supplier)
- region/nation stay fixed (TPC-H semantics: dimension tables don't scale)
- document TOKENS are renamed per copy (token -> token_cpK): within-copy
  near-duplicate structure is preserved EXACTLY (every shingle renames
  1:1) while cross-copy shingle overlap is destroyed — so MinHash/LSH
  candidate volume scales like a real 10x corpus instead of like 10
  exact replicas. (A copy-keyed token SORT was tried first and rejected:
  sorting concentrates the shared vocabulary of UNRELATED docs into
  shared bigrams, manufacturing ~33x fake near-dup candidates per copy.)
- embedding vectors rotate components by the copy index: norms and
  within-copy neighbour structure preserved, cross-copy collisions
  decorrelated

Usage: python tools/make_sf1.py [out_dir]  (default /root/repo/.localdata/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 10
SRC = "/root/testdata/sf0.1"

# (table, [key columns to offset]) — offsets are per-key-column max+1 from
# the SOURCE table that owns the key, so FKs stay consistent
_KEY_OWNERS = {
    "c": ("customer", "c_custkey"),
    "s": ("supplier", "s_suppkey"),
    "p": ("part", "p_partkey"),
    "o": ("orders", "o_orderkey"),
    "e": ("events", "event_id"),
    "u": ("events", "user_id"),
    "d": ("documents", "doc_id"),
    "v": ("embeddings", "vec_id"),
}

_TABLE_KEYS = {
    "customer": [("c_custkey", "c")],
    "supplier": [("s_suppkey", "s")],
    "part": [("p_partkey", "p")],
    "orders": [("o_orderkey", "o"), ("o_custkey", "c")],
    "lineitem": [
        ("l_orderkey", "o"),
        ("l_partkey", "p"),
        ("l_suppkey", "s"),
    ],
    "events": [("event_id", "e"), ("user_id", "u")],
    "documents": [("doc_id", "d")],
    "embeddings": [("vec_id", "v")],
}


def main(out_dir: str) -> int:
    from pyspark.sql import functions as F

    from matchbox_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    offsets = {}
    for tag, (table, col) in _KEY_OWNERS.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        offsets[tag] = int(df.agg(F.max(col)).collect()[0][0]) + 1
    dim = len(
        spark.read.parquet(f"{SRC}/embeddings.parquet")
        .select("embedding").first()[0]
    )

    for table in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{table}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{table}.parquet")
        print(f"{table}: copied (fixed dimension)")

    for table, keys in _TABLE_KEYS.items():
        base = spark.read.parquet(f"{SRC}/{table}.parquet")
        parts = []
        for k in range(COPIES):
            df = base
            for col, tag in keys:
                df = df.withColumn(
                    col, (F.col(col) + F.lit(k * offsets[tag])).cast("long")
                )
            if table == "documents" and k > 0:
                shuffled = (
                    f"array_join(transform("
                    f"filter(split(text, '\\\\s+'), x -> x <> ''),"
                    f" t -> concat(t, '_cp{k}')), ' ')"
                )
                df = df.withColumn("text", F.expr(shuffled)).withColumn(
                    "n_chars", F.length("text").cast(
                        base.schema["n_chars"].dataType
                    )
                )
            if table == "embeddings" and k > 0:
                r = k % dim
                df = df.withColumn(
                    "embedding",
                    F.expr(
                        f"concat(slice(embedding, {r + 1}, {dim - r}), "
                        f"slice(embedding, 1, {r}))"
                    ),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.repartition(32).write.mode("overwrite").parquet(
            f"{out_dir}/{table}.parquet"
        )
        n = spark.read.parquet(f"{out_dir}/{table}.parquet").count()
        print(f"{table}: {n} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
    raise SystemExit(main(out))
