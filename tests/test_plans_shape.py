"""Physical-plan shape regression tests.

These pin the optimizer behaviours the engine depends on at 100 TB: filters
reaching the parquet scan, column pruning, broadcast joins for small dims,
and the dedupe operator's single-shuffle shape. If a refactor breaks one of
these, correctness tests stay green but scale behaviour regresses — hence
explicit plan assertions.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_quantity") > 40)
        .select("l_orderkey", "l_quantity")
    )
    plan = _formatted_plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)" in plan


def test_column_pruning_in_source_index(spark, sf_dir):
    from matchbox_spark.sources.source import SourceConfig

    src = SourceConfig(
        name="c",
        location=f"{sf_dir}/customer.parquet",
        key_field="c_custkey",
        index_fields=["c_name", "c_mktsegment"],
    )
    plan = _formatted_plan(src.index(spark))
    # scan must read only the hash fields + key, not the whole row
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "c_name" in read_schema and "c_mktsegment" in read_schema
    assert "c_acctbal" not in read_schema and "c_nationkey" not in read_schema


def test_small_dim_join_broadcasts(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    joined = orders.join(customer, orders["o_custkey"] == customer["c_custkey"]).join(
        nation, customer["c_nationkey"] == nation["n_nationkey"]
    )
    plan = _formatted_plan(joined)
    assert "BroadcastHashJoin" in plan


def test_naive_dedupe_is_single_shuffle(spark, sf_dir):
    from matchbox_spark.operators.dedupers import NaiveDeduper

    df = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("id"), "c_nationkey", "c_mktsegment"
    )
    edges = NaiveDeduper(id="id", unique_fields=["c_nationkey", "c_mktsegment"]).dedupe(df)
    plan = _formatted_plan(edges)
    # groupBy-based pair generation: no self-join in the plan at all
    assert "Join" not in plan
    # bounded shuffles: the grouping agg + pair dedupe (vs 2 scans + a
    # shuffle join + dedupe for the naive self-join formulation)
    assert plan.count("Exchange") <= 4


def test_unified_query_no_forced_broadcast(spark, sf_dir):
    """The hierarchy projection must leave join strategy to Catalyst/AQE
    (assignments are unbounded at scale)."""
    import inspect

    from matchbox_spark.plans import query as q

    src = inspect.getsource(q.unified_query)
    assert "F.broadcast" not in src


def test_q6_scan_projects_three_columns(spark, sf_dir):
    import __spark_entry__ as e

    df = e.queries()["q6_forecast_revenue"](spark, sf_dir)
    plan = _formatted_plan(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_discount" in read_schema and "l_quantity" in read_schema
    assert "l_orderkey" not in read_schema and "l_shipdate" not in read_schema
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1].split("\n")[0]


def test_q4_semi_join_shape(spark, sf_dir):
    import __spark_entry__ as e

    plan = _formatted_plan(e.queries()["q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q19_is_union_of_broadcast_joins(spark, sf_dir):
    import __spark_entry__ as e

    plan = _formatted_plan(e.queries()["q19_disjunctive_join"](spark, sf_dir))
    # the OR→UNION rewrite: three broadcast equi-joins, no cross/NL join
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_q16_anti_join_broadcasts(spark, sf_dir):
    import __spark_entry__ as e

    plan = _formatted_plan(e.queries()["q16_supplier_count"](spark, sf_dir))
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    )


def test_minhash_dedupe_scans_text_once(spark, sf_dir):
    # the fused shape: signature minima + verification shingle sets come out
    # of ONE groupBy over one shingle explosion — the documents scan must
    # appear exactly once in the physical plan (the persisted per-doc compact
    # table feeds banding and both sides of the verification join)
    from matchbox_spark.operators.dedup import minhash_dedupe_pairs

    import re

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = minhash_dedupe_pairs(docs, "doc_id", "text", num_perm=8, bands=4)
    plan = _formatted_plan(df)
    # every InMemoryTableScan re-renders the cached relation's inner plan, so
    # count DISTINCT scan node ids, not textual occurrences
    scan_ids = set(re.findall(r"Scan parquet\s*\((\d+)\)", plan))
    assert len(scan_ids) <= 1, plan
    assert plan.count("InMemoryTableScan") >= 2, plan


def test_pack_documents_single_shuffle_and_pruned_scan(spark, sf_dir):
    from matchbox_spark.functions.text import token_count_expr
    from matchbox_spark.operators.curation import pack_documents

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", token_count_expr("text").alias("n_tokens")
    )
    out = pack_documents(d, "doc_id", "n_tokens", budget=512, n_shards=8)
    plan = _formatted_plan(out)
    # exactly one exchange over the data (on shard); the scan reads only
    # the two source columns
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_stratified_sample_single_shuffle(spark, sf_dir):
    from matchbox_spark.operators.curation import stratified_sample

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    out = stratified_sample(d, ["lang"], 5, "doc_id")
    plan = _formatted_plan(out)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in plan


def test_quantized_cosine_stays_in_codegen(spark, sf_dir):
    from matchbox_spark.functions.vectors import (
        dequantize_int8_expr,
        quantize_int8_expr,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", dequantize_int8_expr(quantize_int8_expr("embedding")).alias("dq")
    )
    plan = _formatted_plan(e)
    # expression-only: no exchange, no Python evaluation node
    assert "Exchange" not in plan
    assert "Python" not in plan  # no BatchEvalPython / ArrowEvalPython
