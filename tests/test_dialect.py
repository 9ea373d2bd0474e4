"""Lite DuckDB→Spark transpiler tests, including execution through the
cleaning path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from matchbox_spark.functions.dialect import DialectError, transpile_duckdb_lite


def test_postfix_casts():
    assert (
        transpile_duckdb_lite("x::BIGINT + 1")
        == "CAST(x AS BIGINT) + 1"
    )
    assert (
        transpile_duckdb_lite("(a + b)::DOUBLE")
        == "CAST((a + b) AS DOUBLE)"
    )
    assert (
        transpile_duckdb_lite("v::UBIGINT") == "CAST(v AS BIGINT)"
    )
    assert (
        transpile_duckdb_lite("x::VARCHAR || 'a'") == "CAST(x AS STRING) || 'a'"
    )


def test_function_renames_and_strftime():
    assert (
        transpile_duckdb_lite("array_to_string(list_sort(xs), ',')")
        == "array_join(array_sort(xs), ',')"
    )
    assert (
        transpile_duckdb_lite("strftime(ts, '%Y-%m-%d %H:%M:%S')")
        == "date_format(ts, 'yyyy-MM-dd HH:mm:ss')"
    )
    assert transpile_duckdb_lite("len(x)") == "length(x)"


def test_regexp_replace_global_flag():
    # 'g' flag dropped (Spark replaces globally); backslash doubled so the
    # regex survives Spark SQL's literal escaping
    assert (
        transpile_duckdb_lite(r"regexp_replace(s, '\s+', ' ', 'g')")
        == r"regexp_replace(s, '\\s+', ' ')"
    )


def test_unsupported_raises():
    with pytest.raises(DialectError):
        transpile_duckdb_lite("list_dot_product(a, b)")


def test_duckdb_cleaning_executes_through_query_layer(spark):
    """A DuckDB-dialect cleaning dict runs on Spark via the lite transpiler."""
    from matchbox_spark.plans.query import _transpile

    df = spark.createDataFrame(
        [(1, "  Foo   Ltd  ", "2024-03-05 10:11:12")],
        "id long, name string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    expr = _transpile(
        r"lower(trim(regexp_replace(name, '\s+', ' ', 'g')))"
    )
    day = _transpile("strftime(ts, '%Y-%m-%d')")
    out = df.selectExpr(f"{expr} AS name_clean", f"{day} AS day").first()
    assert out["name_clean"] == "foo ltd"
    assert out["day"] == "2024-03-05"
