"""Lite-dialect property tests (VERDICT r12 #9).

Two layers:

1. **Cross-engine semantic equivalence** (always runs): for every
   expression in the cleaning-expression corpus, DuckDB executes the
   ORIGINAL DuckDB-dialect text and Spark executes the lite-transpiled
   text over the same rows — values must agree. This checks the thing
   the token table exists for (semantics), not the rewrite's spelling,
   and needs no sqlglot.

2. **sqlglot divergence pin** (skips when sqlglot is absent — it is not
   installable in this environment): transpile each corpus expression
   with sqlglot(duckdb→spark) and with the lite rewriter, execute BOTH
   through Spark, and require equal results. Spelling may differ;
   results may not.

Documented unsupported forms (lite raises DialectError, by design):
``list_dot_product`` / ``list_cosine_similarity`` / ``unnest`` — no
single-expression Spark equivalent; the query layer surfaces the
snippet. Expressions outside the corpus shapes pass through for Spark
to validate — silent-mistranslation coverage lives in the corpus below,
which spans every rewrite rule in ``_FN_RENAMES`` / casts / strftime /
regexp flags / literal escaping.

Documented ENGINE divergences this sweep found (pinned below — these
are semantic differences between the engines themselves, which no
expression-level rewrite can reconcile; corpus authors must avoid the
divergent inputs or rewrite deliberately):

- ``array_to_string([] , sep)``: DuckDB → NULL, Spark ``array_join`` →
  ``''``.
- fractional → BIGINT casts: DuckDB rounds DOUBLE half-to-even
  (15.5 → 16, 14.5 → 14) and DECIMAL half-away (14.5 → 15); Spark ANSI
  CAST truncates toward zero (15.5 → 15). ROUND() explicitly.
- list subscripts: DuckDB ``xs[1]`` is 1-based; Spark ``xs[1]`` is
  0-based AND raises under ANSI when out of bounds — use
  ``element_at(xs, 1)`` (1-based, NULL-tolerant via ``try_element_at``).
- ``len()``/``length()`` are polymorphic in DuckDB (strings and lists);
  Spark's ``length`` is string-only. The lite rewrite keeps string
  semantics; write array lengths as ``array_length()`` (→ ``size``).
"""

from __future__ import annotations

import duckdb
import pytest

from matchbox_spark.functions.dialect import transpile_duckdb_lite

# (expression, needs) — the corpus covers every rewrite rule the lite
# table owns, in realistic cleaning shapes. `needs` names the columns so
# both engines select only what the expression uses.
CORPUS: list[str] = [
    # postfix casts, incl. chains and parenthesised operands
    "id::VARCHAR",
    "(id + 1)::DOUBLE",
    "id::UBIGINT + 1",
    "(id * 3)::BIGINT - id::BIGINT",
    # function renames — array family (empty-list array_to_string is a
    # pinned engine divergence, so join only after append keeps it
    # non-empty on every row)
    "list_contains(xs, 'b')",
    "array_length(list_sort(xs))",
    "array_length(list_distinct(xs))",
    "array_length(list_intersect(xs, xs))",
    "array_to_string(list_append(xs, 'z'), '-')",
    "array_to_string(list_append(list_concat(xs, xs), 'z'), '+')",
    # string functions
    "len(name)",
    "lower(trim(name))",
    "upper(name) || '-' || id::VARCHAR",
    # regexp family: global flag + backslash-literal escaping
    r"regexp_replace(name, '\s+', ' ', 'g')",
    r"regexp_replace(name, '[0-9]+', '#', 'g')",
    r"lower(trim(regexp_replace(name, '\s+', ' ', 'g')))",
    "regexp_matches(name, '^F')",
    # strftime → date_format
    "strftime(ts, '%Y-%m-%d')",
    "strftime(ts, '%Y-%m-%d %H:%M:%S')",
    "strftime(ts, '%d/%m/%y')",
    # mixed realistic cleaning expressions
    "coalesce(nullif(trim(name), ''), 'unknown')",
    "substr(name, 1, 3) || '*'",
    "case when id % 2 = 0 then 'even' else 'odd' end",
]

ROWS = [
    (1, "  Foo   Ltd  ", 19.5, ["b", "a", "b"], "2024-03-05 10:11:12"),
    (2, "Bar-99  Inc", 0.0, ["z"], "1999-12-31 23:59:59"),
    (3, "", 7.25, [], "2024-01-01 00:00:00"),
]
SCHEMA_SQL = (
    "SELECT * FROM (VALUES "
    + ", ".join(
        f"({i}, '{n}', {p}, {ls}, TIMESTAMP '{t}')"
        for i, n, p, xs, t in ROWS
        for ls in [("LIST_VALUE(" + ", ".join(f"'{x}'" for x in xs) + ")")
                   if xs else "LIST_VALUE()::VARCHAR[]"]
    )
    + ") AS t(id, name, price, xs, ts)"
)


def _norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    return v


@pytest.fixture(scope="module")
def spark_df(spark):
    return spark.createDataFrame(
        ROWS, "id long, name string, price double, xs array<string>, ts_s string"
    ).selectExpr("id", "name", "price", "xs", "CAST(ts_s AS timestamp) AS ts")


@pytest.mark.parametrize("expr", CORPUS)
def test_lite_transpile_matches_duckdb_semantics(spark, spark_df, expr):
    con = duckdb.connect()
    want = [
        _norm(r[0])
        for r in con.execute(
            f"SELECT {expr} FROM ({SCHEMA_SQL}) ORDER BY id"
        ).fetchall()
    ]
    got = [
        _norm(r[0])
        for r in spark_df.orderBy("id")
        .selectExpr(f"{transpile_duckdb_lite(expr)} AS v")
        .collect()
    ]
    assert got == want, f"{expr!r}: spark={got} duckdb={want}"


def test_divergence_subscripts_one_vs_zero_based(spark):
    """DuckDB list subscripts are 1-based; Spark array subscripts are
    0-based (and ANSI-raise out of bounds). The lite rewriter does NOT
    rewrite subscripts — corpus authors must use element_at (1-based)
    deliberately."""
    con = duckdb.connect()
    duck = con.execute("SELECT string_split('a b', ' ')[1]").fetchone()[0]
    assert duck == "a"  # DuckDB: 1-based
    row = spark.sql(
        "SELECT split('a b', ' ')[1] AS zero_based, "
        "element_at(split('a b', ' '), 1) AS one_based"
    ).first()
    assert row["zero_based"] == "b"  # Spark: 0-based
    assert row["one_based"] == "a"   # the rewrite corpus authors want


def test_divergence_empty_list_join(spark):
    """DuckDB array_to_string on an EMPTY list returns NULL; Spark's
    array_join returns ''. Pinned, not reconciled."""
    con = duckdb.connect()
    duck = con.execute(
        "SELECT array_to_string(LIST_VALUE()::VARCHAR[], ',')"
    ).fetchone()[0]
    assert duck is None
    got = spark.sql(
        "SELECT array_join(array(), ',') AS v"
    ).first()["v"]
    assert got == ""


def test_divergence_fractional_to_bigint_cast(spark):
    """DuckDB rounds DOUBLE→BIGINT half-to-even (14.5→14, 15.5→16) and
    DECIMAL→BIGINT half-away (14.5→15); Spark ANSI CAST truncates toward
    zero (14.5→14, 15.5→15). Pinned, not reconciled — cleaning
    expressions must ROUND() explicitly before casting."""
    con = duckdb.connect()
    assert con.execute(
        "SELECT 14.5::DOUBLE::BIGINT, 15.5::DOUBLE::BIGINT, 14.5::BIGINT"
    ).fetchone() == (14, 16, 15)
    row = spark.sql(
        "SELECT CAST(CAST(14.5 AS DOUBLE) AS BIGINT) AS a, "
        "CAST(CAST(15.5 AS DOUBLE) AS BIGINT) AS b"
    ).first()
    assert (row["a"], row["b"]) == (14, 15)


@pytest.mark.parametrize("expr", CORPUS)
def test_lite_agrees_with_sqlglot_execution(spark, spark_df, expr):
    sqlglot = pytest.importorskip("sqlglot", reason="sqlglot not installed")
    via_sqlglot = sqlglot.transpile(expr, read="duckdb", write="spark")[0]
    via_lite = transpile_duckdb_lite(expr)
    a = spark_df.orderBy("id").selectExpr(f"{via_sqlglot} AS v").collect()
    b = spark_df.orderBy("id").selectExpr(f"{via_lite} AS v").collect()
    assert [_norm(r["v"]) for r in a] == [_norm(r["v"]) for r in b], expr
