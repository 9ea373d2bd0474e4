"""Lite DuckDB → Spark SQL expression translation.

The reference stores user cleaning/comparison expressions in DuckDB dialect
(queries.py:311-316 transpiles via sqlglot). sqlglot isn't in this
environment, so this module covers the commonly-used surface with a
conservative token-level rewriter; when sqlglot IS installed the query layer
prefers it. Handled:

- ``expr::TYPE`` postfix casts → ``CAST(expr AS TYPE)`` (parenthesised and
  simple operands)
- function renames: ``list_*`` → ``array_*`` family, ``string_split`` /
  ``string_split_regex``, ``strftime`` → ``date_format`` with format
  conversion (%Y-%m-%d … → yyyy-MM-dd …), ``len`` → ``length``,
  ``list_dot_product`` has no Spark twin and raises.
- 4-arg ``regexp_replace(x, p, r, 'g')`` → Spark's (global) 3-arg form.

Unknown constructs pass through unchanged — Spark raises its own analysis
error, which names the offending snippet.
"""

from __future__ import annotations

import re

_FN_RENAMES = {
    "list_sort": "array_sort",
    "list_distinct": "array_distinct",
    "list_contains": "array_contains",
    "list_intersect": "array_intersect",
    "list_concat": "concat",
    "list_append": "array_append",
    "list_filter": "filter",
    "list_transform": "transform",
    "array_to_string": "array_join",
    "string_split_regex": "split",
    "string_split": "split",
    "str_split": "split",
    "len": "length",
    "strlen": "length",
    "list_value": "array",
    "regexp_matches": "rlike",
    "any_value": "any_value",
    # DuckDB's len()/length() are polymorphic (strings AND lists); Spark
    # splits them (length=string, size=array). The token rewriter cannot
    # see types, so len→length keeps STRING semantics and array lengths
    # must be written as array_length() (unambiguously array-typed in
    # DuckDB) — pinned in tests/test_dialect_fuzz.py.
    "array_length": "size",
}

_UNSUPPORTED = {"list_dot_product", "list_cosine_similarity", "unnest"}

_STRFTIME_MAP = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%f", "SSSSSS"),
    ("%j", "DDD"), ("%a", "EEE"), ("%b", "MMM"),
]

_CAST_RE = re.compile(
    r"(\((?:[^()]|\([^()]*\))*\)|\b[\w.']+)\s*::\s*([A-Za-z]+(?:\(\s*\d+(?:\s*,\s*\d+)?\s*\))?(?:\[\])?)"
)

_TYPE_RENAMES = {
    "UBIGINT": "BIGINT", "UINTEGER": "BIGINT", "USMALLINT": "INT",
    "UTINYINT": "INT", "REAL": "FLOAT", "VARCHAR": "STRING",
    "BLOB": "BINARY", "DOUBLE[]": "ARRAY<DOUBLE>", "FLOAT[]": "ARRAY<FLOAT>",
}


class DialectError(ValueError):
    """Raised when an expression uses constructs with no Spark equivalent."""


def _convert_strftime_format(fmt: str) -> str:
    out = fmt
    for a, b in _STRFTIME_MAP:
        out = out.replace(a, b)
    return out


def transpile_duckdb_lite(expr: str) -> str:
    """Best-effort DuckDB→Spark expression rewrite (see module docstring)."""
    out = expr

    for fn in _UNSUPPORTED:
        if re.search(rf"(?i)\b{fn}\s*\(", out):
            raise DialectError(
                f"{fn}() has no direct Spark SQL equivalent; rewrite the "
                "expression with Spark functions"
            )

    # postfix casts (repeat to handle chains)
    for _ in range(5):
        new = _CAST_RE.sub(
            lambda m: f"CAST({m.group(1)} AS "
            f"{_TYPE_RENAMES.get(m.group(2).upper(), m.group(2).upper())})",
            out,
        )
        if new == out:
            break
        out = new

    # strftime(x, '%…') → date_format(x, 'spark fmt') (swallows the rename)
    def _strf(m: re.Match) -> str:
        return f"date_format({m.group(1)}, '{_convert_strftime_format(m.group(2))}')"

    out = re.sub(
        r"(?i)\bstrftime\s*\(\s*([^,]+?)\s*,\s*'([^']*)'\s*\)", _strf, out
    )

    # 4-arg regexp_replace(x, p, r, 'g') → 3-arg (Spark replaces globally)
    out = re.sub(
        r"(?i)(\bregexp_replace\s*\((?:[^()']|'[^']*'|\([^()]*\))*),\s*'g'\s*\)",
        r"\1)",
        out,
    )

    # function renames (word-boundary, only when called)
    for old, new in _FN_RENAMES.items():
        out = re.sub(rf"(?i)\b{old}\s*\(", f"{new}(", out)

    # DuckDB string literals are escape-free; Spark SQL consumes C-style
    # backslash escapes — double every backslash inside single-quoted
    # literals so regexes survive verbatim
    out = re.sub(
        r"'([^']*)'",
        lambda m: "'" + m.group(1).replace("\\", "\\\\") + "'",
        out,
    )

    return out
