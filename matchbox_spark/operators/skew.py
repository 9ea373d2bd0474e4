"""Skew-mitigation primitives: salted two-phase aggregation.

At 100 TB a handful of hot keys (one viral user, one boilerplate document
hash) can pin an entire ``groupBy`` behind a single straggler task. The
classic fix is salting: split each hot key into ``n_salts`` sub-keys for a
partial aggregate, then re-aggregate the partials — two narrow shuffles
whose largest task is ``1/n_salts`` of the hot key, instead of one shuffle
with an unbounded straggler.

Spark's map-side partial aggregation already does this implicitly for
algebraic aggregates when upstream partitions are well-mixed; explicit
salting matters when the input arrives PRE-PARTITIONED on the skewed key
(bucketed tables, post-join hash partitioning), where map-side combine
cannot help because every occurrence of the hot key sits in one partition.
The helpers here make that recovery explicit and testable: results are
bit-identical to the unsalted aggregate (pinned by a SQL oracle), only the
physical shuffle shape changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def default_salt(n_salts: int) -> Column:
    """Uniform per-row salt independent of row content: identical duplicate
    rows spread across buckets (content hashes would collapse them onto
    one). Nondeterministic across recomputation — safe only for the partial
    stage of a two-phase aggregate, where the merge erases bucket layout."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Two-phase aggregation: ``groupBy(keys + salt)`` partials, then
    ``groupBy(keys)`` merge.

    ``aggs`` maps output column → ``(input_column, fn)`` where ``fn`` is one
    of ``count`` / ``sum`` / ``min`` / ``max`` (the algebraic aggregates
    whose partial-merge is the same function; ``count`` merges with
    ``sum``). ``salt_expr`` defaults to a uniform per-row draw INDEPENDENT
    of row content (a hash of the monotonic row id): hashing row values
    would send fully-identical duplicate rows of a hot key — viral
    boilerplate, the exact case this module exists for — to one salt
    bucket and leave the straggler intact. The default salt is therefore
    nondeterministic across recomputation, which only affects the partial
    stage: the merge re-aggregates, so the result is bit-identical
    regardless of how rows landed in salt buckets. Pass ``salt_expr`` over
    a high-cardinality column (an event id) for a deterministic spread.
    """
    allowed = {"count", "sum", "min", "max"}
    for out, (_, fn) in aggs.items():
        if fn not in allowed:
            raise ValueError(f"{out}: unsupported salted aggregate {fn!r}")
    salt = salt_expr if salt_expr is not None else default_salt(n_salts)
    partial_cols = []
    merge_cols = []
    for out, (col, fn) in aggs.items():
        p = f"_p_{out}"
        if fn == "count":
            partial_cols.append(F.count(col if col != "*" else F.lit(1)).alias(p))
            merge_cols.append(F.sum(p).alias(out))
        else:
            partial_cols.append(getattr(F, fn)(col).alias(p))
            merge_cols.append(getattr(F, "sum" if fn == "sum" else fn)(p).alias(out))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*partial_cols)
    )
    return partial.groupBy(*keys).agg(*merge_cols)
