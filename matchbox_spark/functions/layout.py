"""Data-layout functions: Z-order (Morton) interleaving for clustered writes.

At 100 TB the cheapest query is the one that never reads: parquet files
carry per-column min/max stats, and a scan prunes any file whose range
misses the predicate. Sorting by ONE column gives perfect pruning on that
column and none on others; interleaving the bits of two columns (the
Z-order curve — what Delta's OPTIMIZE ZORDER BY computes) gives useful
pruning on BOTH, because each file's rows become a small bounding box in
(a, b) space instead of a stripe.

Everything here is a pure codegen expression (shift/mask with literal
counts — whole-stage-codegen friendly, no UDF) feeding
``repartitionByRange`` + an in-partition sort, which is exactly the
cluster-then-write shape a layout job runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zvalue_expr(col_a, col_b, bits: int = 16) -> F.Column:
    """Morton Z-value of two NON-NEGATIVE ints: the low ``bits`` bits of
    each interleave (a's bit i lands at 2i, b's at 2i+1), so nearby (a, b)
    points share Z-prefixes. 2·bits ≤ 62 keeps the result in a positive
    long. Values beyond ``bits`` bits alias (the caller scales/buckets
    first — raw coordinates should be quantised to the bit budget)."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError("bits must be in [1, 31]")
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    a = a.cast("long")
    b = b.cast("long")
    terms = []
    for i in range(bits):
        # ((x >> i) & 1) << target — literal shift counts, pure codegen
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster rows along the Z-curve of two columns: range-partition on
    the Z-value, then sort within partitions — the write-side layout job.
    Each output partition (→ parquet file) covers a compact (a, b)
    bounding box, so min/max stats prune scans that filter on EITHER or
    BOTH columns. Columns must be non-negative ints quantised to
    ``bits`` (bucket floats first, e.g. ``floor(lat * 100)``)."""
    z = zvalue_expr(col_a, col_b, bits).alias("_z")
    with_z = df.withColumn("_z", z)
    parted = (
        with_z.repartitionByRange(num_partitions, "_z")
        if num_partitions
        else with_z.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")
