"""Distributed dense-index assignment (JVM-side zip-with-index).

One pattern, two users (catalog id assignment, `merge_clusterings`
component relabelling): partition rows by a key whose sorted values give a
total order, count rows per partition value (a scale-independent
≤|partitions| driver transfer), fold offsets driver-side, then the dense
index is a per-partition ``row_number`` plus a broadcast offset. No global
window over the data and no Python RDD round-trip — the shape the
reference's `with_row_index` (hash.py:244) needs at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_index(
    df: DataFrame,
    part_col: str,
    order_col: str,
    counts: dict[int, int],
    base: int = 0,
    id_name: str = "_idx",
) -> tuple[DataFrame, int]:
    """Add ``id_name`` = dense 1-based index + ``base`` over rows ordered
    by (sorted ``part_col`` value, ``order_col`` within the partition).

    ``counts`` maps partition value → row count (callers usually already
    have it from a stats job, or collect one tiny ``groupBy(part_col)``
    count). Returns ``(df_with_id, total_rows)``; all other columns ride
    along unchanged. Determinism requires ``part_col`` to be stable across
    re-reads (a content-derived bucket, or a checkpointed
    ``spark_partition_id``).
    """
    spark = df.sparkSession
    offsets, acc = {}, 0
    for k in sorted(counts):
        offsets[k] = acc
        acc += counts[k]
    off_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in offsets.items()] or [(0, 0)],
        f"{part_col} int, _off long",
    )
    w = Window.partitionBy(part_col).orderBy(order_col)
    out = (
        df.join(F.broadcast(off_df), part_col)
        .withColumn(
            id_name, F.row_number().over(w) + F.col("_off") + F.lit(int(base))
        )
        .drop("_off")
    )
    return out, acc
