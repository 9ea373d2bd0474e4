"""Z-order layout: Morton correctness and measured bounding-box shrink."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from matchbox_spark.functions.layout import zorder_layout, zvalue_expr


def _morton(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_reference_morton(spark):
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", zvalue_expr("a", "b", 4).alias("z")).collect()
    }
    for (a, b), z in got.items():
        assert z == _morton(a, b, 4), (a, b)


def test_zvalue_validation():
    with pytest.raises(ValueError, match="bits"):
        zvalue_expr("a", "b", 0)
    with pytest.raises(ValueError, match="bits"):
        zvalue_expr("a", "b", 32)


def test_zorder_prunes_the_secondary_dimension(spark):
    """The point of the layout, measured as a file-skipping proxy: under
    the natural (id-range = b-major) order every partition is a full-width
    stripe, so a filter on `a` alone intersects ALL partitions' min/max
    boxes; Z-ordering makes partitions square-ish tiles, so the same
    filter prunes most of them — while pruning on `b` stays as good. A
    64×64 grid into 16 partitions: natural = 64×4 stripes (a-filter hits
    16/16), Z = 16×16 tiles (a ≤ 7 hits ≤ 6)."""
    n = 64
    grid = spark.range(n * n).select(
        "id",
        (F.col("id") % n).alias("a"),
        (F.col("id") / n).cast("long").alias("b"),
    )

    def boxes(df):
        return (
            df.withColumn("_p", F.spark_partition_id())
            .groupBy("_p")
            .agg(
                F.min("a").alias("a0"), F.max("a").alias("a1"),
                F.min("b").alias("b0"), F.max("b").alias("b1"),
            )
            .collect()
        )

    def hit(bs, lo, hi, dim):
        d0, d1 = (f"{dim}0", f"{dim}1")
        return sum(1 for r in bs if not (r[d1] < lo or r[d0] > hi))

    nat = boxes(grid.repartitionByRange(16, "id"))
    zed_df = zorder_layout(grid.drop("id"), "a", "b", bits=6, num_partitions=16)
    zed = boxes(zed_df)
    # a ∈ [0, 7]: stripes can't prune, tiles can
    assert hit(nat, 0, 7, "a") == 16
    assert hit(zed, 0, 7, "a") <= 6, zed
    # b ∈ [0, 7]: z stays prunable on the other dimension too
    assert hit(zed, 0, 7, "b") <= 6, zed
    # and the layout loses no rows
    assert zed_df.count() == n * n


def test_zorder_plan_is_codegen_only(spark):
    df = spark.range(100).select(
        (F.col("id") % 10).alias("a"), (F.col("id") / 10).cast("long").alias("b")
    )
    plan = (
        zorder_layout(df, "a", "b", bits=4, num_partitions=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for flag in ("CartesianProduct", "BatchEvalPython"):
        assert flag not in plan
