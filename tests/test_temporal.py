"""As-of join semantics (operators.temporal)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from matchbox_spark.operators.temporal import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), "l1"),
            (1, datetime(2024, 1, 1, 12, 0), "l2"),
            (2, datetime(2024, 1, 1, 9, 0), "l3"),
        ],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 30), 10.0),
            (1, datetime(2024, 1, 1, 10, 0), 20.0),
            (1, datetime(2024, 1, 1, 11, 0), 30.0),
            (2, datetime(2024, 1, 1, 9, 30), 99.0),
        ],
        "k long, ts timestamp, value double",
    )
    return left, right


def test_asof_basic(spark):
    left, right = _frames(spark)
    got = {
        r["name"]: r["r_value"]
        for r in asof_join(left, right, on="k").collect()
    }
    # l1 at 10:00 sees the equal-ts right row (20); l2 sees 11:00 (30);
    # l3 predates every right row → null
    assert got == {"l1": 20.0, "l2": 30.0, "l3": None}


def test_asof_strict(spark):
    left, right = _frames(spark)
    got = {
        r["name"]: r["r_value"]
        for r in asof_join(left, right, on="k", strict=True).collect()
    }
    # strict: l1 at 10:00 must NOT see the 10:00 row → falls back to 9:30
    assert got == {"l1": 10.0, "l2": 30.0, "l3": None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        r["name"]: r["r_value"]
        for r in asof_join(
            left, right, on="k", tolerance="30 minutes"
        ).collect()
    }
    # l2 at 12:00: latest right is 11:00 — outside the 30 min window → null
    assert got == {"l1": 20.0, "l2": None, "l3": None}


def test_asof_left_columns_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k")
    assert out.columns == ["k", "ts", "name", "r_value"]
    assert out.count() == left.count()


def test_range_join_banded(spark):
    from matchbox_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0), "l1"),
            (2, datetime(2024, 1, 1, 10, 0), "l2"),
        ],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 55), "in-before"),
            (1, datetime(2024, 1, 1, 10, 5), "in-after"),
            (1, datetime(2024, 1, 1, 10, 11), "out"),
            (2, datetime(2024, 1, 1, 10, 0), "exact"),
        ],
        "k long, ts timestamp, tag string",
    )
    got = {
        (r["name"], r["r_tag"])
        for r in range_join(
            left, right, tolerance_s=600, on="k", value_cols=["tag"]
        ).collect()
    }
    assert got == {("l1", "in-before"), ("l1", "in-after"), ("l2", "exact")}


def test_range_join_no_duplicate_pairs(spark):
    from matchbox_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), "l")], "k long, ts timestamp, n string"
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 10, 0), "r")], "k long, ts timestamp, tag string"
    )
    out = range_join(left, right, tolerance_s=60, on="k", value_cols=["tag"])
    assert out.count() == 1


def test_asof_matches_pandas_merge_asof(spark):
    """Randomized cross-check against pandas' reference merge_asof."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 20, n_l),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_100_000, n_l), unit="s"
            ),
            "lid": np.arange(n_l),
        }
    ).sort_values("ts", ignore_index=True)
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 20, n_r),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_100_000, n_r), unit="s"
            ),
            "val": rng.random(n_r).round(6),
        }
    ).sort_values("ts", ignore_index=True)
    # merge_asof is ambiguous on duplicate (k, ts) right rows; drop them
    rpd = rpd.drop_duplicates(subset=["k", "ts"], keep="last")

    expected = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    exp = {
        int(r.lid): (None if pd.isna(r.val) else round(float(r.val), 6))
        for r in expected.itertuples()
    }

    got_df = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on="k",
        value_cols=["val"],
    )
    got = {
        int(r["lid"]): (None if r["r_val"] is None else round(r["r_val"], 6))
        for r in got_df.collect()
    }
    assert got == exp


def test_range_join_matches_theta_join(spark):
    """Randomized cross-check: banded plan ≡ brute-force theta join."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_010_000, 200), unit="s"
            ),
            "lid": np.arange(200),
        }
    )
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_010_000, 200), unit="s"
            ),
            "rid": np.arange(200),
        }
    )
    tol = 137.0
    left, right = spark.createDataFrame(lpd), spark.createDataFrame(rpd)
    from matchbox_spark.operators.temporal import range_join
    from pyspark.sql import functions as F

    banded = {
        (r["lid"], r["r_rid"])
        for r in range_join(
            left, right, tolerance_s=tol, on="k", value_cols=["rid"]
        ).collect()
    }
    theta = {
        (r["lid"], r["rid"])
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("l.k") == F.col("r.k"))
            & (
                F.abs(
                    F.unix_micros(F.col("l.ts")) - F.unix_micros(F.col("r.ts"))
                )
                <= int(tol * 1_000_000)
            ),
        )
        .collect()
    }
    assert banded == theta and len(banded) > 50

def test_asof_matched_row_null_payload_carries_atomically(spark):
    """DuckDB/kdb ASOF semantics: the matched (latest) right row's NULL is
    the answer — an older non-null value must NOT leak forward, and multiple
    value columns must all come from the same matched row."""
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 12, 0), "l1")], "k long, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 10, 0), 10.0, "old"),
            (1, dt(2024, 1, 1, 11, 0), None, "new"),
        ],
        "k long, ts timestamp, value double, tag string",
    )
    row = asof_join(left, right, on="k").collect()[0]
    assert row["r_value"] is None  # matched row's null, not 10.0
    assert row["r_tag"] == "new"  # both columns from the SAME matched row


def test_asof_tolerance_uses_matched_row_ts(spark):
    """The tolerance gate compares against the ts of the row the values came
    from — with null payloads in range, values and gate stay consistent."""
    from datetime import datetime as dt

    left = spark.createDataFrame(
        [(1, dt(2024, 1, 1, 12, 0), "l1")], "k long, ts timestamp, name string"
    )
    right = spark.createDataFrame(
        [
            (1, dt(2024, 1, 1, 10, 0), 77.0),  # outside 30 min
            (1, dt(2024, 1, 1, 11, 45), None),  # matched, inside window
        ],
        "k long, ts timestamp, value double",
    )
    row = asof_join(left, right, on="k", tolerance="30 minutes").collect()[0]
    # matched row (11:45) is within tolerance; its value is null — NOT 77.0,
    # and NOT nulled-out-because-10:00-is-old either
    assert row["r_value"] is None


def test_range_join_rejects_zero_tolerance(spark):
    import pytest as _pytest

    from matchbox_spark.operators.temporal import range_join

    left = spark.createDataFrame([], "ts timestamp, k long")
    with _pytest.raises(ValueError, match="tolerance_s"):
        range_join(left, left, tolerance_s=0.0)
    with _pytest.raises(ValueError, match="tolerance_s"):
        range_join(left, left, tolerance_s=1e-9)


def test_asof_forward_matches_pandas_merge_asof(spark):
    """Randomized cross-check of direction='forward' against pandas."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lpd = pd.DataFrame(
        {
            "k": rng.integers(0, 20, n_l),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_100_000, n_l), unit="s"
            ),
            "lid": np.arange(n_l),
        }
    ).sort_values("ts", ignore_index=True)
    rpd = pd.DataFrame(
        {
            "k": rng.integers(0, 20, n_r),
            "ts": pd.to_datetime(
                rng.integers(1_700_000_000, 1_700_100_000, n_r), unit="s"
            ),
            "val": rng.random(n_r).round(6),
        }
    ).sort_values("ts", ignore_index=True)
    rpd = rpd.drop_duplicates(subset=["k", "ts"], keep="last")

    expected = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="forward")
    exp = {
        int(r.lid): (None if pd.isna(r.val) else round(float(r.val), 6))
        for r in expected.itertuples()
    }
    got_df = asof_join(
        spark.createDataFrame(lpd),
        spark.createDataFrame(rpd),
        on="k",
        value_cols=["val"],
        direction="forward",
    )
    got = {
        int(r["lid"]): (None if r["r_val"] is None else round(r["r_val"], 6))
        for r in got_df.collect()
    }
    assert got == exp


def test_asof_forward_tolerance(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:20:00", 5.0)], "k long, ts string, val double"
    ).withColumn("ts", F.to_timestamp("ts"))
    near = asof_join(left, right, on="k", value_cols=["val"],
                     direction="forward", tolerance="30 minutes").collect()
    far = asof_join(left, right, on="k", value_cols=["val"],
                    direction="forward", tolerance="10 minutes").collect()
    assert near[0]["r_val"] == 5.0 and far[0]["r_val"] is None


def test_asof_nearest_picks_closer_side_ties_backward(spark):
    from matchbox_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10.0), (2, 100.0)], "k int, ts double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, 8.0, "b"), (1, 11.0, "f"),      # forward is closer (1 < 2)
         (2, 95.0, "b"), (2, 105.0, "f")],   # tie (5 == 5) -> backward
        "k int, ts double, v string",
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = {
        r["k"]: r["r_v"]
        for r in asof_join(left, right, on="k", direction="nearest").collect()
    }
    assert out[1] == "f"
    assert out[2] == "b"


def test_asof_nearest_tolerance_and_missing(spark):
    from matchbox_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100.0), (3, 50.0)], "k int, ts double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, 10.0, "far")], "k int, ts double, v string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = {
        r["k"]: r["r_v"]
        for r in asof_join(
            left, right, on="k", direction="nearest", tolerance="30 seconds"
        ).collect()
    }
    assert out[1] is None  # 90s away, beyond the 30s tolerance
    assert out[3] is None  # key never matches
