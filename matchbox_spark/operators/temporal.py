"""Temporal joins over event streams — as-of join as a composition of
built-in operators.

Spark has no native AS OF join (Delta/other engines bolt it on); the
classic scalable construction is the tagged merge: union both sides with a
side tag, sort within each join-key partition by (ts, tag), and carry the
most recent right-side ROW forward as one struct with
``last(ignorenulls=True)`` over an unbounded-preceding window — the struct
is null only for left-tagged rows, so a matched right row carries
atomically even when its payload columns contain nulls (DuckDB/kdb ASOF
semantics: the matched row's null IS the answer). One shuffle on the join
key; no range explosion, no per-row subqueries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    strict: bool = False,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` (``direction='backward'``, default; ``<`` when
    ``strict``) — or, with ``direction='forward'``, the earliest right row
    with ``right.ts >= left.ts`` — per ``on`` key.

    Args:
        left/right: event frames; ``on`` is the equality key column name.
        left_ts/right_ts: timestamp column names.
        value_cols: right-side payload columns to carry (default: all except
            the key and timestamp).
        strict: require strictly-earlier (backward) / strictly-later
            (forward) right rows.
        tolerance: optional max lookback/lookahead (SQL interval string,
            e.g. ``'15 minutes'``): matches beyond it are nulled out.
        direction: ``'backward'``, ``'forward'`` or ``'nearest'`` (pandas
            merge_asof semantics). Forward is the backward scan on a
            reversed time axis; nearest takes the closer of the two (ties
            to backward) — all three are ONE shuffle on the key.

    Scale shape: both sides shuffle ONCE on the key; the window is
    partitioned by key (no global ordering). Ties on equal timestamps order
    right rows before left rows, so an equal-ts right row is visible to the
    left row unless ``strict``.
    """
    from pyspark.sql import types as T

    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    # the carried unit is ONE struct of (right ts, payload...): null only for
    # left-tagged rows, so last(ignorenulls) skips left rows but carries a
    # matched right row whole — its payload nulls stay the matched values,
    # and the tolerance gate reads the ts of the very row the values came from
    rrow_type = T.StructType(
        [T.StructField("_rts", right.schema[right_ts].dataType)]
        + [T.StructField(c, right.schema[c].dataType) for c in value_cols]
    )
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(rrow_type).alias("_rrow"),
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_tag.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(
            F.col(right_ts).alias("_rts"),
            *[F.col(c) for c in value_cols],
        ).alias("_rrow"),
    )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest': "
            f"{direction!r}"
        )
    # strict: right rows at an equal timestamp sort AFTER left rows and are
    # therefore not yet visible; non-strict: right rows sort first.
    order_side = F.col("_side") if not strict else -F.col("_side")
    # content-derived final tie-break: multiple right rows sharing
    # (key, ts) would otherwise leave the window order partial and the
    # carried row shuffle-dependent — nondeterministic output across runs
    order_tie = F.xxhash64("_rrow")
    if direction == "nearest":
        # pandas merge_asof(direction='nearest'): closer of the backward and
        # forward matches, ties to backward. Both carries share ONE shuffle
        # on the key — same partitioning, two sort orders within it.
        wb = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), order_side, order_tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wf = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), order_side, order_tie)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = l_tag.unionByName(r_tag).select(
            "_side",
            "_ts",
            "_lrow",
            F.last("_rrow", ignorenulls=True).over(wb).alias("_cb"),
            F.last("_rrow", ignorenulls=True).over(wf).alias("_cf"),
        )
        out = carried.where(F.col("_side") == 1)
        ok_b = F.col("_cb").isNotNull()
        ok_f = F.col("_cf").isNotNull()
        if tolerance is not None:
            iv = F.expr(f"INTERVAL {tolerance}")
            ok_b = ok_b & (F.col("_cb._rts") >= F.col("_ts") - iv)
            ok_f = ok_f & (F.col("_cf._rts") <= F.col("_ts") + iv)
        db = F.col("_ts").cast("double") - F.col("_cb._rts").cast("double")
        df_ = F.col("_cf._rts").cast("double") - F.col("_ts").cast("double")
        chosen = F.when(ok_b & (~ok_f | (db <= df_)), F.col("_cb")).otherwise(
            F.when(ok_f, F.col("_cf"))
        )
        return out.select(
            *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
            *[chosen.getField(c).alias(f"r_{c}") for c in value_cols],
        )
    ts_order = (
        F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(ts_order, order_side, order_tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_side",
        "_ts",
        "_lrow",
        F.last("_rrow", ignorenulls=True).over(w).alias("_c"),
    )
    out = carried.where(F.col("_side") == 1)
    keep = F.col("_c").isNotNull()
    if tolerance is not None:
        if direction == "backward":
            keep = keep & (
                F.col("_c._rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
            )
        else:
            keep = keep & (
                F.col("_c._rts") <= F.col("_ts") + F.expr(f"INTERVAL {tolerance}")
            )
    return out.select(
        *[F.col(f"_lrow.{c}").alias(c) for c in left.columns],
        *[
            F.when(keep, F.col(f"_c.{c}")).otherwise(F.lit(None)).alias(f"r_{c}")
            for c in value_cols
        ],
    )


def _epoch_us(df: DataFrame, col: str):
    """Epoch-microseconds expression for a TIMESTAMP or TIMESTAMP_NTZ column.

    NTZ is computed from the WALL-CLOCK fields (days + time-of-day), never
    by casting through the session timezone: under a DST-observing session
    tz a cast maps wall times across spring-forward/fall-back gaps, so two
    NTZ stamps 80 wall-minutes apart could band-match a 30-minute
    tolerance. (Identical to the cast under this repo's pinned UTC
    sessions, where no DST exists.)"""
    c = F.col(col)
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        return (
            F.unix_date(F.to_date(c)).cast("long") * F.lit(86_400_000_000)
            + (
                F.hour(c).cast("long") * F.lit(3600)
                + F.minute(c).cast("long") * F.lit(60)
            )
            * F.lit(1_000_000)
            # date_part SECOND is DECIMAL(8,6) incl. the fraction — ×1e6
            # is exact decimal arithmetic, no float in the path
            + (F.date_part(F.lit("SECOND"), c) * F.lit(1_000_000)).cast("long")
        )
    return F.unix_micros(c)


def range_join(
    left: DataFrame,
    right: DataFrame,
    tolerance_s: float,
    on: str | None = None,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    prefix: str = "r_",
) -> DataFrame:
    """Interval join: pairs with ``|left.ts - right.ts| <= tolerance_s``
    (optionally also equal on ``on``) — banded, never a cross join.

    Both sides bucket by ``floor(ts / tolerance)``; a qualifying pair is
    always in the same or an adjacent bucket, so the right side explodes to
    its three neighbouring buckets and the join key is (bucket[, on]). Each
    pair meets exactly once (the left bucket matches exactly one of the
    right row's three copies), so no dedup pass is needed. Shuffle volume is
    3× the right side — the classic band-join trade, linear instead of the
    quadratic theta join Spark would otherwise plan.
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c != right_ts and c != on]
    tol_us = int(tolerance_s * 1_000_000)
    if tol_us <= 0:
        raise ValueError(
            f"tolerance_s must be at least 1 microsecond, got {tolerance_s!r}"
        )
    lb = left.withColumn(
        "_bkt", F.floor(_epoch_us(left, left_ts) / tol_us).cast("long")
    )
    rb = right.withColumn(
        "_bkt0", F.floor(_epoch_us(right, right_ts) / tol_us).cast("long")
    ).select(
        F.explode(
            F.array(F.col("_bkt0") - 1, F.col("_bkt0"), F.col("_bkt0") + 1)
        ).alias("_bkt"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
        *([F.col(on).alias("_rk")] if on else []),
    )
    cond = [lb["_bkt"] == rb["_bkt"]]
    if on:
        cond.append(lb[on] == rb["_rk"])
    joined = lb.join(rb, cond[0] if len(cond) == 1 else cond[0] & cond[1])
    close = (
        F.abs(
            F.unix_micros(F.col(left_ts).cast("timestamp"))
            - F.unix_micros(F.col("_rts").cast("timestamp"))
        )
        <= tol_us
    )
    return joined.where(close).select(
        *[F.col(c) for c in left.columns],
        F.col("_rts").alias(f"{prefix}{right_ts}"),
        *[F.col(f"{prefix}{c}") for c in value_cols],
    )
