"""Streaming windowed aggregation + watermark-bounded dedupe.

Structured-Streaming counterparts of the batch event operators (ev2/ev3):
the same ``session_window`` expression runs over ``readStream``, and
duplicate suppression uses ``dropDuplicatesWithinWatermark`` so state is
bounded by the watermark horizon instead of growing forever (the
dropDuplicates-without-watermark trap at corpus scale).

Design notes for real streams:
- ``streaming_session_stats`` in *update/complete* mode keeps session state
  in the state store; with a watermark and *append* mode only closed
  sessions (session end < watermark) emit — exactly-once, late-data-safe.
  ``availableNow`` over a static table is the batch-equivalence harness:
  terminal complete-mode state equals the batch aggregation, which is what
  the oracle pins.
- ``streaming_distinct`` holds one state row per key seen within the
  watermark horizon; duplicates separated by more than the horizon can
  re-emit (the documented trade for bounded state).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MEMSINK_SEQ = [0]


def streaming_session_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user gap-based sessions over a stream: one row per closed session
    with start + event count. Pass a ``watermark`` for append-mode emission
    on unbounded streams; leave None when draining a bounded stream in
    complete mode."""
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return (
        stream.groupBy(user_col, F.session_window(ts_col, gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            user_col,
            F.date_format("session_window.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


def streaming_distinct(
    stream: DataFrame,
    cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming DISTINCT on ``cols`` with state bounded by the watermark:
    a duplicate arriving within ``watermark`` of the first sighting is
    dropped; state for older keys is evicted."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        cols
    )


def drain_to_memory(
    df: DataFrame,
    spark: SparkSession,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a bounded streaming plan to completion (availableNow) into a
    memory sink and return the terminal table as a batch DataFrame.

    ``state_partitions`` (optimization r14): the number of state-store
    partitions a stateful query is born with — every store pays a fixed
    open/commit/file cost PER MICRO-BATCH (availableNow adds a final
    empty watermark batch that pays it again), so oversizing the count to
    the session's shuffle default dominates small drains: st5's interval
    join measured 7.7-13.5 s at 32 partitions vs 2.2-3.1 s at 4-8 with
    identical output. Size it from expected STATE (e.g. input bytes), not
    core count. Set transiently around start() — the stateful operator
    pins its partitioning from the conf at query start; the session value
    is restored before returning."""
    _MEMSINK_SEQ[0] += 1
    name = f"_mbspark_memsink_{_MEMSINK_SEQ[0]}"
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="mbspark_stream_ckpt_")
    old_parts = None
    if state_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(int(state_partitions)))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    q.awaitTermination()
    return spark.table(name)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each left row pairs with the right rows
    sharing ``on`` whose ``right_ts`` falls within ``[left_ts - lookback,
    left_ts]``. Both sides carry watermarks and the join has an explicit
    event-time range, so Spark bounds both state stores (right rows age out
    once the left watermark passes ``right_ts + lookback``) — the shape that
    keeps state finite on unbounded streams. ``left_ts``/``right_ts`` must
    be distinct column names (rename before calling)."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[on] == rw[on])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {lookback}"))
        & (rw[right_ts] <= lw[left_ts])
    )
    return lw.join(rw, cond, "inner").drop(rw[on])
