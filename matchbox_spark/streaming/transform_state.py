"""Custom stateful streaming on Spark 4's transformWithStateInPandas API.

``applyInPandasWithState`` (streaming/stateful.py) is the legacy
arbitrary-state operator; Spark 4 replaces it with ``StatefulProcessor`` +
typed state handles (ValueState / MapState / ListState, timers, TTL). This
module implements the same kind of per-key accumulator on the NEW API so the
engine exercises both generations:

- per-user ValueState holds (n_events, max_value, min_event);
- per-user MapState holds event_type → count (bounded by the event-type
  vocabulary, not the stream length — the state-size discipline that
  matters on unbounded streams).

Batch-equivalence: all outputs are order-independent folds, so draining a
bounded stream (availableNow) yields exactly the batch GROUP BY — which the
relational oracle states directly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_types", LongType()),
        StructField("max_value", DoubleType()),
        StructField("min_event", LongType()),
    ]
)


class UserStatsProcessor(StatefulProcessor):
    """Per-user accumulator over (event_id, event_type, value) rows."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState(
            "agg", "n_events long, max_value double, min_event long"
        )
        self._type_counts = handle.getMapState(
            "type_counts", "event_type string", "n long"
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        n, mx, mn = 0, None, None
        type_delta: dict[str, int] = {}
        for pdf in rows:
            n += len(pdf)
            if len(pdf):
                m = float(pdf["value"].max())
                mx = m if mx is None else max(mx, m)
                e = int(pdf["event_id"].min())
                mn = e if mn is None else min(mn, e)
                for et, c in pdf.groupby("event_type").size().items():
                    type_delta[et] = type_delta.get(et, 0) + int(c)
        prev = self._agg.get() if self._agg.exists() else None
        if prev is not None:
            n += prev[0]
            mx = prev[1] if mx is None else max(mx, prev[1])
            mn = prev[2] if mn is None else min(mn, prev[2])
        self._agg.update((n, mx, mn))
        for et, c in type_delta.items():
            base = (
                self._type_counts.getValue((et,))
                if self._type_counts.containsKey((et,))
                else None
            )
            self._type_counts.updateValue((et,), ((base[0] if base else 0) + c,))
        n_types = sum(1 for _ in self._type_counts.keys())
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_types": [n_types],
                "max_value": [mx],
                "min_event": [mn],
            }
        )

    def close(self) -> None:
        pass


def transform_with_state_available() -> bool:
    """The TWS state protocol is protobuf-based; without a working
    ``google.protobuf`` the driver-side state worker crashes at init."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_user_type_stats(stream: DataFrame) -> DataFrame:
    """Per-user stats via transformWithStateInPandas (update mode rows).

    Raises up front (with the real reason) when the runtime lacks protobuf —
    the failure otherwise surfaces as an opaque
    ``STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE`` mid-query.
    """
    if not transform_with_state_available():
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf (state "
            "protocol); install protobuf or use "
            "streaming.stateful.stateful_user_stats (applyInPandasWithState)"
        )
    return (
        stream.select("user_id", "event_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStatsProcessor(),
            outputStructType=_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
