"""Custom stateful streaming operator via ``applyInPandasWithState``.

The pattern SURVEY §2.12 reserves for operators Spark's built-in streaming
aggregations can't express: user code owns an explicit per-key state row,
updated Arrow-batch-at-a-time. ``stateful_user_stats`` is the reference
instance — per-key running (count, max, min) — kept deliberately
order-independent so a bounded drain is provably batch-equivalent (the
driver oracle pins it against a plain GROUP BY).

Scale shape: state lives in the state store partitioned by key (one shuffle
on the grouping key per micro-batch); the update function sees each key's
batch rows as pandas chunks, so per-batch work is vectorised, and state size
is O(distinct keys), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def stateful_user_stats(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key running stats with explicit state: (n_events, max_value,
    min_event). Emits the key's cumulative row each micro-batch it appears
    in; all three metrics are selections/counts (no float accumulation), so
    the terminal row per key is exactly the batch aggregate regardless of
    row or batch order."""
    import pandas as pd

    output_schema = (
        f"{key_col} long, n_events long, max_value double, min_event long"
    )
    state_schema = "n long, mx double, mn long"

    def update(key, pdfs, state):
        if state.exists:
            n, mx, mn = state.get
        else:
            n, mx, mn = 0, None, None
        for pdf in pdfs:
            if not len(pdf):
                continue
            n += len(pdf)
            bmx = pdf[value_col].max()
            bmn = int(pdf[id_col].min())
            mx = float(bmx) if mx is None else max(mx, float(bmx))
            mn = bmn if mn is None else min(mn, bmn)
        state.update((n, mx, mn))
        yield pd.DataFrame(
            [
                {
                    key_col: key[0],
                    "n_events": n,
                    "max_value": mx,
                    "min_event": mn,
                }
            ]
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
