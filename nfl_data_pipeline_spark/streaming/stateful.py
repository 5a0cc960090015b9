"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.10 stretch row: 'session windows / arbitrary state').

``running_user_totals``: per-user running aggregates (event count,
value sum, last-seen timestamp) maintained as explicit state across
micro-batches — the arbitrary-state primitive the reference's weekly
batch world never needed, exposed for true streaming deployments.
State is bounded by a processing-time timeout.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_ns", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_ns", T.LongType()),
    ]
)


def _make_update(idle_timeout_ms: int | None):
    def _update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        n, s, last = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            last = max(last, int(pdf["ts"].max()))
        state.update((n, s, last))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "last_ts_ns": [last],
            }
        )

    return _update


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Arbitrary-state streaming aggregation: emits the updated
    per-user totals every micro-batch.

    ``idle_timeout_ms`` bounds state for long-running deployments
    (evict users idle past the timeout). Leave None for availableNow /
    drain-style runs: a ProcessingTimeTimeout keeps the query alive
    waiting to service timeouts even after the source is exhausted.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _make_update(idle_timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
