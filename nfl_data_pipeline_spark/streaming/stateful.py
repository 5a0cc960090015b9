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


# --- transformWithState twin ---------------------------------------------
#
# Spark 4 replaced the applyInPandasWithState primitive with the
# StatefulProcessor API (transformWithStateInPandas): typed state
# variables (value/list/map) with per-state TTL, timers, and initial
# state. The same running-totals operator is exposed through it so
# deployments on either API surface have a reference implementation;
# tests assert the two emit identical results batch-for-batch.


def running_user_totals_tws(
    events: DataFrame, state_ttl_ms: int | None = None
) -> DataFrame:
    """``running_user_totals`` on the Spark-4-native StatefulProcessor
    API. ``state_ttl_ms`` bounds state via the built-in per-state TTL
    (the processor-level replacement for GroupState timeouts).

    Runtime requirements beyond applyInPandasWithState: the RocksDB
    state store provider (``ingest.use_rocksdb_state``) and
    google.protobuf on the Python workers (the state-server protocol;
    absent in this sandbox, so the equivalence test skips here and
    runs where Spark's own requirements are met)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    ttl = state_ttl_ms

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals",
                "n_events long, sum_value double, last_ts_ns long",
                ttlDurationMs=ttl,
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            n, s, last = (
                self._totals.get() if self._totals.exists() else (0, 0.0, 0)
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                last = max(last, int(pdf["ts"].max()))
            self._totals.update((n, s, last))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [s],
                    "last_ts_ns": [last],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
