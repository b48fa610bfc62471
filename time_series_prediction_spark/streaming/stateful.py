"""Custom stateful streaming operator via applyInPandasWithState.

Running per-user account state over the events stream: each
micro-batch folds new events into persistent per-user state
(cumulative value, event count, last-seen timestamp) and emits the
updated snapshot. This is the engine's template for operators the
built-in windowed aggregations can't express (per-key custom state
machines, conditional resets, enrichment caches).

State is bounded by the timeout: idle users' state is dropped after
the configured processing-time timeout — the discipline that keeps a
100 TB stream's state store finite.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, total_value double, n_events bigint, last_ts timestamp"
)
STATE_SCHEMA = "total_cents bigint, n_events bigint, last_us bigint"


def _update_user_state(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    total_c, n, last_us = (
        state.get if state.exists else (0, 0, 0)
    )
    for pdf in batches:
        cents = (pdf["value"] * 100).round().astype("int64")
        total_c += int(cents.sum())
        n += len(pdf)
        last_us = max(last_us, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((total_c, n, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_value": [total_c / 100.0],
            "n_events": [n],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        }
    )


def running_user_totals(
    events: DataFrame, evict_idle: bool = False
) -> DataFrame:
    """Stateful per-user running totals (update mode).

    ``evict_idle=True`` enables processing-time state eviction (the
    production setting that bounds the state store on an unbounded
    key space); the handler must then begin with
    ``if state.hasTimedOut: state.remove(); return`` and call
    ``state.setTimeoutDuration(...)`` after each update. Kept off by
    default: timeout scheduling keeps the query permanently busy, so
    bounded drains (``processAllAvailable``, used in tests and batch
    backfills) would never return.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
