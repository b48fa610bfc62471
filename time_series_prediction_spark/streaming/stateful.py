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


USER_STATE_SCHEMA = (
    "user_id bigint, n_events bigint, total_cents bigint, ewma double, "
    "last_ts timestamp"
)


def user_running_stats_stream(
    events: DataFrame, decay: float = 0.5
) -> DataFrame:
    """Per-user running statistics with an ORDER-DEPENDENT fold: unlike
    ``running_user_totals`` (commutative sums — batch arrival order
    irrelevant), the exponentially-weighted mean depends on event
    order, so each micro-batch must fold its rows in (ts, event_id)
    order into the carried state (the streaming twin of the batch
    ``ts_ewma_7``).

    State per user = (n_events, total_cents, ewma, last_ts); each
    micro-batch folds its rows in (ts, event_id) order into the carried
    state and emits one update row per touched user. State size is
    O(distinct users), independent of stream length — the scale
    property that matters on an unbounded firehose. Exact integer cents
    keep n/total deterministic; the ewma fold order is pinned by the
    (ts, event_id) sort.
    """
    def fold(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            n, total, ewma, last_us = state.get
        else:
            n, total, ewma, last_us = 0, 0, None, None
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for cents, ts in zip(
                (pdf["value"] * 100).round().astype("int64"), pdf["ts"]
            ):
                n += 1
                total += int(cents)
                v = cents / 100.0
                ewma = v if ewma is None else decay * v + (1 - decay) * ewma
                last_us = int(ts.value // 1000)  # ns -> us
        state.update((n, total, ewma, last_us))
        yield pd.DataFrame(
            {
                "user_id": pd.Series([user_id], dtype="int64"),
                "n_events": pd.Series([n], dtype="int64"),
                "total_cents": pd.Series([total], dtype="int64"),
                "ewma": pd.Series([ewma], dtype="float64"),
                "last_ts": pd.Series(
                    [pd.Timestamp(last_us * 1000)], dtype="datetime64[ns]"
                ),
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=USER_STATE_SCHEMA,
        stateStructType="n bigint, total bigint, ewma double, last_us bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
