"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.11 UDTF surface × §2.10 streaming: the primitive for
operators Spark's built-in windows can't express).

``running_user_stats``: per-user running event count + running value
sum + last-seen timestamp, maintained in the state store across
micro-batches — the streaming upgrade of the reference's drive-table
progress counters, with state on executors instead of a Snowflake
table.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("batch_events", LongType()),
        StructField("last_ts", TimestampType()),
    ]
)


def _update_user_stats(
    key: Tuple[int],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n_prev, sum_prev = state.get if state.exists else (0, 0.0)
    batch_n = 0
    batch_sum = 0.0
    last_ts = None
    for pdf in pdfs:
        batch_n += len(pdf)
        batch_sum += float(pdf["value"].sum())
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    n_total = n_prev + batch_n
    sum_total = sum_prev + batch_sum
    state.update((n_total, sum_total))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_total],
            "sum_value": [sum_total],
            "batch_events": [batch_n],
            "last_ts": [last_ts],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming groupBy(user).applyInPandasWithState — emits one row
    per (user, micro-batch) with cumulative totals."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("closed", LongType()),
    ]
)


def _session_with_timeout(timeout_ms: int):
    def update(
        key: Tuple[int],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            # inactivity window elapsed: emit the FINAL session row and
            # clear the store — state is bounded by activity, not time
            n, sum_v = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "sum_value": [sum_v],
                    "closed": [1],
                }
            )
            return
        n_prev, sum_prev = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n_prev += len(pdf)
            sum_prev += float(pdf["value"].sum())
        state.update((n_prev, sum_prev))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n_prev],
                "sum_value": [sum_prev],
                "closed": [0],
            }
        )

    return update


def timeout_closed_sessions(
    events: DataFrame, timeout_ms: int = 3000
) -> DataFrame:
    """Inactivity-closed sessions — the state-TTL pattern
    ``session_window`` can't express when the close action itself must
    run custom logic (final aggregation, state cleanup, side output).
    Each key's state carries its running totals and re-arms a
    processing-time timeout on every batch that touches it; when a
    batch fires with the key absent past the timeout, the operator
    emits the terminal ``closed=1`` row and REMOVES the state, so the
    store holds only active keys (bounded by concurrent activity, the
    invariant that matters at cluster scale). Timeouts are evaluated
    per micro-batch, so an idle source with no further batches delays
    closure — the standard processing-time-timeout caveat.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_with_timeout(timeout_ms),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
