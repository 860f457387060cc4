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
