"""Arbitrary stateful streaming on the Spark 4 state-v2 API
(``transformWithStateInPandas`` + ``StatefulProcessor``).

Why this exists next to ``stateful.py``'s ``applyInPandasWithState``:
the v2 API is the one that scales operational state — RocksDB-backed
named state variables (value/list/map) instead of one opaque tuple,
per-variable TTL so idle keys' state is RECLAIMED without a manual
timeout dance (bounded state at 100 TB ≡ bounded keys × TTL window),
and first-class timers. ``user_profile_stats`` maintains, per user:

* a ``ValueState`` (event count, value sum) — the running aggregate,
* a ``MapState`` keyed by event type — per-type counts, the kind of
  nested aggregate ``applyInPandasWithState`` forces you to encode
  into a blob by hand.

Emitted per (user, micro-batch): the updated running totals plus the
number of distinct event types seen so far. Deterministic given the
input file sequence, so the test compares against the batch twin.

Requires the RocksDB state-store provider (bundled with Spark 4);
``stateful_session_conf`` returns the confs to set. The v2 protocol
additionally needs google.protobuf's REFLECTION RUNTIME (PySpark's
generated ``StateMessage_pb2`` calls descriptor_pool /
internal.builder / ValidateProtobufRuntimeVersion(≥6.33) at import —
a vendored varint encoder cannot satisfy it; verified chain in
tests/test_state_v2.py::test_state_v2_absence_is_exactly_the_
documented_runtime_gap). ``state_v2_available()`` probes for it and
the e2e test skips loudly where absent (this container), self-closing
the moment a protobuf runtime appears; the operator logic is
exercised meanwhile via ``applyInPandasWithState`` parity on the same
processor.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming."
    "state.RocksDBStateStoreProvider"
)

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, n_types bigint"
)


def state_v2_available() -> bool:
    """True when the transformWithState wire protocol can run here
    (PySpark's state server speaks protobuf to the Python worker)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_session_conf() -> dict[str, str]:
    """Session confs transformWithState needs (RocksDB state store)."""
    return {"spark.sql.streaming.stateStore.providerClass": ROCKSDB_PROVIDER}


class UserProfileProcessor(StatefulProcessor):
    """Running per-user profile over two named state variables."""

    def __init__(self, ttl_ms: int | None = None):
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState(
            "totals", "n bigint, s double", ttlDurationMs=self._ttl_ms
        )
        self._by_type = handle.getMapState(
            "by_type",
            "event_type string",
            "n bigint",
            ttlDurationMs=self._ttl_ms,
        )

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        (user_id,) = key
        n_prev, s_prev = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        batch_n = 0
        batch_s = 0.0
        type_counts: dict[str, int] = {}
        for pdf in rows:
            batch_n += len(pdf)
            batch_s += float(pdf["value"].fillna(0.0).sum())
            for et, c in pdf["event_type"].value_counts().items():
                type_counts[et] = type_counts.get(et, 0) + int(c)
        n, s = n_prev + batch_n, s_prev + batch_s
        self._totals.update((n, s))
        for et, c in type_counts.items():
            prev = (
                self._by_type.getValue((et,))[0]
                if self._by_type.containsKey((et,))
                else 0
            )
            self._by_type.updateValue((et,), (prev + c,))
        n_types = sum(1 for _ in self._by_type.keys())
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [s],
                "n_types": [n_types],
            }
        )

    def close(self) -> None:
        pass


def user_profile_stats(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Per-user running (count, sum, distinct-type count) maintained in
    RocksDB named state across micro-batches. ``ttl_ms`` bounds state
    for idle users (reclaimed lazily by the store, no timer code)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(ttl_ms),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
