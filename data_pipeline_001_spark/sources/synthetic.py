"""Custom Python DataSource (PySpark 4 DataSource API): a seeded,
partition-parallel synthetic events generator.

The reference's tests hand-build fixture frames on the driver; at
scale (soak tests, shuffle benchmarks, backfill rehearsals) the data
must be GENERATED ON EXECUTORS — a driver-side createDataFrame ships
every row through the driver. This source registers with
``spark.dataSource.register`` and reads like any table:

    spark.read.format("synthetic_events")
         .option("rows", 1_000_000).option("partitions", 64)
         .option("seed", 42).load()

Each InputPartition generates its slice from ``(seed, partition_id)``
— no coordination, no driver data path, deterministic: the same
options always produce the same rows regardless of cluster layout,
so two reads are comparable by content checksum. Rows mimic the
testdata ``events`` schema (minus props) with a deterministic
multiplicative-hash stream (Knuth constant — same generator family as
the classifier's pseudo-weights).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_MIX = 2654435761
_MOD = (1 << 31) - 1
_TYPES = ("click", "view", "purchase", "signup", "refund")
_EPOCH_0 = 1704067200  # 2024-01-01T00:00:00Z — fixed, never "now"


class _Slice(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start = start
        self.end = end
        self.seed = seed


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self):
        per = -(-self.rows // self.n_parts)  # ceil
        return [
            _Slice(i * per, min((i + 1) * per, self.rows), self.seed)
            for i in range(self.n_parts)
            if i * per < self.rows
        ]

    def read(self, partition: _Slice):
        from datetime import datetime, timedelta, timezone

        base = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)
        for i in range(partition.start, partition.end):
            h = (i * _MIX + partition.seed * 97) % _MOD
            ts = base + timedelta(seconds=(h % 2_592_000))  # 30 days
            user = h % 10_000 if h % 17 else None  # ~6% null users
            etype = _TYPES[h % len(_TYPES)]
            value = round((h % 100_000) / 100.0, 2)
            yield (i, ts, user, etype, value)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema):
        return SyntheticEventsReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom format."""
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------
# Streaming variant: a replayable micro-batch source with offsets
# ---------------------------------------------------------------------


class SyntheticEventsStreamReader:
    """SimpleDataSourceStreamReader: offsets are row indices into the
    same deterministic stream the batch reader generates, so the
    source is REPLAYABLE — after a crash, readBetweenOffsets
    regenerates exactly the rows of the uncommitted batch, which is
    the contract that makes end-to-end exactly-once possible (same
    role Kafka offsets play). Each poll advances by ``batch_rows``."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.max_rows = int(options.get("max_rows", 10_000))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        lo = start["idx"]
        hi = min(lo + self.batch_rows, self.max_rows)
        return iter(self._rows(lo, hi)), {"idx": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["idx"], end["idx"]))

    def commit(self, end: dict) -> None:
        pass  # stateless: regeneration IS the replay

    def _rows(self, lo: int, hi: int):
        part = _Slice(lo, hi, self.seed)
        return list(SyntheticEventsReader({}).read(part))


class SyntheticEventsStreamSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events_stream"

    def schema(self):
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def simpleStreamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SyntheticEventsStreamSource)
