"""File-backed Source/Sink implementations.

- ``FileSource``: parquet/json/csv directory with a timestamp column —
  the test stand-in for the reference's Elasticsearch source. Counts
  are pushed-down filters over the columnar scan (no full read).
- ``PartitionedParquetSink``: day/window-partitioned parquet target.
  Idempotence = deterministic window path + overwrite, replacing the
  reference's head_object-check → delete → rewrite dance
  (stage/data_checker.py:6-60, stage/stage_cleaner.py:6-59).
- ``MockAsyncSink``: wraps a sink and makes ``load`` lag behind
  (visible counts converge over successive ``count`` calls) to
  exercise the audit adaptive-retry semantics (R3) that exist in the
  reference only because Snowpipe is fire-and-forget
  (target/ingestion_engine.py:25-35, audit_manager.py:123-383).
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_001_spark.sources.base import Sink, Source


def window_predicate(ts_col: str, start: datetime, end: datetime):
    """P1: half-open timestamp range ``ts >= start AND ts < end``
    (elasticsearch_counter.py:110-118)."""
    return (F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) < F.lit(end))


def window_dir_name(start: datetime) -> str:
    """F15: deterministic window path segment ``YYYY-MM-DD/HH-mm``
    (stage/ingestion_engine.py:62-99)."""
    return start.strftime("%Y-%m-%d/%H-%M")


class FileSource(Source):
    """Parquet/JSON/CSV/ORC/XML directory source with window predicates.

    ``must_exist`` / ``exclude_null`` filter fields mirror the ES
    query options (elasticsearch_counter.py:124-131) — both collapse
    to ``isNotNull`` in a relational engine (P2/P3).

    ``quarantine_path`` (text formats only): malformed records are
    read PERMISSIVE into ``_corrupt_record``, appended to the
    quarantine directory as JSON, and EXCLUDED from extract/count —
    one bad line degrades to a quarantined row instead of failing the
    window or silently nulling fields. The declared ``schema`` is
    required for quarantine (Spark only populates the corrupt column
    with an explicit schema).
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        ts_col: str = "ts",
        fmt: str = "parquet",
        must_exist: tuple[str, ...] = (),
        exclude_null: tuple[str, ...] = (),
        schema=None,
        quarantine_path: str | None = None,
        merge_schema: bool = False,
        options: dict | None = None,
    ):
        self.spark = spark
        self.path = path
        self.ts_col = ts_col
        self.fmt = fmt
        self.must_exist = must_exist
        self.exclude_null = exclude_null
        self.schema = schema
        self.quarantine_path = quarantine_path
        # schema evolution across file generations: older parquet
        # files simply lack newly-added columns; mergeSchema unions
        # the footers (one-time listing cost) and fills the gaps with
        # NULL. Off by default — at 100 TB footer-merging every read
        # is wasteful when the schema is known; prefer an explicit
        # ``schema``, which gets the same NULL-fill for free.
        self.merge_schema = merge_schema
        # format-specific reader options (XML needs rowTag; CSV header,
        # timestampFormat, ... all pass through untouched)
        self.options = dict(options or {})
        if quarantine_path is not None:
            if fmt not in ("json", "csv"):
                raise ValueError("quarantine_path requires a text format (json/csv)")
            if schema is None:
                raise ValueError("quarantine_path requires an explicit schema")
            # the quarantine contract IS PERMISSIVE + _corrupt_record;
            # a user option like mode=DROPMALFORMED applied on top
            # (options are applied last) would silently defeat it
            clash = {"mode", "columnNameOfCorruptRecord"} & set(self.options)
            if clash:
                raise ValueError(
                    f"options {sorted(clash)} conflict with quarantine_path's "
                    "PERMISSIVE/_corrupt_record reader contract"
                )

    def _read(self) -> DataFrame:
        from pyspark.sql import types as T

        reader = self.spark.read
        schema = self.schema
        if self.quarantine_path is not None:
            schema = T.StructType(
                [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
            )
            reader = reader.option("mode", "PERMISSIVE").option(
                "columnNameOfCorruptRecord", "_corrupt_record"
            )
        if schema is not None:
            reader = reader.schema(schema)
        if self.merge_schema:
            reader = reader.option("mergeSchema", "true")
        if self.options:
            reader = reader.options(**self.options)
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = reader.format(self.fmt).load(self.path)
        if self.quarantine_path is not None:
            # cache so the split doesn't parse the files twice; keep
            # every column in the quarantine write — Spark forbids
            # queries whose only referenced column is _corrupt_record
            # (QUERY_ONLY_CORRUPT_RECORD_COLUMN), and JSON output drops
            # the all-null data fields of corrupt rows anyway
            df = df.cache()
            # rename on write: a JSON file whose only field is the
            # reserved _corrupt_record name can't itself be read back
            df.where(F.col("_corrupt_record").isNotNull()).withColumnRenamed(
                "_corrupt_record", "corrupt_record"
            ).write.mode("append").json(self.quarantine_path)
            df = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
        # TIMESTAMP(NANOS) parquet columns arrive as long under
        # nanosAsLong — convert to µs timestamps (integer division)
        if isinstance(df.schema[self.ts_col].dataType, T.LongType):
            df = df.withColumn(
                self.ts_col, F.timestamp_micros(F.expr(f"{self.ts_col} div 1000"))
            )
        for f in (*self.must_exist, *self.exclude_null):
            df = df.where(F.col(f).isNotNull())
        return df

    def count(self, start: datetime, end: datetime) -> int:
        return self._read().where(window_predicate(self.ts_col, start, end)).count()

    def extract(self, start: datetime, end: datetime) -> DataFrame:
        return self._read().where(window_predicate(self.ts_col, start, end))


class PartitionedParquetSink(Sink):
    """Idempotent window-partitioned parquet sink.

    Layout: ``{root}/{YYYY-MM-DD}/{HH-mm}/*.parquet`` — same
    day/window path discipline as the reference's S3 layout, which is
    what makes partition pruning work at 100 TB: a window recount
    reads exactly one directory.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        ts_col: str = "ts",
        max_records_per_file: int = 1_000_000,
    ):
        self.spark = spark
        self.root = root
        self.ts_col = ts_col
        self.max_records_per_file = max_records_per_file
        self.last_write_metrics: dict | None = None

    def _window_path(self, start: datetime) -> str:
        return os.path.join(self.root, window_dir_name(start))

    def load(self, df: DataFrame, start: datetime, end: datetime) -> None:
        """Write the window, observing written-row metrics IN the write
        job (``Observation`` — accumulator-backed, zero extra scan):
        ``last_write_metrics`` then holds rows / min_ts / max_ts of
        what was actually written. At 100 TB this is the free half of
        the audit — a source-vs-written mismatch surfaces before the
        target recount job is even scheduled."""
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.min(self.ts_col).alias("min_ts"),
            F.max(self.ts_col).alias("max_ts"),
        )
        (
            df.write.mode("overwrite")
            .option("maxRecordsPerFile", self.max_records_per_file)
            .parquet(self._window_path(start))
        )
        self.last_write_metrics = obs.get

    def exists(self, start: datetime, end: datetime) -> bool:
        p = self._window_path(start)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )

    def count(self, start: datetime, end: datetime) -> int:
        if not self.exists(start, end):
            return 0
        return self.spark.read.parquet(self._window_path(start)).count()

    def clean(self, start: datetime, end: datetime) -> None:
        shutil.rmtree(self._window_path(start), ignore_errors=True)

    def read_all(self) -> DataFrame:
        return self.spark.read.option("recursiveFileLookup", "true").parquet(self.root)


class DayPartitionedTableSink(Sink):
    """Single parquet *table* partitioned by window day + start, using
    dynamic partition overwrite for idempotent window replacement —
    the Spark mapping of the reference's target range-delete
    (S7, target/target_cleaner.py:7-69): rewriting a window's
    partition replaces DELETE-then-reload, atomically per partition.

    Unlike PartitionedParquetSink (one directory tree per window,
    good for stage files), this is one queryable table: readers see
    `window_day`/`window_start` as partition columns and get partition
    pruning on window predicates for free.
    """

    def __init__(self, spark: SparkSession, root: str, ts_col: str = "ts"):
        self.spark = spark
        self.root = root
        self.ts_col = ts_col

    def _with_partitions(self, df: DataFrame, start: datetime) -> DataFrame:
        return df.withColumn("window_day", F.lit(start.date()).cast("date")).withColumn(
            "window_start", F.lit(start.strftime("%H-%M"))
        )

    def load(self, df: DataFrame, start: datetime, end: datetime) -> None:
        (
            self._with_partitions(df, start)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_day", "window_start")
            .parquet(self.root)
        )

    def load_all(self, df: DataFrame) -> None:
        """One job for ALL windows: ``df`` already carries
        window_day/window_start columns; dynamic overwrite replaces
        exactly the partitions present in ``df``."""
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_day", "window_start")
            .parquet(self.root)
        )

    def exists(self, start: datetime, end: datetime) -> bool:
        p = os.path.join(
            self.root,
            f"window_day={start.date()}",
            f"window_start={start.strftime('%H-%M')}",
        )
        return os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))

    def count(self, start: datetime, end: datetime) -> int:
        if not self.exists(start, end):
            return 0
        # partition-pruned read: only this window's directory scans
        return (
            self.spark.read.parquet(self.root)
            .where(
                (F.col("window_day") == F.lit(start.date()).cast("date"))
                & (F.col("window_start") == start.strftime("%H-%M"))
            )
            .count()
        )

    def clean(self, start: datetime, end: datetime) -> None:
        shutil.rmtree(
            os.path.join(
                self.root,
                f"window_day={start.date()}",
                f"window_start={start.strftime('%H-%M')}",
            ),
            ignore_errors=True,
        )

    def read_all(self) -> DataFrame:
        return self.spark.read.parquet(self.root)


class MockAsyncSink(Sink):
    """Sink whose writes become visible gradually over ``count`` calls.

    Each ``count()`` reveals another ``reveal_fraction`` of the loaded
    rows, simulating Snowpipe's asynchronous load so the audit
    manager's recount/improvement-detection loop (R3) has something
    real to converge on.
    """

    def __init__(self, inner: Sink, reveal_steps: int = 3):
        self.inner = inner
        self.reveal_steps = reveal_steps
        self._calls: dict[str, int] = {}
        self._batch_reads = 0

    def load(self, df: DataFrame, start: datetime, end: datetime) -> None:
        self.inner.load(df, start, end)
        self._calls[start.isoformat()] = 0

    def load_all(self, df: DataFrame) -> None:
        """Batch-path load: delegate, then start every tagged window's
        reveal schedule at zero (the driver-side collect is one row per
        window and exists only in this test mock)."""
        self.inner.load_all(df)
        if "window_ts" in df.columns:
            for r in df.select("window_ts").distinct().collect():
                self._calls[r[0].isoformat()] = 0
        self._batch_reads = 0

    def read_all(self) -> DataFrame:
        """Batch-path read-back: reveal a deterministic ~k/steps row
        subset (hash-bucketed, monotone in k) so the columnar audit
        sees an under-count that converges over successive reads, the
        same contract count() provides per window."""
        df = self.inner.read_all()
        self._batch_reads = min(self._batch_reads + 1, self.reveal_steps)
        k = self._batch_reads
        if k >= self.reveal_steps:
            return df
        h = F.pmod(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]),
            F.lit(self.reveal_steps),
        )
        return df.where(h < k)

    def exists(self, start: datetime, end: datetime) -> bool:
        return self.inner.exists(start, end)

    def clean(self, start: datetime, end: datetime) -> None:
        self.inner.clean(start, end)
        self._calls.pop(start.isoformat(), None)

    def count(self, start: datetime, end: datetime) -> int:
        full = self.inner.count(start, end)
        k = self._calls.get(start.isoformat(), self.reveal_steps)
        self._calls[start.isoformat()] = min(k + 1, self.reveal_steps)
        return int(full * min(k + 1, self.reveal_steps) / self.reveal_steps)
