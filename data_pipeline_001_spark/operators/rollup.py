"""Continuous aggregate ("hypertable rollup"): a materialized
time-bucketed aggregate table maintained incrementally — the
TimescaleDB-style continuous-aggregate pattern re-expressed with
Spark primitives.

The rollup is a day-partitioned parquet table of per-bucket
aggregates. ``refresh(window)`` recomputes ONLY the buckets whose
day partitions intersect the window and swaps them with dynamic
partition overwrite — so maintaining a year-long rollup after an
hourly load touches one day partition, not the table. Queries over
the rollup prune partitions on the day column.

This composes the engine's idempotent-sink discipline (deterministic
partition per time slice, SURVEY §2.10 exactly-once mapping) with the
reference's windowed-recompute model (clean-before-write,
target_cleaner.py semantics) at aggregate granularity.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from datetime import time as dt_time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_001_spark.functions.time_fns import parse_granularity_minutes


class ContinuousRollup:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        ts_col: str = "ts",
        grain: str = "1h",
        aggs: dict[str, Column] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.ts_col = ts_col
        self.grain = grain
        self.aggs = aggs or {
            "n_rows": F.count("*"),
            "sum_value": F.sum("value"),
        }

    def _bucket(self) -> Column:
        gran_s = parse_granularity_minutes(self.grain) * 60
        return F.timestamp_seconds(
            (F.floor(F.unix_timestamp(F.col(self.ts_col)) / gran_s) * gran_s).cast(
                "long"
            )
        )

    def refresh(
        self,
        source: DataFrame,
        start: datetime | None = None,
        end: datetime | None = None,
    ) -> None:
        """Recompute buckets in [start, end) (whole source if None) and
        swap exactly the affected day partitions.

        A sub-day window is snapped OUTWARD to whole days first:
        overwrite granularity is the ``bucket_day`` partition, so
        recomputing only part of a day would silently drop that day's
        other buckets from the swapped partition."""
        df = source
        if start is not None:
            start = datetime.combine(start.date(), dt_time.min)
            df = df.where(F.col(self.ts_col) >= F.lit(start))
        if end is not None:
            if end != datetime.combine(end.date(), dt_time.min):
                end = datetime.combine(end.date(), dt_time.min) + timedelta(days=1)
            df = df.where(F.col(self.ts_col) < F.lit(end))
        rolled = (
            df.withColumn("bucket_start", self._bucket())
            .groupBy("bucket_start")
            .agg(*[expr.alias(name) for name, expr in self.aggs.items()])
            .withColumn("bucket_day", F.to_date("bucket_start"))
        )
        (
            rolled.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket_day")
            .parquet(self.path)
        )

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def query_range(self, start: datetime, end: datetime) -> DataFrame:
        """Partition-pruned range read (the fast path dashboards hit)."""
        return self.read().where(
            (F.col("bucket_day") >= F.lit(start.date()))
            & (F.col("bucket_day") <= F.lit(end.date()))
            & (F.col("bucket_start") >= F.lit(start))
            & (F.col("bucket_start") < F.lit(end))
        )
