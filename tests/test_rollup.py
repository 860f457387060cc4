"""Continuous-rollup tests: matches direct aggregation; incremental
refresh touches only the affected day partitions."""

import os
from datetime import datetime

from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.rollup import ContinuousRollup


def test_rollup_matches_direct_aggregation(spark, tables, tmp_path):
    roll = ContinuousRollup(spark, str(tmp_path / "rollup"), grain="1h")
    roll.refresh(tables["events"])
    got = {
        r["bucket_start"]: (r["n_rows"], round(r["sum_value"], 6))
        for r in roll.read().collect()
    }
    direct = {
        r["b"]: (r["n"], round(r["s"], 6))
        for r in tables["events"]
        .groupBy(F.date_trunc("hour", "ts").alias("b"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert got == direct


def test_incremental_refresh_swaps_only_target_day(spark, tables, tmp_path):
    path = str(tmp_path / "rollup")
    roll = ContinuousRollup(spark, path, grain="1h")
    roll.refresh(tables["events"])
    before = {r["bucket_start"]: r["n_rows"] for r in roll.read().collect()}

    # re-refresh one day with HALVED data (simulating a corrected load)
    day = datetime(2024, 1, 5)
    day_end = datetime(2024, 1, 6)
    halved = tables["events"].where(
        (F.col("event_id") % 2 == 0)
        | (F.col("ts") < F.lit(day))
        | (F.col("ts") >= F.lit(day_end))
    )
    mtimes_before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("bucket_day=")
    }
    roll.refresh(halved, day, day_end)
    after = {r["bucket_start"]: r["n_rows"] for r in roll.read().collect()}

    for b, n in after.items():
        if day <= b < day_end:
            assert n <= before[b]
        else:
            assert n == before[b]  # untouched days identical
    # only the target day partition was rewritten
    changed = {
        d
        for d in mtimes_before
        if os.path.getmtime(os.path.join(path, d)) != mtimes_before[d]
    }
    assert changed == {"bucket_day=2024-01-05"}


def test_subday_refresh_preserves_sibling_buckets(spark, tables, tmp_path):
    """An hourly refresh window must NOT wipe the other 23 hours of its
    day: overwrite granularity is the day partition, so the refresh
    snaps sub-day windows outward to whole days."""
    path = str(tmp_path / "rollup")
    roll = ContinuousRollup(spark, path, grain="1h")
    roll.refresh(tables["events"])
    before = {r["bucket_start"]: r["n_rows"] for r in roll.read().collect()}

    # refresh a single hour of Jan 5 with unchanged data — every
    # bucket of the whole table must survive identically
    roll.refresh(tables["events"], datetime(2024, 1, 5, 13), datetime(2024, 1, 5, 14))
    after = {r["bucket_start"]: r["n_rows"] for r in roll.read().collect()}
    assert after == before


def test_query_range_prunes_partitions(spark, tables, tmp_path):
    roll = ContinuousRollup(spark, str(tmp_path / "rollup"), grain="1h")
    roll.refresh(tables["events"])
    q = roll.query_range(datetime(2024, 1, 3), datetime(2024, 1, 4))
    plan = q._sc._jvm.PythonSQLUtils.explainString(q._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
    expected_hours = (
        tables["events"]
        .where(
            (F.col("ts") >= F.lit(datetime(2024, 1, 3)))
            & (F.col("ts") < F.lit(datetime(2024, 1, 4)))
        )
        .select(F.date_trunc("hour", "ts"))
        .distinct()
        .count()
    )
    assert q.count() == expected_hours > 0
