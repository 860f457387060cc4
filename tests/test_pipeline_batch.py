"""Batch (one-job-for-all-windows) pipeline path: results equivalent
to the per-window loop, control table fully merged in one pass,
dynamic partition overwrite keeps re-runs idempotent."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.control_table import ControlTable
from data_pipeline_001_spark.plans.pipeline import PipelineConfig, WindowPipeline
from data_pipeline_001_spark.sources.file_connectors import (
    DayPartitionedTableSink,
    FileSource,
    PartitionedParquetSink,
)

SF_DIR = "/root/testdata/sf0.001"
DAY = datetime(2024, 1, 2)
DAY_END = datetime(2024, 1, 4)  # two days → 8 six-hour windows


@pytest.fixture()
def batch_pipe(spark, tmp_path):
    source = FileSource(spark, f"{SF_DIR}/events.parquet", ts_col="ts")
    stage = PartitionedParquetSink(spark, str(tmp_path / "stage"))
    target = DayPartitionedTableSink(spark, str(tmp_path / "target"))
    control = ControlTable(spark, str(tmp_path / "control"))
    cfg = PipelineConfig(pipeline_name="batch", granularity="6h", tolerance_pct=1.0)
    return WindowPipeline(spark, cfg, source, stage, target, control)


def test_run_batch_completes_all_windows(batch_pipe, spark):
    audit = batch_pipe.run_batch(DAY, DAY_END).collect()
    assert len(audit) == 8
    for r in audit:
        assert r["source_count"] == r["target_count"] > 0

    ct = batch_pipe.control.read().collect()
    assert len(ct) == 8
    for r in ct:
        assert r["pipeline_status"] == "completed", r["source_query_window_start_time"]
        assert r["completed_stage_number"] == 4
        assert r["count_match_status"] == "matched"
        assert r["source_count"] == r["target_count"]

    # total rows match the source window exactly
    total_target = batch_pipe.target_sink.read_all().count()
    assert total_target == batch_pipe.source.count(DAY, DAY_END)


def test_run_batch_idempotent_rerun(batch_pipe):
    first = {r["window_start"]: r["target_count"] for r in batch_pipe.run_batch(DAY, DAY_END).collect()}
    second = {r["window_start"]: r["target_count"] for r in batch_pipe.run_batch(DAY, DAY_END).collect()}
    assert first == second
    # control table still has exactly 8 rows (no duplicate planning)
    assert batch_pipe.control.read().count() == 8


def test_target_partition_pruning(batch_pipe, spark):
    """Window predicates prune to single partitions on the target
    table (the point of the day/window partition layout)."""
    batch_pipe.run_batch(DAY, DAY_END)
    tgt = batch_pipe.target_sink.read_all().where(
        (F.col("window_day") == "2024-01-02") & (F.col("window_start") == "06-00")
    )
    plan = tgt._sc._jvm.PythonSQLUtils.explainString(
        tgt._jdf.queryExecution(), "formatted"
    )
    # partition filters appear as PartitionFilters on the scan, and the
    # count matches the per-window sink count
    assert "PartitionFilters" in plan
    n = tgt.count()
    assert n == batch_pipe.target_sink.count(datetime(2024, 1, 2, 6), datetime(2024, 1, 2, 12))
    assert n > 0
