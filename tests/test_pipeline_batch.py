"""Batch (one-job-for-all-windows) pipeline path: results equivalent
to the per-window loop, control table fully merged in one pass,
dynamic partition overwrite keeps re-runs idempotent."""

from datetime import datetime

import pytest

pytestmark = pytest.mark.slow  # lane 2: see pytest.ini
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.control_table import ControlTable
from data_pipeline_001_spark.plans.pipeline import PipelineConfig, WindowPipeline
from data_pipeline_001_spark.sources.file_connectors import (
    DayPartitionedTableSink,
    FileSource,
    MockAsyncSink,
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


def test_run_batch_with_unaligned_plan_start(spark, tmp_path):
    """plan_start off the granularity boundary: window tagging is
    anchored at plan_start, so every control row still matches its
    audit row and completes (previously the epoch-aligned floor made
    the merge silently match nothing)."""
    source = FileSource(spark, f"{SF_DIR}/events.parquet", ts_col="ts")
    stage = PartitionedParquetSink(spark, str(tmp_path / "stage"))
    target = DayPartitionedTableSink(spark, str(tmp_path / "target"))
    control = ControlTable(spark, str(tmp_path / "control"))
    cfg = PipelineConfig(pipeline_name="odd", granularity="6h")
    pipe = WindowPipeline(spark, cfg, source, stage, target, control)

    start = datetime(2024, 1, 2, 3, 30)  # NOT on a 6h boundary
    end = datetime(2024, 1, 3, 3, 30)
    audit = pipe.run_batch(start, end).collect()
    assert len(audit) == 4
    ct = pipe.control.read().collect()
    assert len(ct) == 4
    for r in ct:
        assert r["pipeline_status"] == "completed", r["source_query_window_start_time"]
        assert r["source_query_window_start_time"].minute == 30
    total = pipe.target_sink.read_all().count()
    assert total == pipe.source.count(start, end) > 0


def test_shared_control_table_pipelines_are_isolated(spark, tmp_path):
    """Two pipelines over ONE control table: pipeline B's batch merge
    and populate must not complete, reset, or re-plan pipeline A's
    rows (the reference scopes every drive-table op by the source
    descriptor, pending_records_selector.py)."""
    control = ControlTable(spark, str(tmp_path / "control"))

    def build(name):
        source = FileSource(spark, f"{SF_DIR}/events.parquet", ts_col="ts")
        stage = PartitionedParquetSink(spark, str(tmp_path / f"{name}_stage"))
        target = DayPartitionedTableSink(spark, str(tmp_path / f"{name}_target"))
        cfg = PipelineConfig(
            pipeline_name=name, granularity="6h", source_desc=(name, "file", "parquet")
        )
        return WindowPipeline(spark, cfg, source, stage, target, control)

    a, b = build("pipe_a"), build("pipe_b")
    # A plans but does not run: its rows stay pending
    a.populate(DAY, DAY_END)
    assert control.read().count() == 8
    # B plans the same windows (same window_start values!) and runs
    b.run_batch(DAY, DAY_END)
    rows = control.read().collect()
    assert len(rows) == 16  # A's 8 rows were NOT reused/overwritten
    by_pipe = {}
    for r in rows:
        by_pipe.setdefault(r["pipeline_name"], []).append(r["pipeline_status"])
    assert set(by_pipe["pipe_a"]) == {"pending"}
    assert set(by_pipe["pipe_b"]) == {"completed"}


def test_merge_audit_results_dedupes_duplicate_windows(spark, tmp_path):
    """A duplicated audit row must not fan out the merge join and
    duplicate control rows in the overwritten table."""
    control = ControlTable(spark, str(tmp_path / "control"))
    source = FileSource(spark, f"{SF_DIR}/events.parquet", ts_col="ts")
    stage = PartitionedParquetSink(spark, str(tmp_path / "stage"))
    target = DayPartitionedTableSink(spark, str(tmp_path / "target"))
    cfg = PipelineConfig(pipeline_name="dup", granularity="6h")
    pipe = WindowPipeline(spark, cfg, source, stage, target, control)
    pipe.populate(DAY, DAY_END)
    n_before = control.read().count()

    one = control.read().collect()[0]["source_query_window_start_time"]
    audit = spark.createDataFrame(
        [(one, 5, 5), (one, 5, 5)],
        "window_start timestamp, source_count long, target_count long",
    )
    control.merge_audit_results(audit, "dup")
    assert control.read().count() == n_before


def test_run_batch_async_sink_retries_to_match(spark, tmp_path):
    """R3 on the batch path: an async sink whose counts lag behind
    (Snowpipe semantics) makes the initial columnar audit mismatch on
    every window; the adaptive envelope recounts each mismatched
    window until the lagging loads become visible, and every control
    row ends completed/matched — no data was recleaned or re-run."""
    source = FileSource(spark, f"{SF_DIR}/events.parquet", ts_col="ts")
    stage = PartitionedParquetSink(spark, str(tmp_path / "stage"))
    inner = DayPartitionedTableSink(spark, str(tmp_path / "target"))
    target = MockAsyncSink(inner, reveal_steps=3)
    control = ControlTable(spark, str(tmp_path / "control"))
    cfg = PipelineConfig(
        pipeline_name="async_batch", granularity="6h", tolerance_pct=1.0
    )
    pipe = WindowPipeline(spark, cfg, source, stage, target, control)
    waits = []
    pipe._sleep = waits.append  # record the schedule without blocking

    pipe.run_batch(DAY, DAY_END)

    ct = pipe.control.read().collect()
    assert len(ct) == 8
    for r in ct:
        assert r["pipeline_status"] == "completed", r["source_query_window_start_time"]
        assert r["count_match_status"] == "matched"
        assert r["completed_stage_number"] == 4
        for stage_name in (
            "source_discovery",
            "source_to_stage",
            "stage_to_target",
            "audit",
        ):
            assert r[f"{stage_name}_status"] == "completed"
    # the envelope actually ran: a phase-1 base wait per mismatched window
    assert len(waits) >= 8
    # and the target holds every source row (nothing was cleaned)
    assert inner.read_all().count() == pipe.source.count(DAY, DAY_END)


def test_run_batch_audit_mismatch_cleans_and_resets(spark, tmp_path):
    """R3 exhaustion on the batch path: a sink that permanently loses
    rows in one window never improves on recount, so that window is
    cleaned from the target and its control row fully reset (M4) while
    every other window completes."""

    class LossyBatchSink(DayPartitionedTableSink):
        def load_all(self, df):
            lost = (
                (F.col("window_day") == F.lit("2024-01-02").cast("date"))
                & (F.col("window_start") == "00-00")
                & (F.pmod(F.xxhash64(F.col("event_id")), F.lit(2)) == 0)
            )
            super().load_all(df.where(~lost))

    source = FileSource(spark, f"{SF_DIR}/events.parquet", ts_col="ts")
    stage = PartitionedParquetSink(spark, str(tmp_path / "stage"))
    target = LossyBatchSink(spark, str(tmp_path / "target"))
    control = ControlTable(spark, str(tmp_path / "control"))
    cfg = PipelineConfig(
        pipeline_name="lossy_batch", granularity="6h", tolerance_pct=1.0
    )
    pipe = WindowPipeline(spark, cfg, source, stage, target, control)

    pipe.run_batch(DAY, DAY_END)

    rows = {
        r["source_query_window_start_time"]: r for r in pipe.control.read().collect()
    }
    bad = rows[datetime(2024, 1, 2, 0, 0)]
    assert bad["pipeline_status"] == "pending"
    assert bad["count_match_status"] == "not_matched"
    assert bad["completed_stage_number"] == 0
    assert bad["pipeline_retry_count"] == 1
    assert bad["source_count"] is None  # M4 clears the counts
    # the lossy window's partition was cleaned from the target
    assert not target.exists(datetime(2024, 1, 2, 0, 0), datetime(2024, 1, 2, 6, 0))
    for ws, r in rows.items():
        if ws != datetime(2024, 1, 2, 0, 0):
            assert r["pipeline_status"] == "completed", ws
            assert r["count_match_status"] == "matched"


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
