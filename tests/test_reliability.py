"""R3/R4 reference fidelity: tiered adaptive-retry envelope
(audit_manager.py:211-282) and the structured block logger
(log_generator.py:9-86)."""

from datetime import datetime

from data_pipeline_001_spark.utils import (
    PipelineLogger,
    adaptive_phase2_params,
    base_retry_attempts,
    phase2_wait_seconds,
    retry,
    retry_wait_schedule,
    timed,
)

SF_DIR = "/root/testdata/sf0.001"


def test_base_retry_attempts_tiers():
    # ≤5→2, ≤15→3, ≤30→4, ≤50→5, else 6 (audit_manager.py:211-233)
    assert base_retry_attempts(0.0) == 2
    assert base_retry_attempts(5.0) == 2
    assert base_retry_attempts(5.1) == 3
    assert base_retry_attempts(15.0) == 3
    assert base_retry_attempts(30.0) == 4
    assert base_retry_attempts(50.0) == 5
    assert base_retry_attempts(50.1) == 6
    assert base_retry_attempts(-66.7) == 6  # sign-insensitive


def test_adaptive_phase2_params_rate_bands():
    # rate ≥100 → ×2 extra & 1.5; ≥50 → ×1.5 & 1.3; ≥10 → ×1.2 & 1.2;
    # else base & 1.0 (audit_manager.py:245-258)
    assert adaptive_phase2_params(150.0, 4) == (12, 1.5)
    assert adaptive_phase2_params(60.0, 4) == (10, 1.3)
    assert adaptive_phase2_params(20.0, 5) == (11, 1.2)
    assert adaptive_phase2_params(1.0, 3) == (6, 1.0)


def test_phase2_waits_grow_and_cap():
    # base 60, mult 1.5: 90, 99, 108, ... capped at 180
    waits = [phase2_wait_seconds(n, 1.5) for n in range(2, 15)]
    assert waits[:3] == [90, 99, 108]
    assert waits[-1] == 180  # 60·1.5·(1+10·0.1)=180; later ones stay capped
    assert all(a <= b for a, b in zip(waits, waits[1:]))


def test_full_wait_schedule_small_vs_massive_mismatch():
    # small mismatch, slow improvement: base 2 + 2 extra → 4 total →
    # waits [60 (phase 1), 60, 66, 72] and stop
    assert retry_wait_schedule(3.0, 1.0) == [60, 60, 66, 72]
    # massive mismatch, very fast improvement: 6 base → 18 total
    sched = retry_wait_schedule(80.0, 150.0)
    assert len(sched) == 18
    assert sched[0] == 60 and sched[1] == 90 and sched[-1] == 180


def test_audit_records_reference_wait_schedule(spark, tmp_path):
    """Integration: a mock-async window's audit requests exactly the
    reference's waits (recorded via the sleep hook; nothing blocks)."""
    from data_pipeline_001_spark.plans.control_table import ControlTable
    from data_pipeline_001_spark.plans.pipeline import PipelineConfig, WindowPipeline
    from data_pipeline_001_spark.sources.file_connectors import (
        FileSource,
        MockAsyncSink,
        PartitionedParquetSink,
    )

    source = FileSource(spark, f"{SF_DIR}/events.parquet", ts_col="ts")
    stage = PartitionedParquetSink(spark, str(tmp_path / "stage"))
    target = MockAsyncSink(
        PartitionedParquetSink(spark, str(tmp_path / "target")), reveal_steps=4
    )
    control = ControlTable(spark, str(tmp_path / "control"))
    cfg = PipelineConfig(pipeline_name="sched", granularity="6h", max_pipeline_runs=1)
    pipe = WindowPipeline(spark, cfg, source, stage, target, control)

    waits: list[float] = []
    pipe._sleep = waits.append  # record instead of sleeping

    pipe.populate(datetime(2024, 1, 2), datetime(2024, 1, 2, 6))
    rec = pipe.control.read().collect()[0]
    assert pipe.run_window(rec) == "completed"

    # reveal 1/4 → initial pct -75% → tier 6; improvement 1/4-per-count
    # at sf0.001 is slow (<10 rec/s) → mult 1.0 → waits 60, 60, 66
    # (match lands on the second phase-2 recount: 2/4, 3/4, 4/4)
    assert waits == [60, 60, 66]


def test_block_logger_format(caplog):
    import logging

    plog = PipelineLogger("test-block-logger")
    with caplog.at_level(logging.INFO, logger="test-block-logger"):
        plog.info(
            "window audited",
            tz="America/Los_Angeles",
            log_key="Audit",
            status="MATCHED",
            source_count=42,
        )
    out = caplog.text
    assert "LOG START" in out and "LOG END" in out
    assert "| Key:       [ Audit ]" in out
    assert "| Status:    [ MATCHED ]" in out
    assert "UTC:" in out and "America/Los_Angeles:" in out
    assert "- source_count: 42" in out
    assert "| Caller:" in out and "test_reliability.py" in out


def test_block_logger_invalid_timezone_degrades():
    plog = PipelineLogger("test-block-logger2")
    block = plog.format_block("hello", tz="Not/AZone")
    assert "Invalid Timezone ('Not/AZone')" in block


def test_retry_decorator_recovers():
    calls = {"n": 0}

    @retry(attempts=3, delay_s=0)
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ValueError("boom")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_timed_decorator_passthrough():
    @timed
    def f(x):
        return x * 2

    assert f(21) == 42
