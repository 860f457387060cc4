"""Control-table state machine tests (M1..M7, SURVEY.md §2.9):
claim → complete ×4 → completed; fail; audit reset; selective stale
reset; duplicate delete."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.control_table import (
    STAGES,
    ControlTable,
    default_record,
)


@pytest.fixture()
def ct(spark, tmp_path):
    table = ControlTable(spark, str(tmp_path / "control"))
    rec = default_record(
        "p1",
        ("events", "file", "parquet"),
        ("target", "file", "parquet"),
        datetime(2024, 1, 2, 0), datetime(2024, 1, 2, 1),
        stage_path="2024-01-02/00-00",
    )
    table.append_records([rec])
    return table


def _row(ct):
    return ct.read().collect()[0]


def test_append_generates_ids_and_defaults(ct):
    r = _row(ct)
    assert len(r["unique_source_id"]) == 32  # md5 hex
    assert r["pipeline_status"] == "pending"
    assert r["completed_stage_number"] == 0
    assert r["source_query_window_duration_minutes"] == 60
    assert r["query_window_start_day"].isoformat() == "2024-01-02"
    for s in STAGES:
        assert r[f"{s}_status"] == "pending"


def test_claim_and_complete_all_stages(ct):
    sid = _row(ct)["unique_source_id"]
    ct.claim(sid)
    r = _row(ct)
    assert r["pipeline_status"] == "in_progress"
    assert r["pipeline_start_time"] is not None

    started = datetime.utcnow()
    for i, stage in enumerate(STAGES, start=1):
        ct.complete_stage(sid, stage, started)
        r = _row(ct)
        assert r[f"{stage}_status"] == "completed"
        assert r["completed_stage_number"] == i
    assert r["pipeline_status"] == "completed"
    assert r["pipeline_end_time"] is not None


def test_fail_stage_resets_and_counts_retry(ct):
    sid = _row(ct)["unique_source_id"]
    ct.claim(sid)
    ct.fail_stage(sid, "source_discovery", "boom")
    r = _row(ct)
    assert r["pipeline_status"] == "failed"
    assert r["pipeline_retry_count"] == 1
    assert r["source_discovery_status"] == "pending"
    assert "boom" in r["pipeline_error_details"]


def test_audit_mismatch_full_reset(ct):
    sid = _row(ct)["unique_source_id"]
    ct.claim(sid)
    started = datetime.utcnow()
    for stage in STAGES[:3]:
        ct.complete_stage(sid, stage, started)
    ct.reset_after_audit_mismatch(sid)
    r = _row(ct)
    assert r["pipeline_status"] == "pending"
    assert r["completed_stage_number"] == 0
    assert r["count_match_status"] == "not_matched"
    assert r["pipeline_retry_count"] == 1
    for s in STAGES:
        assert r[f"{s}_status"] == "pending"
        assert r[f"{s}_start_time"] is None


def test_selective_stale_reset_keeps_completed_stages(ct):
    sid = _row(ct)["unique_source_id"]
    ct.claim(sid)
    started = datetime.utcnow()
    ct.complete_stage(sid, "source_discovery", started)
    ct.complete_stage(sid, "source_to_stage", started)
    ct.reset_stale_in_progress([sid])
    r = _row(ct)
    # completed stages survive (invalid_progress_handler.py:106-167)
    assert r["source_discovery_status"] == "completed"
    assert r["source_to_stage_status"] == "completed"
    assert r["stage_to_target_status"] == "pending"
    assert r["pipeline_status"] == "pending"
    assert r["pipeline_retry_count"] == 1


def test_delete_records(ct, spark):
    sid = _row(ct)["unique_source_id"]
    ct.delete_records([sid])
    assert ct.read().count() == 0
