"""Control table — the reference's 65-column Snowflake "drive table"
(core/state_manager.py:87-162) as a Parquet-backed Spark table with a
read-modify-overwrite MERGE layer.

One row per processing window; simultaneously work queue, lock, audit
ledger, and backfill planner. Mutations M1..M7 (SURVEY.md §2.9) are
conditional column rewrites — ``when(key∈ids, new).otherwise(old)`` —
followed by an atomic directory swap (write-temp + rename), the lake
equivalent of the reference's row-level ``UPDATE``.

Scale posture: the control table holds one row per *window*, not per
record — a year of hourly windows across 1000 pipelines is ~9M rows,
trivially a single-digit-GB Parquet table. Reads are partition-pruned
by ``query_window_start_day``; the full-rewrite MERGE stays cheap
because the table is small relative to the data plane.
"""

from __future__ import annotations

import os
import shutil
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_001_spark.functions.hash_fns import composite_md5_id

PIPELINE_STATUSES = ("pending", "in_progress", "completed", "failed")
STAGES = ("source_discovery", "source_to_stage", "stage_to_target", "audit")
STAGE_NUMBER = {s: i + 1 for i, s in enumerate(STAGES)}


def _stage_fields(stage: str) -> list[T.StructField]:
    return [
        T.StructField(f"{stage}_is_enabled", T.BooleanType()),
        T.StructField(f"{stage}_status", T.StringType()),
        T.StructField(f"{stage}_start_time", T.TimestampType()),
        T.StructField(f"{stage}_end_time", T.TimestampType()),
        T.StructField(f"{stage}_expected_duration_minutes", T.IntegerType()),
        T.StructField(f"{stage}_actual_duration_minutes", T.IntegerType()),
        T.StructField(f"{stage}_result", T.StringType()),
    ]


CONTROL_SCHEMA = T.StructType(
    [
        # identity (state_manager.py:89-92)
        T.StructField("unique_source_id", T.StringType(), False),
        T.StructField("unique_run_id", T.StringType()),
        T.StructField("unique_stage_id", T.StringType()),
        T.StructField("unique_target_id", T.StringType()),
        # pipeline metadata (state_manager.py:94-104)
        T.StructField("triggered_by", T.StringType()),
        T.StructField("pipeline_name", T.StringType()),
        T.StructField("pipeline_priority", T.DoubleType()),
        T.StructField("pipeline_start_time", T.TimestampType()),
        T.StructField("pipeline_end_time", T.TimestampType()),
        T.StructField("pipeline_status", T.StringType()),
        T.StructField("pipeline_error_details", T.StringType()),
        T.StructField("pipeline_retry_count", T.IntegerType()),
        T.StructField("completed_stage_number", T.IntegerType()),
        T.StructField("record_first_inserted_time", T.TimestampType()),
        T.StructField("record_last_updated_time", T.TimestampType()),
        # source/stage/target descriptors (state_manager.py:106-116)
        T.StructField("source_name", T.StringType()),
        T.StructField("source_category", T.StringType()),
        T.StructField("source_subcategory", T.StringType()),
        T.StructField("stage_name", T.StringType()),
        T.StructField("stage_category", T.StringType()),
        T.StructField("stage_subcategory", T.StringType()),
        T.StructField("target_name", T.StringType()),
        T.StructField("target_category", T.StringType()),
        T.StructField("target_subcategory", T.StringType()),
        # query window (state_manager.py:118-121)
        T.StructField("source_query_window_start_time", T.TimestampType()),
        T.StructField("source_query_window_end_time", T.TimestampType()),
        T.StructField("source_query_window_duration_minutes", T.IntegerType()),
        T.StructField("query_window_start_day", T.DateType()),
        # per-stage state ×4 (state_manager.py:123-153)
        *_stage_fields("source_discovery"),
        *_stage_fields("source_to_stage"),
        *_stage_fields("stage_to_target"),
        *_stage_fields("audit"),
        # audit metrics (state_manager.py:155-160)
        T.StructField("source_count", T.LongType()),
        T.StructField("target_count", T.LongType()),
        T.StructField("count_difference", T.LongType()),
        T.StructField("count_difference_percentage", T.DoubleType()),
        T.StructField("accepted_tolerance_percentage", T.DoubleType()),
        T.StructField("count_match_status", T.StringType()),
    ]
)


def _utcnow() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


def default_record(
    pipeline_name: str,
    source: tuple[str, str, str],
    target: tuple[str, str, str],
    window_start: datetime,
    window_end: datetime,
    stage_path: str,
    tolerance_pct: float = 1.0,
    triggered_by: str = "engine",
    priority: float = 1.0,
) -> dict:
    """Build one control row with reference defaults
    (config/drive_table_defaults.json:2-65; id gen state_manager.py:419-484)."""
    now = _utcnow()
    base = {f.name: None for f in CONTROL_SCHEMA.fields}
    dur = int((window_end - window_start).total_seconds() // 60)
    # placeholder — append_records derives the real md5 ids (F9)
    base["unique_source_id"] = ""
    base.update(
        triggered_by=triggered_by,
        pipeline_name=pipeline_name,
        pipeline_priority=priority,
        pipeline_status="pending",
        pipeline_retry_count=0,
        completed_stage_number=0,
        record_first_inserted_time=now,
        record_last_updated_time=now,
        source_name=source[0],
        source_category=source[1],
        source_subcategory=source[2],
        stage_name=stage_path,
        stage_category="filesystem",
        stage_subcategory="parquet",
        target_name=target[0],
        target_category=target[1],
        target_subcategory=target[2],
        source_query_window_start_time=window_start,
        source_query_window_end_time=window_end,
        source_query_window_duration_minutes=dur,
        query_window_start_day=window_start.date(),
        accepted_tolerance_percentage=tolerance_pct,
        count_match_status="pending",
    )
    for s in STAGES:
        base[f"{s}_is_enabled"] = True
        base[f"{s}_status"] = "pending"
    return base


class ControlTable:
    """Parquet-backed control table with atomic read-modify-overwrite."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- storage -----------------------------------------------------------

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def create_if_not_exists(self) -> None:
        """S9: CREATE TABLE IF NOT EXISTS (state_manager.py:56-81)."""
        if not self.exists():
            empty = self.spark.createDataFrame([], CONTROL_SCHEMA)
            empty.write.mode("overwrite").parquet(self.path)

    def read(self) -> DataFrame:
        self.create_if_not_exists()
        return self.spark.read.schema(CONTROL_SCHEMA).parquet(self.path)

    def _overwrite(self, df: DataFrame) -> None:
        """Atomic swap: write temp dir, rename over the live one.

        The lake replacement for the reference's transactional UPDATE;
        single-writer per the reference's concurrency model (R5).
        """
        tmp = f"{self.path}__tmp_{uuid.uuid4().hex[:8]}"
        df.select([f.name for f in CONTROL_SCHEMA.fields]).write.mode(
            "overwrite"
        ).parquet(tmp)
        old = f"{self.path}__old_{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    # -- inserts -----------------------------------------------------------

    def append_records(self, rows: list[dict]) -> int:
        """S8/M7: bulk append (snowflake_utils.py:146-165 analogue)."""
        if not rows:
            return 0
        df = self.spark.createDataFrame(rows, CONTROL_SCHEMA)
        df = df.withColumn(
            "unique_source_id",
            composite_md5_id(
                {
                    "pipeline_name": F.col("pipeline_name"),
                    "source_name": F.col("source_name"),
                    "window_start": F.col("source_query_window_start_time"),
                    "window_end": F.col("source_query_window_end_time"),
                }
            ),
        ).withColumn(
            "unique_run_id",
            composite_md5_id(
                {
                    "source_id": F.col("unique_source_id"),
                    "inserted": F.col("record_first_inserted_time"),
                }
            ),
        )
        self.create_if_not_exists()
        # append as a second write then compact via overwrite keeps the
        # swap atomic even on append
        merged = self.read().unionByName(df)
        self._overwrite(merged)
        return len(rows)

    # -- generic conditional update (the MERGE kernel for M1..M5) ----------

    def update_where(self, predicate, assignments: dict[str, object]) -> None:
        """Rewrite columns for rows matching ``predicate``.

        ``assignments`` values are Columns or literals; every update
        also bumps ``record_last_updated_time`` (reference behavior —
        every UPDATE sets it).
        """
        df = self.read()
        assignments = dict(assignments)
        assignments.setdefault("record_last_updated_time", F.lit(_utcnow()))
        for col_name, value in assignments.items():
            val = value if hasattr(value, "_jc") or hasattr(value, "_expr") else F.lit(value)
            field_type = CONTROL_SCHEMA[col_name].dataType
            df = df.withColumn(
                col_name,
                F.when(predicate, val.cast(field_type)).otherwise(F.col(col_name)),
            )
        self._overwrite(df)

    # -- M1..M6 ------------------------------------------------------------

    def claim(self, unique_source_id: str, run_id: str | None = None) -> None:
        """M1: claim/lock — pending → in_progress (record_status_updater.py:12-31)."""
        self.update_where(
            F.col("unique_source_id") == unique_source_id,
            {
                "pipeline_status": "in_progress",
                "pipeline_start_time": F.lit(_utcnow()),
                "unique_run_id": run_id or uuid.uuid4().hex,
            },
        )

    def complete_stage(
        self,
        unique_source_id: str,
        stage: str,
        started: datetime,
        extra: dict[str, object] | None = None,
    ) -> None:
        """M2: single-update stage completion
        (source_discovery_manager.py:111-152 et al.)."""
        now = _utcnow()
        assign: dict[str, object] = {
            f"{stage}_status": "completed",
            f"{stage}_start_time": started,
            f"{stage}_end_time": now,
            f"{stage}_actual_duration_minutes": max(
                int((now - started).total_seconds() // 60), 0
            ),
            "completed_stage_number": STAGE_NUMBER[stage],
        }
        if stage == STAGES[-1]:
            assign["pipeline_status"] = "completed"
            assign["pipeline_end_time"] = now
        assign.update(extra or {})
        self.update_where(F.col("unique_source_id") == unique_source_id, assign)

    def fail_stage(self, unique_source_id: str, stage: str, error: str) -> None:
        """M3: fail/reset one stage, retry_count+1
        (source_discovery_manager.py:154-175; record_status_updater.py:102-123)."""
        self.update_where(
            F.col("unique_source_id") == unique_source_id,
            {
                f"{stage}_status": "pending",
                f"{stage}_start_time": None,
                f"{stage}_end_time": None,
                "pipeline_status": "failed",
                "pipeline_error_details": error[:4096],
                "pipeline_retry_count": F.col("pipeline_retry_count") + 1,
            },
        )

    def reset_after_audit_mismatch(self, unique_source_id: str) -> None:
        """M4: full pipeline reset, keep not_matched + retry_count+1
        (audit_manager.py:435-516)."""
        assign: dict[str, object] = {
            "pipeline_status": "pending",
            "pipeline_start_time": None,
            "pipeline_end_time": None,
            "completed_stage_number": 0,
            "pipeline_retry_count": F.col("pipeline_retry_count") + 1,
            "count_match_status": "not_matched",
            "source_count": None,
            "target_count": None,
            "count_difference": None,
            "count_difference_percentage": None,
        }
        for s in STAGES:
            assign[f"{s}_status"] = "pending"
            assign[f"{s}_start_time"] = None
            assign[f"{s}_end_time"] = None
            assign[f"{s}_actual_duration_minutes"] = None
        self.update_where(F.col("unique_source_id") == unique_source_id, assign)

    def reset_stale_in_progress(self, unique_source_ids: list[str]) -> None:
        """M5: selective reset — only non-completed stages
        (invalid_progress_handler.py:106-167)."""
        if not unique_source_ids:
            return
        pred = F.col("unique_source_id").isin(unique_source_ids)
        df = self.read()
        for s in STAGES:
            not_done = pred & (F.col(f"{s}_status") != "completed")
            df = (
                df.withColumn(
                    f"{s}_status",
                    F.when(not_done, F.lit("pending")).otherwise(F.col(f"{s}_status")),
                )
                .withColumn(
                    f"{s}_start_time",
                    F.when(not_done, F.lit(None).cast("timestamp")).otherwise(
                        F.col(f"{s}_start_time")
                    ),
                )
                .withColumn(
                    f"{s}_end_time",
                    F.when(not_done, F.lit(None).cast("timestamp")).otherwise(
                        F.col(f"{s}_end_time")
                    ),
                )
            )
        df = (
            df.withColumn(
                "pipeline_status",
                F.when(pred, F.lit("pending")).otherwise(F.col("pipeline_status")),
            )
            .withColumn(
                "pipeline_retry_count",
                F.when(pred, F.col("pipeline_retry_count") + 1).otherwise(
                    F.col("pipeline_retry_count")
                ),
            )
            .withColumn(
                "record_last_updated_time",
                F.when(pred, F.lit(_utcnow())).otherwise(
                    F.col("record_last_updated_time")
                ),
            )
        )
        self._overwrite(df)

    def delete_records(
        self, ids: list[str], key_col: str = "unique_source_id"
    ) -> None:
        """M6: delete window records (state_manager.py:1107-1137).

        ``key_col='unique_run_id'`` for duplicate resolution: identical
        re-planned windows share the deterministic unique_source_id
        (it hashes pipeline+source+window), so only the run id — which
        folds in the insert time — distinguishes the copies.
        """
        if not ids:
            return
        self._overwrite(self.read().where(~F.col(key_col).isin(ids)))

    def merge_audit_results(
        self, results: DataFrame, pipeline_name: str | None = None
    ) -> None:
        """Columnar MERGE of per-window batch results — ONE overwrite
        for N windows instead of N row updates (the batch-path upgrade
        of M1+M2+A5; the reference does this row-at-a-time over
        Snowflake, main_pipeline_orchestrator.py:302-404).

        ``results`` columns: window_start timestamp, source_count long,
        target_count long. Every matched window gets all four stages
        completed + audit metrics; tolerance check decides
        completed vs the M4-style reset.

        ``pipeline_name`` scopes the merge: in a shared control table
        only that pipeline's rows are eligible to match (the reference
        always scopes drive-table updates by source descriptor). The
        results are also deduped on window_start (deterministic max per
        count) so a duplicated audit row can't fan the join out and
        duplicate control rows in the overwritten table.
        """
        now = _utcnow()
        r = (
            results.groupBy(F.col("window_start").alias("_ws"))
            .agg(
                F.max("source_count").alias("_sc"),
                F.max("target_count").alias("_tc"),
            )
        )
        cond = F.col("source_query_window_start_time") == F.col("_ws")
        if pipeline_name is not None:
            cond = cond & (F.col("pipeline_name") == F.lit(pipeline_name))
        df = self.read().join(r, cond, "left")
        matched = F.col("_ws").isNotNull()
        pct = (
            F.when((F.col("_sc") == 0) & (F.col("_tc") == 0), F.lit(0.0))
            .when(F.col("_sc") == 0, F.lit(100.0))
            .otherwise(
                (F.col("_tc") - F.col("_sc")).cast("double") / F.col("_sc") * 100.0
            )
        )
        ok = matched & (
            F.abs(pct) <= F.coalesce(F.col("accepted_tolerance_percentage"), F.lit(0.0))
        )
        assign = {
            "pipeline_status": F.when(ok, "completed").otherwise(
                F.when(matched, "pending").otherwise(F.col("pipeline_status"))
            ),
            "pipeline_end_time": F.when(ok, F.lit(now)).otherwise(
                F.col("pipeline_end_time")
            ),
            "completed_stage_number": F.when(ok, F.lit(4)).otherwise(
                F.when(matched, F.lit(0)).otherwise(F.col("completed_stage_number"))
            ),
            "source_count": F.when(matched, F.col("_sc")).otherwise(
                F.col("source_count")
            ),
            "target_count": F.when(matched, F.col("_tc")).otherwise(
                F.col("target_count")
            ),
            "count_difference": F.when(matched, F.col("_tc") - F.col("_sc")).otherwise(
                F.col("count_difference")
            ),
            "count_difference_percentage": F.when(matched, pct).otherwise(
                F.col("count_difference_percentage")
            ),
            "count_match_status": F.when(ok, "matched").otherwise(
                F.when(matched, "not_matched").otherwise(F.col("count_match_status"))
            ),
            "record_last_updated_time": F.when(matched, F.lit(now)).otherwise(
                F.col("record_last_updated_time")
            ),
        }
        for s in STAGES:
            assign[f"{s}_status"] = F.when(ok, "completed").otherwise(
                F.when(matched, "pending").otherwise(F.col(f"{s}_status"))
            )
        for col_name, expr in assign.items():
            df = df.withColumn(
                col_name, expr.cast(CONTROL_SCHEMA[col_name].dataType)
            )
        self._overwrite(df.drop("_ws", "_sc", "_tc"))
