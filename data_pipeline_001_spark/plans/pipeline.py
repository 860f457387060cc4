"""Windowed pipeline orchestrator — the Spark-native re-expression of
the reference's ``MainPipelineOrchestrator`` + ``StateManager`` flow
(core/main_pipeline_orchestrator.py:51-208, core/state_manager.py:169-196).

Lifecycle per run (reference step numbers preserved):
  0. populate          — fresh-start spine or backfill (gaps, missing
                         days, duplicate resolution)
  1. validate progress — reset stale in_progress records (R5 reaping)
  2. concurrency guard — exit if valid in_progress work exists
  3. pending selection — priority-ordered LIMIT n (W5)
  4. safe boundary     — drop windows newer than now - x_time_back (P7)
  5. per-window stages — discovery → source→stage → stage→target → audit

Stage work is DataFrame transforms against pluggable Source/Sink
connectors; control state lives in the ControlTable. The per-window
loop is driver-side (as in the reference) but each window's work is a
distributed Spark job; at very large window counts the same stages
compose into one job via ``groupBy(window)`` — see ``extract_all_windows``.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_pipeline_001_spark.functions import time_fns
from data_pipeline_001_spark.functions.hash_fns import percentage_difference
from data_pipeline_001_spark.operators.windows import (
    detect_gaps,
    resolve_duplicates,
    select_pending,
)
from data_pipeline_001_spark.plans.control_table import (
    STAGES,
    ControlTable,
    default_record,
)
from data_pipeline_001_spark.sources.base import Sink, Source


def render_templates(config: dict, max_passes: int = 5) -> dict:
    """F14: substitute ``{key}`` placeholders in string values with
    other config values (reference: hanlder_script.py:174-194 — the
    ``{env}/{index_group}/{index_name}`` pattern). Multi-pass so
    templates may reference templated values; unknown placeholders are
    left intact (same permissive behavior as str.format_map misses in
    the reference's loop)."""
    import re as _re

    out = dict(config)
    for _ in range(max_passes):
        changed = False
        scalars = {k: v for k, v in out.items() if isinstance(v, (str, int, float))}
        for k, v in out.items():
            if not isinstance(v, str) or "{" not in v:
                continue

            def sub(m):
                name = m.group(1)
                return str(scalars[name]) if name in scalars and name != k else m.group(0)

            new = _re.sub(r"\{(\w+)\}", sub, v)
            if new != v:
                out[k] = new
                changed = True
        if not changed:
            break
    return out


@dataclass
class PipelineConfig:
    """Layered config (reference: hanlder_script.py:117-194 merge of
    drive defaults < index config < Airflow vars)."""

    pipeline_name: str = "pipeline"
    granularity: str = "1h"
    x_time_back: str = "1d"
    max_pipeline_runs: int = 5
    tolerance_pct: float = 1.0
    timezone: str = "UTC"
    source_desc: tuple[str, str, str] = ("events", "file", "parquet")
    target_desc: tuple[str, str, str] = ("target", "file", "parquet")
    audit_max_retries: int = 3  # legacy cap; the R3 envelope tiers its own counts
    audit_base_wait_s: float = 60.0  # reference's nominal base wait (Snowpipe)
    audit_wait_scale: float = 0.0  # 0 = compute schedule but never block (sync sinks)
    # post-audit SPC gate (beyond the reference: audit_manager.py stops
    # at per-window count tolerance; the XmR chart over the control
    # table's own count series flags process-level anomalies — a window
    # that audits clean but is wildly out of line with history)
    spc_gate: bool = False
    spc_min_points: int = 6  # XmR limits are meaningless below this
    # F12 duration-estimate knobs (source_discovery_manager.py:190-202)
    avg_records_per_window: int = 100_000
    skew_factor: float = 0.5
    base_source_to_stage_minutes: int = 10
    base_stage_to_target_minutes: int = 5
    base_audit_minutes: int = 2
    extras: dict = field(default_factory=dict)

    @classmethod
    def merged(cls, *layers: dict) -> "PipelineConfig":
        """Merge config layers, later layers win (hanlder_script.py:117-132),
        then resolve ``{placeholder}`` templates against the merged
        values (F14, hanlder_script.py:174-194)."""
        final: dict = {}
        for layer in layers:
            final.update({k: v for k, v in layer.items() if v is not None})
        final = render_templates(final)
        known = {f for f in cls.__dataclass_fields__ if f != "extras"}
        kwargs = {k: v for k, v in final.items() if k in known}
        kwargs["extras"] = {k: v for k, v in final.items() if k not in known}
        return cls(**kwargs)


@dataclass
class RunResult:
    processed: int = 0
    completed: int = 0
    failed: int = 0
    reset: int = 0
    skipped_existing: int = 0
    exited_for_concurrency: bool = False


class WindowPipeline:
    def __init__(
        self,
        spark: SparkSession,
        config: PipelineConfig,
        source: Source,
        stage_sink: Sink,
        target_sink: Sink,
        control: ControlTable,
    ):
        self.spark = spark
        self.config = config
        self.source = source
        self.stage_sink = stage_sink
        self.target_sink = target_sink
        self.control = control

    def _scoped(self, ct: DataFrame) -> DataFrame:
        """Restrict control rows to THIS pipeline's descriptor — the
        reference always scopes drive-table operations by source
        name/category/subcategory (pending_records_selector.py), so a
        shared control table never lets one pipeline claim, reap, or
        overwrite another's windows."""
        c = self.config
        return ct.where(
            (F.col("pipeline_name") == c.pipeline_name)
            & (F.col("source_name") == c.source_desc[0])
            & (F.col("source_category") == c.source_desc[1])
            & (F.col("source_subcategory") == c.source_desc[2])
        )

    # ------------------------------------------------------------------ #
    # Step 0 — populate (state_manager.populate_pipeline_batches)
    # ------------------------------------------------------------------ #

    def populate(self, start: datetime, end: datetime) -> int:
        """Plan windows over [start, end): insert control rows for any
        window not already present (fresh start AND backfill collapse
        into one anti-join — J1 — instead of the reference's two code
        paths, state_manager.py:268-294 / 679-753)."""
        spine = time_fns.window_spine(
            self.spark, start, end, self.config.granularity
        )
        existing = self._scoped(self.control.read()).select(
            F.col("source_query_window_start_time").alias("window_start")
        )
        missing = spine.join(existing, "window_start", "left_anti")
        rows = missing.collect()  # spine rows only — bounded, never data-plane
        from data_pipeline_001_spark.sources.file_connectors import window_dir_name

        records = [
            default_record(
                self.config.pipeline_name,
                self.config.source_desc,
                self.config.target_desc,
                r["window_start"],
                r["window_end"],
                stage_path=window_dir_name(r["window_start"]),
                tolerance_pct=self.config.tolerance_pct,
            )
            for r in rows
        ]
        return self.control.append_records(records)

    def fill_gaps(self) -> int:
        """Backfill: detect per-day coverage gaps in the control table
        (W1) and insert windows at the pipeline granularity (M7)."""
        ct = self._scoped(self.control.read()).select(
            F.col("source_query_window_start_time").alias("window_start"),
            F.col("source_query_window_end_time").alias("window_end"),
            F.col("query_window_start_day").alias("window_day"),
        )
        if ct.isEmpty():
            return 0
        gaps = detect_gaps(ct, day_bounds=False).collect()
        inserted = 0
        for g in gaps:
            inserted += self.populate(g["gap_start"], g["gap_end"])
        return inserted

    def resolve_duplicate_windows(self) -> int:
        """W3 + M6: delete all but the best record per window key.

        Deletion keys on unique_run_id — identical re-planned windows
        share the deterministic unique_source_id, so run id is the
        only column that tells the copies apart.
        """
        ct = self._scoped(self.control.read())
        flagged = resolve_duplicates(
            ct, key_cols=("source_query_window_start_time",)
        )
        losers = [
            r["unique_run_id"]
            for r in flagged.where(~F.col("_keep"))
            .select("unique_run_id")
            .collect()
        ]
        self.control.delete_records(losers, key_col="unique_run_id")
        return len(losers)

    # ------------------------------------------------------------------ #
    # Step 1/2 — progress validation & concurrency guard
    # ------------------------------------------------------------------ #

    def _acceptable_runtime_minutes(self, row) -> float:
        """Σ expected stage durations, floor 10 min
        (progress_validator.py:82-159 semantics)."""
        total = 0
        for s in STAGES:
            total += row[f"{s}_expected_duration_minutes"] or 0
        return max(float(total), 10.0)

    def validate_in_progress(self, now: datetime | None = None) -> tuple[int, int]:
        """Returns (valid_count, reset_count). Stale rows (runtime >
        acceptable) get the selective M5 reset."""
        now = now or datetime.utcnow()
        rows = (
            self._scoped(self.control.read())
            .where(F.col("pipeline_status") == "in_progress")
            .collect()
        )
        stale, valid = [], 0
        for r in rows:
            started = r["pipeline_start_time"]
            runtime_min = (
                (now - started).total_seconds() / 60.0 if started else float("inf")
            )
            if runtime_min > self._acceptable_runtime_minutes(r):
                stale.append(r["unique_source_id"])
            else:
                valid += 1
        self.control.reset_stale_in_progress(stale)
        return valid, len(stale)

    # ------------------------------------------------------------------ #
    # Step 3/4 — pending selection + safe boundary
    # ------------------------------------------------------------------ #

    def pending_records(self, now: datetime | None = None) -> list:
        boundary = time_fns.rounded_past_timestamp(self.config.x_time_back, now)
        ct = self._scoped(self.control.read()).where(
            F.col("source_query_window_start_time") <= F.lit(boundary)
        )
        return select_pending(ct, self.config.max_pipeline_runs).collect()

    # ------------------------------------------------------------------ #
    # Step 5 — per-window stage execution
    # ------------------------------------------------------------------ #

    def _duration_estimates(self, source_count: int) -> dict[str, int]:
        """F12: per-stage expected durations from the discovery count
        (source_discovery_manager.py:186-271): linear for transfer,
        power-0.6 for load, sqrt for audit; ×(1+skew), floored at each
        stage's base. ratio<=1 short-circuits to the bases. Same curves
        as the column form `functions/hash_fns.py:scaled_duration_estimate`
        (oracle-checked by `scalar_duration_curves`); this is the
        one-control-row scalar path."""
        import math

        cfg = self.config
        avg = float(cfg.avg_records_per_window)
        ratio = source_count / avg if avg > 0 else 1.0
        bases = {
            "source_to_stage": float(cfg.base_source_to_stage_minutes),
            "stage_to_target": float(cfg.base_stage_to_target_minutes),
            "audit": float(cfg.base_audit_minutes),
        }
        if ratio <= 1.0:
            scaled = dict(bases)
        else:
            scaled = {
                "source_to_stage": bases["source_to_stage"] * ratio,
                "stage_to_target": bases["stage_to_target"] * ratio**0.6,
                "audit": bases["audit"] * math.sqrt(ratio),
            }
        skew = 1.0 + cfg.skew_factor
        return {
            f"{s}_expected_duration_minutes": max(int(scaled[s] * skew), int(bases[s]))
            for s in bases
        }

    def run_window(self, record) -> str:
        """Execute the 4-stage pipeline for one control row. Returns
        final status: 'completed' | 'failed' | 'reset'."""
        sid = record["unique_source_id"]
        start = record["source_query_window_start_time"]
        end = record["source_query_window_end_time"]
        self.control.claim(sid)

        stage = "source_discovery"
        try:
            # Stage 1 — source discovery: count + F12 duration estimates
            # (downstream staleness reaping keys on these, so a heavy
            # window gets a proportionally longer acceptable runtime)
            t0 = datetime.utcnow()
            src_count = self.source.count(start, end)
            self.control.complete_stage(
                sid,
                "source_discovery",
                t0,
                extra={
                    "source_count": src_count,
                    **self._duration_estimates(src_count),
                },
            )

            # Stage 2 — source → stage (idempotence short-circuit S3,
            # clean S4, extract S2)
            stage = "source_to_stage"
            t0 = datetime.utcnow()
            if self.stage_sink.exists(start, end):
                self.stage_sink.clean(start, end)
            self.stage_sink.load(self.source.extract(start, end), start, end)
            # free write-path loss check: the stage write's Observation
            # metrics (captured inside the write job, no extra scan)
            # must already match the plan-time source count — catching
            # an extract-side filter/shape bug here is one window-write
            # earlier (and one target-recount job cheaper) than audit
            written = getattr(self.stage_sink, "last_write_metrics", None)
            if written is not None and written["rows"] != src_count:
                from data_pipeline_001_spark.utils import pipeline_log

                pipeline_log.info(
                    "stage write row-count drift vs plan-time source count",
                    log_key="StageWrite",
                    status="WRITE_DRIFT",
                    window=str(start),
                    source_count=src_count,
                    written_rows=written["rows"],
                )
            self.control.complete_stage(sid, "source_to_stage", t0)

            # Stage 3 — stage → target (S6/S7/S5): read back the staged
            # window (one pruned directory) and load it into the target
            stage = "stage_to_target"
            t0 = datetime.utcnow()
            if self.target_sink.exists(start, end):
                self.target_sink.clean(start, end)
            staged_df = self.spark.read.parquet(
                self.stage_sink._window_path(start)  # type: ignore[attr-defined]
            )
            self.target_sink.load(staged_df, start, end)
            self.control.complete_stage(sid, "stage_to_target", t0)

            # Stage 4 — audit (A4 recount, A5 reconciliation, R3 retry)
            stage = "audit"
            t0 = datetime.utcnow()
            status = self._audit(sid, start, end, src_count, t0)
            # Stage 4b (optional) — post-audit SPC gate: the window's
            # audited count joins the pipeline's metrics series (the
            # control table itself) and is checked against the XmR
            # process limits
            if status == "completed" and self.config.spc_gate:
                # Observability only: a transient Spark error inside the
                # SPC collect must never flip a window whose audit
                # actually PASSED back to failed (that would corrupt
                # control-table status and trigger a spurious reset).
                try:
                    self._spc_check(start)
                except Exception as spc_exc:  # noqa: BLE001
                    from data_pipeline_001_spark.utils import pipeline_log

                    pipeline_log.info(
                        "SPC gate check errored (ignored; audit stands)",
                        log_key="Audit",
                        status="SPC_CHECK_ERROR",
                        window=str(start),
                        error=str(spc_exc),
                    )
            return status
        except Exception as exc:  # noqa: BLE001 — reference records any stage error
            # fail the stage that actually raised (reference keeps other
            # stages' state untouched: record_status_updater.py:102-123)
            self.control.fail_stage(sid, stage, str(exc))
            return "failed"

    def audit_spc_flags(self) -> DataFrame:
        """XmR control points over THIS pipeline's audited window
        counts — the post-audit SPC gate series. Each completed
        window's ``target_count`` is one individuals-chart point; the
        returned frame carries (window_start, value, xbar, ucl, lcl,
        n_points, out_of_control). The reference's audit ends at count
        tolerance (audit_manager.py:385-392); this catches the window
        whose count RECONCILES (source == target) but is anomalous
        against the pipeline's own history — a dropped upstream feed
        or a double-fired schedule produces exactly that signature."""
        from data_pipeline_001_spark.operators.constraints import (
            xmr_control_points,
        )

        series = (
            self._scoped(self.control.read())
            .where(
                (F.col("audit_status") == "completed")
                & F.col("target_count").isNotNull()
            )
            .select(
                F.col("source_query_window_start_time").alias(
                    "window_start"
                ),
                "target_count",
            )
        )
        return xmr_control_points(series, "window_start", "target_count")

    def _spc_check(self, start) -> None:
        """Log an SPC verdict for the just-audited window (run-flow
        hook behind ``config.spc_gate``). One collect of one row of a
        control-table-sized frame — never data-sized."""
        from data_pipeline_001_spark.utils import pipeline_log

        rows = (
            self.audit_spc_flags()
            .where(F.col("window_start") == start)
            .collect()
        )
        if not rows or rows[0]["n_points"] < self.config.spc_min_points:
            return
        r = rows[0]
        if r["out_of_control"]:
            pipeline_log.info(
                "window count out of control vs process history",
                log_key="Audit",
                status="SPC_OUT_OF_CONTROL",
                window=str(start),
                target_count=int(r["value"]),
                ucl=round(r["ucl"], 2),
                lcl=round(r["lcl"], 2),
            )

    @staticmethod
    def _pct(src_count: int, tgt_count: int) -> float:
        return (
            0.0
            if (src_count == 0 and tgt_count == 0)
            else (
                100.0
                if src_count == 0
                else (tgt_count - src_count) / src_count * 100.0
            )
        )

    def _sleep(self, seconds: float) -> None:
        """Audit wait hook. The reference sleeps real wall-clock between
        Snowpipe recounts; sync sinks set audit_wait_scale=0 (default)
        so the SCHEDULE is still computed/logged but nothing blocks.
        Tests may monkeypatch this to record the schedule."""
        if seconds > 0 and self.config.audit_wait_scale > 0:
            time.sleep(seconds * self.config.audit_wait_scale)

    def _audit(self, sid, start, end, src_count, t0) -> str:
        """A5 + R3: the reference's full two-phase adaptive envelope
        (audit_manager.py:123-383):

        Phase 1 — initial count; mismatch → tiered base attempts from
        |pct| (2–6), one base wait, recount. Match → done; no
        improvement → clean + reset.

        Phase 2 — improvement detected: extra retries + wait multiplier
        from the records/sec rate; waits grow ×(1+0.1·n), capped 180 s;
        two consecutive non-improving recounts abort; exhaustion →
        clean + reset (M4).
        """
        from data_pipeline_001_spark.utils import (
            adaptive_phase2_params,
            base_retry_attempts,
            phase2_wait_seconds,
            pipeline_log,
        )

        tol = self.config.tolerance_pct
        base_wait = self.config.audit_base_wait_s

        def done(tgt: int) -> str:
            self.control.complete_stage(
                sid,
                "audit",
                t0,
                extra={
                    "target_count": tgt,
                    "count_difference": tgt - src_count,
                    "count_difference_percentage": self._pct(src_count, tgt),
                    "count_match_status": "matched",
                },
            )
            return "completed"

        def clean_reset() -> str:
            # mismatch → clean + full reset (audit_manager.py:435-516)
            self.stage_sink.clean(start, end)
            self.target_sink.clean(start, end)
            self.control.reset_after_audit_mismatch(sid)
            return "reset"

        initial = self.target_sink.count(start, end)
        initial_pct = self._pct(src_count, initial)
        if abs(initial_pct) <= tol:
            return done(initial)

        # Phase 1 (audit_manager.py:125-199)
        base_attempts = base_retry_attempts(initial_pct)
        pipeline_log.info(
            "audit mismatch — starting adaptive retry",
            log_key="Audit",
            status="PHASE_1_STARTED",
            source_count=src_count,
            initial_target_count=initial,
            initial_pct=f"{initial_pct:.2f}%",
            base_retry_attempts=base_attempts,
        )
        self._sleep(base_wait)
        first = self.target_sink.count(start, end)
        if abs(self._pct(src_count, first)) <= tol:
            return done(first)
        improvement = first - initial
        if improvement <= 0:
            pipeline_log.info(
                "no improvement — cleanup and reset",
                log_key="Audit",
                status="NO_IMPROVEMENT_CLEANUP",
            )
            return clean_reset()

        # Phase 2 (audit_manager.py:235-383)
        rate = improvement / 60.0  # records/sec over the nominal base wait
        max_total, mult = adaptive_phase2_params(rate, base_attempts)
        pipeline_log.info(
            "improvement detected — adaptive phase 2",
            log_key="Audit",
            status="PHASE_2_ACTIVATED",
            improvement=improvement,
            improvement_rate=f"{rate:.2f} records/sec",
            max_total_retries=max_total,
            wait_multiplier=mult,
        )
        prev = first
        consecutive_no_improvement = 0
        for retry_num in range(2, max_total + 1):
            self._sleep(phase2_wait_seconds(retry_num, mult, base_wait))
            new = self.target_sink.count(start, end)
            if abs(self._pct(src_count, new)) <= tol:
                return done(new)
            if new > prev:
                consecutive_no_improvement = 0
            else:
                consecutive_no_improvement += 1
                if consecutive_no_improvement >= 2:
                    break
            prev = new
        return clean_reset()

    # ------------------------------------------------------------------ #
    # the full run loop
    # ------------------------------------------------------------------ #

    def run(
        self,
        plan_start: datetime,
        plan_end: datetime,
        now: datetime | None = None,
    ) -> RunResult:
        result = RunResult()
        self.populate(plan_start, plan_end)
        valid, reset = self.validate_in_progress(now)
        result.reset = reset
        if valid:
            result.exited_for_concurrency = True
            return result
        for record in self.pending_records(now):
            status = self.run_window(record)
            result.processed += 1
            if status == "completed":
                result.completed += 1
            elif status == "failed":
                result.failed += 1
            else:
                result.reset += 1
        return result

    # ------------------------------------------------------------------ #
    # scale path: all windows in ONE job (no driver loop)
    # ------------------------------------------------------------------ #

    def extract_all_windows(self, start: datetime, end: datetime) -> DataFrame:
        """The 100 TB shape of stage 2: one distributed job that tags
        every source row with its window — replacing the per-window
        driver loop when window count is large.

        The floor is anchored at ``start`` (floor((ts-start)/gran)·gran
        + start), matching the start-aligned spine populate() plans —
        an epoch-aligned floor would tag every row into windows the
        control table doesn't have whenever ``start`` is off-boundary,
        and run_batch's merge would silently match nothing."""
        df = self.source.extract(start, end)
        ts = F.col(getattr(self.source, "ts_col", "ts"))
        gran_s = time_fns.parse_granularity_minutes(self.config.granularity) * 60
        # anchor as a Column so ts and start share the session timezone
        t0 = F.unix_timestamp(F.lit(start))
        return (
            df.withColumn(
                "window_ts",
                F.timestamp_seconds(
                    (F.floor((F.unix_timestamp(ts) - t0) / gran_s) * gran_s + t0).cast(
                        "long"
                    )
                ),
            )
            .withColumn("window_day", F.to_date("window_ts"))
            .withColumn("window_start", F.date_format("window_ts", "HH-mm"))
        )

    def run_batch(self, plan_start: datetime, plan_end: datetime) -> DataFrame:
        """Whole-plan batch execution — N windows, THREE Spark jobs
        total (extract+stage write, target write, audit aggregation)
        plus one columnar control MERGE, instead of the per-window
        loop's ~5 jobs × N windows. Requires the target sink to
        support ``load_all`` (DayPartitionedTableSink).

        Returns the per-window audit DataFrame
        (window_start, source_count, target_count) as FIRST observed;
        windows whose initial audit mismatched then run the R3
        adaptive-retry envelope, so the control table holds the final
        per-window outcome (completed, or cleaned + reset).
        """
        self.populate(plan_start, plan_end)
        tagged = self.extract_all_windows(plan_start, plan_end)
        # one write for every window partition (dynamic overwrite keeps
        # re-runs idempotent per window)
        self.target_sink.load_all(tagged)
        # ONE aggregation for every window's audit counts (A4/A5 for
        # the whole plan at once): tag each side and conditionally
        # count over the union — one shuffle on window_start with
        # map-side partial aggregation, instead of two aggregations
        # plus a full-outer join (which shuffled both sides twice and
        # needed the join's null-coalescing). Window sets that exist
        # on only one side fall out naturally with a 0 on the other.
        src_side = tagged.select(
            F.col("window_ts").alias("window_start"),
            F.lit(1).alias("is_src"),
            F.lit(0).alias("is_tgt"),
        )
        tgt = self.target_sink.read_all()
        tgt_side = tgt.select(
            F.to_timestamp(
                F.concat_ws(
                    " ",
                    F.col("window_day").cast("string"),
                    F.regexp_replace("window_start", "-", ":"),
                )
            ).alias("window_start"),
            F.lit(0).alias("is_src"),
            F.lit(1).alias("is_tgt"),
        )
        audit = (
            src_side.unionByName(tgt_side)
            .groupBy("window_start")
            .agg(
                F.sum("is_src").alias("source_count"),
                F.sum("is_tgt").alias("target_count"),
            )
            # materialize (one row per window): the retry envelope below
            # may clean target partitions this plan's scan references,
            # and the caller re-evaluates the returned frame
            .localCheckpoint()
        )
        self.control.merge_audit_results(audit, self.config.pipeline_name)
        # R3 on the batch path: the columnar merge above records the
        # FIRST observation; windows it left mismatched (async sinks
        # may still be landing rows) get the same adaptive retry
        # envelope as the per-window loop — phase-1 tiered recount,
        # phase-2 improvement-driven waits, exhaustion → clean+reset.
        # Bounded driver work: one row per MISMATCHED window only,
        # each recount a partition-pruned count job on the sink.
        mismatched = (
            self._scoped(self.control.read())
            .where(
                (F.col("pipeline_status") == "pending")
                & (F.col("count_match_status") == "not_matched")
                & F.col("source_count").isNotNull()
            )
            .select(
                "unique_source_id",
                "source_query_window_start_time",
                "source_query_window_end_time",
                "source_count",
            )
            .collect()
        )
        for row in mismatched:
            status = self._audit(
                row["unique_source_id"],
                row["source_query_window_start_time"],
                row["source_query_window_end_time"],
                row["source_count"],
                datetime.utcnow(),
            )
            if status == "completed":
                # the columnar write DID run the earlier stages; mirror
                # the merge ok-path's stage bookkeeping for this row
                self.control.update_where(
                    F.col("unique_source_id") == row["unique_source_id"],
                    {f"{s}_status": "completed" for s in STAGES},
                )
        # audit rows with no control row would otherwise vanish silently
        # (both sides are bounded: one row per window)
        planned = self._scoped(self.control.read()).select(
            F.col("source_query_window_start_time").alias("window_start")
        )
        unmatched = audit.join(planned, "window_start", "left_anti").collect()
        if unmatched:
            import logging

            logging.getLogger(__name__).warning(
                "run_batch: %d audit window(s) matched no control row "
                "(first: %s) — check plan alignment",
                len(unmatched),
                unmatched[0]["window_start"],
            )
        return audit
