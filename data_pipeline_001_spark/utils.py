"""Cross-cutting reliability helpers (SURVEY.md §2.12).

- R1 retry decorator (reference: utils/log_retry_decorators.py:47-87)
- R2 timing decorator (reference: utils/log_retry_decorators.py:11-44)
- R3 adaptive-retry envelope math (reference: core/audit_manager.py:211-282)
- R4 structured block logger (reference: utils/log_generator.py:9-86)

Driver-side only: Spark already retries tasks and speculates stragglers
inside a job; these wrap whole pipeline stages / connector calls.
"""

from __future__ import annotations

import functools
import inspect
import logging
import time
from datetime import datetime, timezone

log = logging.getLogger("data_pipeline_001_spark")


# --------------------------------------------------------------------- #
# R3 — adaptive audit-retry envelope (audit_manager.py:211-282)
# --------------------------------------------------------------------- #

def base_retry_attempts(difference_percentage: float) -> int:
    """Tiered base attempts by |initial mismatch %|
    (audit_manager.py:211-233): ≤5→2, ≤15→3, ≤30→4, ≤50→5, else 6."""
    pct = abs(difference_percentage)
    if pct <= 5:
        return 2
    if pct <= 15:
        return 3
    if pct <= 30:
        return 4
    if pct <= 50:
        return 5
    return 6


def adaptive_phase2_params(
    improvement_rate: float, base_attempts: int
) -> tuple[int, float]:
    """(max_total_retries, wait_multiplier) from the records/sec
    improvement rate (audit_manager.py:245-258): faster catch-up buys
    more patience AND longer waits."""
    if improvement_rate >= 100:
        additional, mult = base_attempts * 2, 1.5
    elif improvement_rate >= 50:
        additional, mult = base_attempts * 1.5, 1.3
    elif improvement_rate >= 10:
        additional, mult = base_attempts * 1.2, 1.2
    else:
        additional, mult = float(base_attempts), 1.0
    return int(base_attempts + additional), mult


def phase2_wait_seconds(
    retry_num: int, wait_multiplier: float, base_wait: float = 60.0
) -> int:
    """Growing capped wait for phase-2 retry ``retry_num`` (2-based):
    base·mult·(1 + (n-2)·0.1), capped at 180 s
    (audit_manager.py:280-283)."""
    return min(int(base_wait * wait_multiplier * (1 + (retry_num - 2) * 0.1)), 180)


def retry_wait_schedule(
    initial_pct: float, improvement_rate: float, base_wait: float = 60.0
) -> list[int]:
    """Full wait envelope for one audit: phase-1 wait plus each phase-2
    wait (assuming improvement holds to exhaustion)."""
    base = base_retry_attempts(initial_pct)
    max_total, mult = adaptive_phase2_params(improvement_rate, base)
    return [int(base_wait)] + [
        phase2_wait_seconds(n, mult, base_wait) for n in range(2, max_total + 1)
    ]


# --------------------------------------------------------------------- #
# R4 — structured block logger (log_generator.py:9-86 shape)
# --------------------------------------------------------------------- #

class PipelineLogger:
    """Boxed key/status/dual-timezone log blocks. Same observable
    format as the reference's PipelineLogger (log_generator.py:9-86):

        +---- LOG START ----+
        | Key / Status / UTC+local timestamps / Caller / Message
        | Details: one line per kwarg
        +----- LOG END -----+

    stdlib-only (zoneinfo instead of pendulum); an invalid timezone
    degrades to a marker string rather than raising, as the reference
    does."""

    def __init__(self, logger_name: str = "PipelineLogger", max_depth: int = 3):
        self.logger = logging.getLogger(logger_name)
        self.max_depth = max_depth

    def _caller(self) -> str:
        stack = inspect.stack()
        trace = []
        try:
            for fi in stack[2 : self.max_depth + 2]:
                fname = fi.filename.split("/")[-1].split("\\")[-1]
                if fname not in ("utils.py", "logging_setup.py"):
                    trace.append(f"{fname}::{fi.function}")
        finally:
            del stack
        return " -> ".join(reversed(trace)) if trace else "unknown_caller"

    def format_block(self, message: str, tz: str = "UTC", **kwargs) -> str:
        log_key = kwargs.pop("log_key", None)
        status = kwargs.pop("status", None)
        now_utc = datetime.now(timezone.utc)
        try:
            from zoneinfo import ZoneInfo

            local = now_utc.astimezone(ZoneInfo(tz)).isoformat()
        except Exception:  # noqa: BLE001 — mirror reference's permissive handling
            local = f"Invalid Timezone ('{tz}')"
        block = "\n+-------------------- LOG START --------------------+"
        if log_key:
            block += f"\n| Key:       [ {log_key} ]"
        if status:
            block += f"\n| Status:    [ {status} ]"
        block += f"\n| Timestamp: UTC: {now_utc.isoformat()} | {tz}: {local}"
        block += f"\n| Caller:    {self._caller()}"
        block += f"\n| Message:   {message}"
        if kwargs:
            block += "\n| Details:"
            for k, v in kwargs.items():
                block += f"\n|   - {k}: {v}"
        block += "\n+--------------------- LOG END ---------------------+"
        return block

    def info(self, message: str = "", tz: str = "UTC", **kw):
        self.logger.info(self.format_block(message, tz, **kw))

    def warning(self, message: str = "", tz: str = "UTC", **kw):
        self.logger.warning(self.format_block(message, tz, **kw))

    def error(self, message: str = "", tz: str = "UTC", **kw):
        self.logger.error(self.format_block(message, tz, **kw))

    def exception(self, message: str = "", tz: str = "UTC", **kw):
        self.logger.exception(self.format_block(message, tz, **kw))


pipeline_log = PipelineLogger()


def retry(attempts: int = 3, delay_s: float = 1.0, exceptions=(Exception,)):
    """R1: N attempts, fixed delay, exception filter, logged."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last = None
            for i in range(1, attempts + 1):
                try:
                    return fn(*args, **kwargs)
                except exceptions as exc:  # noqa: PERF203
                    last = exc
                    log.warning(
                        "retry %s attempt %d/%d failed: %s", fn.__name__, i, attempts, exc
                    )
                    if i < attempts and delay_s:
                        time.sleep(delay_s)
            raise last

        return wrapper

    return deco


def timed(fn):
    """R2: log start/finish + wall duration."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        log.info("start %s", fn.__name__)
        try:
            return fn(*args, **kwargs)
        finally:
            log.info("finish %s in %.3fs", fn.__name__, time.perf_counter() - t0)

    return wrapper
