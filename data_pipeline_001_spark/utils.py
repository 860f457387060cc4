"""Cross-cutting reliability helpers (SURVEY.md §2.12).

- R1 retry decorator (reference: utils/log_retry_decorators.py:47-87)
- R2 timing decorator (reference: utils/log_retry_decorators.py:11-44)

Driver-side only: Spark already retries tasks and speculates stragglers
inside a job; these wrap whole pipeline stages / connector calls.
"""

from __future__ import annotations

import functools
import logging
import time

log = logging.getLogger("data_pipeline_001_spark")


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
