"""Property-based tests (SURVEY.md §5.4): driver-side invariants of
the duration parser and spine arithmetic under hypothesis; the Spark
spine itself is property-checked once per example-set (spine
partitions [start, end) with no gaps/overlaps — the self-verifying
detector pair)."""

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from data_pipeline_001_spark.functions.time_fns import (
    parse_duration_seconds,
    parse_granularity_minutes,
    rounded_past_timestamp,
)


@given(
    d=st.integers(0, 6),
    h=st.integers(0, 23),
    m=st.integers(0, 59),
    s=st.integers(0, 59),
)
def test_duration_roundtrip(d, h, m, s):
    spec = ""
    if d:
        spec += f"{d}d"
    if h:
        spec += f"{h}h"
    if m:
        spec += f"{m}m"
    if s:
        spec += f"{s}s"
    if not spec:
        return
    assert parse_duration_seconds(spec) == d * 86400 + h * 3600 + m * 60 + s


@given(minutes=st.integers(1, 1439))
def test_granularity_accepts_all_subday(minutes):
    h, m = divmod(minutes, 60)
    spec = (f"{h}h" if h else "") + (f"{m}m" if m else "")
    assert parse_granularity_minutes(spec) == minutes


@given(
    now=st.datetimes(
        min_value=datetime(2020, 1, 1), max_value=datetime(2030, 1, 1)
    ),
    back_h=st.integers(1, 72),
)
@settings(max_examples=50)
def test_safe_boundary_always_in_past_and_floored(now, back_h):
    b = rounded_past_timestamp(f"{back_h}h", now)
    assert b <= now
    assert b.minute == 0 and b.second == 0 and b.microsecond == 0
    # floor(now, hour) - back is exactly the boundary
    assert b == now.replace(minute=0, second=0, microsecond=0) - timedelta(hours=back_h)


def test_spine_partitions_range_for_many_granularities(spark):
    """For a sample of granularities: windows tile [start, end) exactly
    — total duration matches, no gaps, no overlaps (checked by our own
    W1/W2 detectors)."""
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.functions.time_fns import window_spine
    from data_pipeline_001_spark.operators.windows import detect_gaps, detect_overlaps

    start, end = "2024-03-01 00:00:00", "2024-03-02 00:00:00"
    for gran, n_expected in [("1h", 24), ("30m", 48), ("7h", 4), ("2h30m", 10)]:
        spine = window_spine(spark, start, end, gran)
        total_min = spine.agg(F.sum("duration_minutes")).first()[0]
        assert total_min == 1440, gran
        assert spine.count() == n_expected, gran
        assert detect_gaps(spine, day_bounds=False).count() == 0, gran
        assert detect_overlaps(spine).count() == 0, gran
