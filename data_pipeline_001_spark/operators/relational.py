"""Relational operators beyond stock DataFrame methods: as-of join,
range join, guarded reconciliation join (SURVEY.md §2.3/§2.4).

As-of join is implemented as union + last(ignorenulls) over an
ordered window — one shuffle on the partition key, no range
cross-product. This is the idiomatic Spark shape for "latest right
row ≤ left time"; a broadcast nested-loop range join would not
survive a 100× scale-up, this does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_time: str,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` (optionally matched on ``by`` keys).

    Implementation: tag both sides, union by name, sort within the
    ``by`` partition by (time, right-first) and carry right columns
    forward with ``last(..., ignorenulls=True)``; keep left rows.
    """
    value_cols = [c for c in right.columns if c != right_time and c not in by]
    left_cols = [c for c in left.columns]

    l = left.select(
        *by,
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols if c not in by],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("_rt"),
    )
    r = right.select(
        *by,
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in by],
        *[F.col(c) for c in value_cols],
        F.col(right_time).alias("_rt"),
    )
    u = l.unionByName(r)
    # right rows sort before left rows at equal times (_side 0 < 1), so a
    # right row at exactly left_time is visible to that left row (<=).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    u = u.withColumn("asof_time", F.last("_rt", ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).drop("_t", "_side", "_rt")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the (big, skewed) left side gets a
    deterministic salt in [0, salt); the right side replicates ×salt.
    The shuffle key becomes (key, salt), splitting a hot key's rows
    across ``salt`` reducers.

    AQE's skew-join handles most cases at runtime; explicit salting is
    for the pathological single-key hotspots AQE can't split (one key
    bigger than a whole executor). Salt is derived from xxhash64 of
    the full row so it is deterministic and spread-even.
    """
    salted_left = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).cast("int")
    )
    replicated_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(replicated_right, [key, "_salt"], how)
    return out.drop("_salt")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    how: str = "inner",
    broadcast_right: bool = True,
) -> DataFrame:
    """Interval/range join ``a.join(b, (a.s < b.e) & (b.s < a.e))``.

    When the right side is a bounded spine (windows, buckets) it is
    broadcast so the plan is a broadcast nested-loop scan of the big
    side — linear, no shuffle. For two large sides, pre-bucket both
    on a coarse time grain and join bucket-equal + range instead.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, condition, how)


def interval_bucket_join(
    left: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    grain_minutes: int,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Scalable point-in-interval join: both sides bucket to a coarse
    time grain; intervals explode to every bucket they cover; the join
    is EQUI on the bucket plus a residual range filter.

    Turns the O(|left|·|intervals|) nested-loop range join into a hash
    join whose cost is |left| + Σ interval_span/grain — the shape that
    survives two large sides. Pick ``grain_minutes`` ≈ the typical
    interval length so each interval explodes to ~1-2 buckets.
    """
    grain_s = grain_minutes * 60
    bucket = (F.unix_timestamp(F.col(ts_col)) / grain_s).cast("long")
    l = left.withColumn("_bucket", bucket)
    iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_col)) / grain_s).cast("long"),
                # end is exclusive: a bucket containing only `end` itself
                # holds no interval points
                ((F.unix_timestamp(F.col(end_col)) - 1) / grain_s).cast("long"),
            )
        ),
    )
    if broadcast_intervals:
        # bounded interval set (a window spine): broadcast it and the
        # big side never shuffles — the equi key still bounds probe work
        iv = F.broadcast(iv)
    return l.join(iv, "_bucket").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("_bucket")
