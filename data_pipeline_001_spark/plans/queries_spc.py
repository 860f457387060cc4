"""Round-6 wave 8: statistical process control over the revenue
series — the monitoring surface an always-on 100 TB pipeline runs on
its own output metrics.

* ``quality_spc_xmr`` — XmR (individuals / moving-range) control
  chart: natural process limits from the mean moving range
  (Shewhart/Wheeler, public), exact integer-cents arithmetic until
  the final limit computation.
* ``time_hampel_filter`` — Hampel outlier filter: rolling 7-day
  median and MAD, flagging |x - med| > 3·1.4826·MAD. The whole
  decision runs on scaled BIGINTs (10000·|x-med| > 44478·MAD), so
  flags are engine-exact — the integer-cents CUSUM lesson applied to
  robust filtering.

NOTE: this module must stay LAST in ``__spark_entry__._registry``'s
import order — new registry entries queue behind the pinned coverage
backlog so the driver's prefix sample converges.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

_DAILY_SQL = """
daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
  FROM orders GROUP BY 1
)
"""


@query(
    "quality_spc_xmr",
    f"""
    WITH {_DAILY_SQL.strip()},
    ranged AS (
      SELECT day, rev_c,
             ABS(rev_c - LAG(rev_c) OVER (ORDER BY day)) AS mr
      FROM daily
    ),
    lims AS (
      SELECT COUNT(*) AS n,
             SUM(rev_c) / (100.0 * COUNT(*)) AS xbar,
             SUM(mr) / (100.0 * COUNT(mr)) AS mrbar
      FROM ranged
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(xbar, 4) AS xbar,
           ROUND(mrbar, 4) AS mrbar,
           ROUND(xbar + 2.66 * mrbar, 4) AS ucl,
           ROUND(xbar - 2.66 * mrbar, 4) AS lcl,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ranged, lims
            WHERE rev_c / 100.0 > xbar + 2.66 * mrbar) AS n_above_ucl,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ranged, lims
            WHERE rev_c / 100.0 < xbar - 2.66 * mrbar) AS n_below_lcl
    FROM lims
    """,
)
def quality_spc_xmr(spark, sf_dir):
    """XmR (individuals/moving-range) control chart over daily
    revenue: natural process limits xbar ± 2.66·mRbar from the mean
    absolute day-over-day range (Shewhart individuals chart, Wheeler's
    form — public). The moving range is exact BIGINT cents; xbar and
    mRbar are each one division of exact sums, so the limits and every
    in/out-of-control comparison are bit-identical across engines.
    One LAG window + one aggregate + a broadcast-scalar recount — the
    monitoring query a pipeline schedules against its own daily output
    metrics at any scale."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("rev_c")
        )
    )
    w = Window.orderBy("day")
    ranged = daily.select(
        "rev_c",
        F.abs(F.col("rev_c") - F.lag("rev_c").over(w)).alias("mr"),
    )
    lims = ranged.agg(
        F.count("*").alias("n"),
        (F.sum("rev_c") / (F.lit(100.0) * F.count("*"))).alias("xbar"),
        (F.sum("mr") / (F.lit(100.0) * F.count("mr"))).alias("mrbar"),
    )
    flagged = ranged.crossJoin(F.broadcast(lims)).agg(
        F.sum(
            (
                F.col("rev_c") / 100.0
                > F.col("xbar") + 2.66 * F.col("mrbar")
            ).cast("long")
        ).alias("n_above_ucl"),
        F.sum(
            (
                F.col("rev_c") / 100.0
                < F.col("xbar") - 2.66 * F.col("mrbar")
            ).cast("long")
        ).alias("n_below_lcl"),
    )
    return lims.crossJoin(F.broadcast(flagged)).select(
        F.col("n").cast("long").alias("n_days"),
        F.round("xbar", 4).alias("xbar"),
        F.round("mrbar", 4).alias("mrbar"),
        F.round(F.col("xbar") + 2.66 * F.col("mrbar"), 4).alias("ucl"),
        F.round(F.col("xbar") - 2.66 * F.col("mrbar"), 4).alias("lcl"),
        "n_above_ucl",
        "n_below_lcl",
    )


@query(
    "time_hampel_filter",
    f"""
    WITH {_DAILY_SQL.strip()},
    windowed AS (
      SELECT day, rev_c,
             list_sort(list(rev_c) OVER w) AS vals
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    scored AS (
      SELECT day, rev_c, vals[4] AS med,
             list_sort(list_transform(vals, v -> ABS(v - vals[4])))[4]
               AS mad
      FROM windowed WHERE len(vals) = 7
    )
    SELECT CAST(day AS VARCHAR) AS day,
           ROUND(rev_c / 100.0, 2) AS revenue,
           ROUND(med / 100.0, 2) AS rolling_median,
           ROUND(mad / 100.0, 2) AS rolling_mad
    FROM scored
    WHERE 10000 * ABS(rev_c - med) > 44478 * mad
    ORDER BY day
    """,
)
def time_hampel_filter(spark, sf_dir):
    """Hampel outlier filter over daily revenue: a day is an outlier
    when |x - med7| > 3·1.4826·MAD7 (rolling 7-day median and median
    absolute deviation, centered ROWS frame, full windows only). The
    7 window values are exact BIGINT cents collected into an array;
    median and MAD are order statistics of that sorted array, and the
    flag test is scaled-integer (10000·|x-med| > 44478·MAD), so the
    flagged set is engine-exact — no float enters any decision, the
    robust-filter counterpart of the integer-cents CUSUM. The window
    array is 7 elements regardless of scale; the spine is
    calendar-bounded."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("rev_c")
        )
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    windowed = daily.select(
        "day",
        "rev_c",
        F.array_sort(F.collect_list("rev_c").over(w)).alias("vals"),
    ).where(F.size("vals") == 7)
    med = F.element_at("vals", 4)
    scored = windowed.select(
        "day",
        "rev_c",
        med.alias("med"),
        F.element_at(
            F.array_sort(
                F.transform("vals", lambda v: F.abs(v - med))
            ),
            4,
        ).alias("mad"),
    )
    return (
        scored.where(
            10000 * F.abs(F.col("rev_c") - F.col("med"))
            > 44478 * F.col("mad")
        )
        .select(
            F.col("day").cast("string").alias("day"),
            F.round(F.col("rev_c") / 100.0, 2).alias("revenue"),
            F.round(F.col("med") / 100.0, 2).alias("rolling_median"),
            F.round(F.col("mad") / 100.0, 2).alias("rolling_mad"),
        )
        .orderBy("day")
    )
