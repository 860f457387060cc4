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


# ---------------------------------------------------------------------
# Lag-feature table (the time-series feature-engineering staple)
# ---------------------------------------------------------------------


@query(
    "ml_lag_features",
    f"""
    WITH {_DAILY_SQL.strip()},
    feat AS (
      SELECT day, rev_c,
             LAG(rev_c, 1) OVER w AS lag1,
             LAG(rev_c, 7) OVER w AS lag7,
             SUM(rev_c) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS s7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS c7,
             MIN(rev_c) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS min7,
             MAX(rev_c) OVER (ORDER BY day
                              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
               AS max7
      FROM daily WINDOW w AS (ORDER BY day)
    )
    SELECT CAST(day AS VARCHAR) AS day,
           ROUND(rev_c / 100.0, 2) AS y,
           ROUND(lag1 / 100.0, 2) AS lag_1d,
           ROUND(lag7 / 100.0, 2) AS lag_7d,
           ROUND(s7 / (100.0 * c7), 4) AS rolling_mean_7d,
           ROUND(min7 / 100.0, 2) AS rolling_min_7d,
           ROUND(max7 / 100.0, 2) AS rolling_max_7d
    FROM feat WHERE lag7 IS NOT NULL AND c7 = 7
    """,
)
def ml_lag_features(spark, sf_dir):
    """Supervised-learning feature table for the daily revenue
    series: lag-1/lag-7 targets and 7-day rolling mean/min/max —
    the standard autoregressive feature block every forecasting
    model trains on. Exact integer cents throughout (the rolling
    mean is one exact-sum division); rows with incomplete history
    are dropped, so every feature vector is fully populated. One
    ordered window pass over the calendar-bounded spine."""
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
    w7 = w.rowsBetween(-6, 0)
    feat = daily.select(
        "day",
        "rev_c",
        F.lag("rev_c", 1).over(w).alias("lag1"),
        F.lag("rev_c", 7).over(w).alias("lag7"),
        F.sum("rev_c").over(w7).alias("s7"),
        F.count("*").over(w7).alias("c7"),
        F.min("rev_c").over(w7).alias("min7"),
        F.max("rev_c").over(w7).alias("max7"),
    ).where(F.col("lag7").isNotNull() & (F.col("c7") == 7))
    return feat.select(
        F.col("day").cast("string").alias("day"),
        F.round(F.col("rev_c") / 100.0, 2).alias("y"),
        F.round(F.col("lag1") / 100.0, 2).alias("lag_1d"),
        F.round(F.col("lag7") / 100.0, 2).alias("lag_7d"),
        F.round(F.col("s7") / (100.0 * F.col("c7")), 4).alias(
            "rolling_mean_7d"
        ),
        F.round(F.col("min7") / 100.0, 2).alias("rolling_min_7d"),
        F.round(F.col("max7") / 100.0, 2).alias("rolling_max_7d"),
    )


# ---------------------------------------------------------------------
# Two-regressor OLS via exact decimal moments
# ---------------------------------------------------------------------


@query(
    "stats_lagged_regression",
    f"""
    WITH {_DAILY_SQL.strip()},
    counted AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c,
             COUNT(*) AS oc
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT CAST(rev_c AS DECIMAL(38, 0)) AS y,
             CAST(LAG(rev_c) OVER (ORDER BY day) AS DECIMAL(38, 0)) AS x1,
             CAST(LAG(oc) OVER (ORDER BY day) AS DECIMAL(38, 0)) AS x2
      FROM counted
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(x1) AS sx1, SUM(x2) AS sx2, SUM(y) AS sy,
             SUM(x1 * x1) AS sx11, SUM(x1 * x2) AS sx12,
             SUM(x2 * x2) AS sx22, SUM(x1 * y) AS sx1y,
             SUM(x2 * y) AS sx2y, SUM(y * y) AS syy
      FROM lagged WHERE x1 IS NOT NULL
    ),
    cov AS (
      SELECT n, sx1, sx2, sy, sx1y, sx2y, syy,
             CAST(n AS DOUBLE) * CAST(sx1y AS DOUBLE)
               - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE) AS c1y,
             CAST(n AS DOUBLE) * CAST(sx2y AS DOUBLE)
               - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE) AS c2y,
             CAST(n AS DOUBLE) * CAST(sx11 AS DOUBLE)
               - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) AS c11,
             CAST(n AS DOUBLE) * CAST(sx12 AS DOUBLE)
               - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE) AS c12,
             CAST(n AS DOUBLE) * CAST(sx22 AS DOUBLE)
               - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) AS c22
      FROM m
    ),
    sol AS (
      SELECT *,
             (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) AS b1,
             (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) AS b2
      FROM cov
    ),
    fit AS (
      SELECT *,
             (CAST(sy AS DOUBLE) - b1 * CAST(sx1 AS DOUBLE)
              - b2 * CAST(sx2 AS DOUBLE)) / n AS b0
      FROM sol
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(b1, 6) AS beta_lag_revenue,
           ROUND(b2, 6) AS beta_lag_orders,
           ROUND(b0 / 100.0, 4) AS intercept_dollars,
           ROUND(1.0 - (CAST(syy AS DOUBLE) - b0 * CAST(sy AS DOUBLE)
                        - b1 * CAST(sx1y AS DOUBLE)
                        - b2 * CAST(sx2y AS DOUBLE))
                 / (CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n), 6)
             AS r_squared
    FROM fit
    """,
)
def stats_lagged_regression(spark, sf_dir):
    """Two-regressor OLS: today's revenue on yesterday's revenue and
    yesterday's order count (the minimal autoregressive + covariate
    model), solved in closed form by Cramer's rule on the centered
    normal equations. Every moment (Σx, Σx², Σxy, …) accumulates as
    DECIMAL(38,0) — exact and order-independent at ANY scale, unlike
    a float sum or the built-in regr_* aggregates — and floats appear
    only in the final determinant ratios, computed once from
    identical exact inputs on both engines. One window pass + one
    aggregate over the bounded daily spine."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("rev_c"),
            F.count("*").alias("oc"),
        )
    )
    w = Window.orderBy("day")
    dec = "decimal(38,0)"
    lagged = daily.select(
        F.col("rev_c").cast(dec).alias("y"),
        F.lag("rev_c").over(w).cast(dec).alias("x1"),
        F.lag("oc").over(w).cast(dec).alias("x2"),
    ).where(F.col("x1").isNotNull())
    m = lagged.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("sx1"),
        F.sum("x2").alias("sx2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("sx11"),
        F.sum(F.col("x1") * F.col("x2")).alias("sx12"),
        F.sum(F.col("x2") * F.col("x2")).alias("sx22"),
        F.sum(F.col("x1") * F.col("y")).alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).alias("sx2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nn = d("n")
    cov = m.select(
        "n", "sx1", "sx2", "sy", "sx1y", "sx2y", "syy",
        (nn * d("sx1y") - d("sx1") * d("sy")).alias("c1y"),
        (nn * d("sx2y") - d("sx2") * d("sy")).alias("c2y"),
        (nn * d("sx11") - d("sx1") * d("sx1")).alias("c11"),
        (nn * d("sx12") - d("sx1") * d("sx2")).alias("c12"),
        (nn * d("sx22") - d("sx2") * d("sx2")).alias("c22"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det
    b2 = (F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det
    sol = cov.select(
        "n", "sx1", "sx2", "sy", "sx1y", "sx2y", "syy",
        b1.alias("b1"),
        b2.alias("b2"),
    )
    fit = sol.withColumn(
        "b0",
        (d("sy") - F.col("b1") * d("sx1") - F.col("b2") * d("sx2"))
        / d("n"),
    )
    sse = (
        d("syy")
        - F.col("b0") * d("sy")
        - F.col("b1") * d("sx1y")
        - F.col("b2") * d("sx2y")
    )
    sst = d("syy") - d("sy") * d("sy") / d("n")
    return fit.select(
        F.col("n").cast("long").alias("n_days"),
        F.round("b1", 6).alias("beta_lag_revenue"),
        F.round("b2", 6).alias("beta_lag_orders"),
        F.round(F.col("b0") / 100.0, 4).alias("intercept_dollars"),
        F.round(1.0 - sse / sst, 6).alias("r_squared"),
    )


# ---------------------------------------------------------------------
# DAU / WAU / MAU engagement metrics
# ---------------------------------------------------------------------


@query(
    "events_dau_wau_mau",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE user_id IS NOT NULL
    ),
    spine AS (SELECT DISTINCT day FROM ud),
    dau AS (
      SELECT day, COUNT(*) AS dau FROM ud GROUP BY day
    ),
    wau AS (
      SELECT s.day, COUNT(DISTINCT u.user_id) AS wau
      FROM spine s JOIN ud u
        ON u.day <= s.day AND u.day >= s.day - INTERVAL 6 DAY
      GROUP BY s.day
    ),
    mau AS (
      SELECT s.day, COUNT(DISTINCT u.user_id) AS mau
      FROM spine s JOIN ud u
        ON u.day <= s.day AND u.day >= s.day - INTERVAL 27 DAY
      GROUP BY s.day
    )
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST(m.mau AS BIGINT) AS mau,
           ROUND(d.dau / CAST(m.mau AS DOUBLE), 6) AS stickiness
    FROM dau d JOIN wau w USING (day) JOIN mau m USING (day)
    ORDER BY day
    """,
)
def events_dau_wau_mau(spark, sf_dir):
    """Daily / weekly / monthly active users and the DAU/MAU
    stickiness ratio — the canonical product-engagement rollup.

    Scale shape: reduce the event log ONCE to distinct (user, day)
    pairs (the only shuffle that touches raw volume), then EXPLODE
    each pair to the trailing windows it serves (7 rows for WAU, 28
    for MAU — constant fan-out, linear in active pairs, never a
    range join against the raw log) and count distinct per day. The
    oracle expresses the same trailing windows as a bounded
    spine-range join, fine at gate scale. All counts exact; the one
    float is the final stickiness division."""
    t = load_tables(spark, sf_dir)
    ud = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    spine = ud.select("day").distinct()
    dau = ud.groupBy("day").agg(F.count("*").alias("dau"))

    def trailing(n: int, name: str):
        fan = ud.select(
            "user_id",
            F.explode(
                F.sequence(
                    F.col("day"), F.date_add(F.col("day"), n - 1)
                )
            ).alias("day"),
        )
        return (
            fan.join(spine, "day")  # only days that exist in the log
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias(name))
        )

    wau = trailing(7, "wau")
    mau = trailing(28, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            F.col("day").cast("string").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.col("mau").cast("long").alias("mau"),
            F.round(
                F.col("dau") / F.col("mau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )
