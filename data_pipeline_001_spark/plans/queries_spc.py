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
    metrics at any scale. The chart itself is factored as
    ``xmr_daily_rollup`` so the stream/batch parity test runs the
    IDENTICAL code over the incrementally-maintained daily table
    (integer-cents sums are associative, so the additive stream sink
    reproduces the batch daily table exactly)."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("rev_c")
        )
    )
    return xmr_daily_rollup(daily)


def xmr_daily_rollup(daily):
    """XmR chart over a (day, rev_c BIGINT cents) series — shared
    verbatim by the batch registry query and the streaming parity
    path (which maintains ``daily`` incrementally via
    ``versioned_stream_additive_sink``)."""
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
    return engagement_rollup(ud)


def engagement_rollup(ud: DataFrame) -> DataFrame:
    """The DAU/WAU/MAU + stickiness rollup over a distinct
    (user_id, day) activity frame — shared verbatim by the batch query
    above and the streaming path (stream_pipeline.engagement_* keeps
    ``ud`` current in a VersionedTable via the exactly-once merge sink;
    this rollup over the maintained table equals the batch result,
    asserted by tests/test_streaming.py parity)."""
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


# ---------------------------------------------------------------------
# Power-user curve (L28 histogram)
# ---------------------------------------------------------------------


@query(
    "events_power_user_curve",
    """
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      FROM events WHERE user_id IS NOT NULL
    ),
    per_user AS (
      SELECT user_id, COUNT(*) AS active_days FROM ud GROUP BY user_id
    ),
    tot AS (SELECT COUNT(*) AS n_users FROM per_user)
    SELECT CAST(active_days AS INT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(COUNT(*) / CAST(t.n_users AS DOUBLE), 6) AS user_share
    FROM per_user, tot t
    GROUP BY active_days, t.n_users
    ORDER BY active_days
    """,
)
def events_power_user_curve(spark, sf_dir):
    """Power-user curve: the histogram of active-days-per-user over
    the observed window (the growth-accounting "L28/LN" chart — a
    smile-shaped curve signals a habit product, a monotone decay
    signals drive-by usage). One distinct (user, day) reduction, one
    per-user count, one bounded histogram; exact counts with a single
    share division against the broadcast user total."""
    t = load_tables(spark, sf_dir)
    ud = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    per_user = ud.groupBy("user_id").agg(F.count("*").alias("active_days"))
    tot = per_user.agg(F.count("*").alias("n_users"))
    return (
        per_user.groupBy(F.col("active_days").cast("int").alias("active_days"))
        .agg(F.count("*").alias("n_users_bucket"))
        .crossJoin(F.broadcast(tot))
        .select(
            "active_days",
            F.col("n_users_bucket").cast("long").alias("n_users"),
            F.round(
                F.col("n_users_bucket") / F.col("n_users").cast("double"),
                6,
            ).alias("user_share"),
        )
        .orderBy("active_days")
    )


# ---------------------------------------------------------------------
# Log-likelihood-ratio collocations (Dunning 1993)
# ---------------------------------------------------------------------

_LLR_MIN_COUNT = 3
_LLR_TOPK = 15

_LLR_CELL = (
    "CASE WHEN {k} > 0 THEN {k} * LN({k} * CAST(n AS DOUBLE)"
    " / ({r} * CAST({c} AS DOUBLE))) ELSE 0 END"
)

_LLR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(tk, 1) AS INT) AS pos,
         unnest(tk) AS tok
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z]+') AS tk
        FROM documents)
), bi AS (
  SELECT tok AS w1,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
), bic AS (
  SELECT w1, w2, COUNT(*) AS k11
  FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2
), m1 AS (SELECT w1, SUM(k11) AS c1 FROM bic GROUP BY 1),
m2 AS (SELECT w2, SUM(k11) AS c2 FROM bic GROUP BY 1),
tot AS (SELECT SUM(k11) AS n FROM bic),
cells AS (
  SELECT b.w1, b.w2, b.k11,
         m1.c1 - b.k11 AS k12,
         m2.c2 - b.k11 AS k21,
         t.n - m1.c1 - m2.c2 + b.k11 AS k22,
         m1.c1, m2.c2, t.n
  FROM bic b JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN tot t
  WHERE b.k11 >= {_LLR_MIN_COUNT}
),
scored AS (
  SELECT w1, w2, k11,
         2.0 * ({_LLR_CELL.format(k='k11', r='c1', c='c2')}
              + {_LLR_CELL.format(k='k12', r='c1', c='(n - c2)')}
              + {_LLR_CELL.format(k='k21', r='(n - c1)', c='c2')}
              + {_LLR_CELL.format(k='k22', r='(n - c1)', c='(n - c2)')})
           AS llr
  FROM cells
)
SELECT w1, w2, CAST(k11 AS BIGINT) AS n_cooccur,
       ROUND(llr, 4) AS llr
FROM scored
ORDER BY ROUND(llr, 4) DESC, w1, w2
LIMIT {_LLR_TOPK}
"""


@query("text_collocations_llr", _LLR_ORACLE)
def text_collocations_llr(spark, sf_dir):
    """Log-likelihood-ratio collocations (Dunning 1993, public): the
    robust sibling of PMI — PMI explodes for rare pairs, LLR weighs
    the full 2x2 contingency table (k11..k22 from exact bigram
    margins), so the top collocations are the statistically
    surprising FREQUENT pairs. Counts and margins are exact integers;
    the four ln cells are evaluated once per surviving pair (>=3
    co-occurrences) and the ranking cuts on the 4-decimal-rounded
    score with lexicographic tiebreaks, so both engines select the
    same top-{{k}} despite last-ulp ln differences. Same one-LEAD
    bigram shuffle as the PMI query; the contingency join touches
    only the bounded surviving-pair table."""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        F.posexplode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.select(
        F.col("tok").alias("w1"), F.lead("tok").over(w).alias("w2")
    ).where(F.col("w2").isNotNull())
    bic = bi.groupBy("w1", "w2").agg(F.count("*").alias("k11"))
    m1 = bic.groupBy("w1").agg(F.sum("k11").alias("c1"))
    m2 = bic.groupBy("w2").agg(F.sum("k11").alias("c2"))
    tot = bic.agg(F.sum("k11").alias("n"))
    cells = (
        bic.where(F.col("k11") >= _LLR_MIN_COUNT)
        .join(m1, "w1")
        .join(m2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("c1") - F.col("k11")).alias("k12"),
            (F.col("c2") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("c1") - F.col("c2") + F.col("k11")).alias(
                "k22"
            ),
            "c1",
            "c2",
            "n",
        )
    )

    def cell(k, r, c):
        return F.when(
            k > 0, k * F.log(k * F.col("n").cast("double") / (r * c.cast("double")))
        ).otherwise(0.0)

    llr = 2.0 * (
        cell(F.col("k11"), F.col("c1"), F.col("c2"))
        + cell(F.col("k12"), F.col("c1"), F.col("n") - F.col("c2"))
        + cell(F.col("k21"), F.col("n") - F.col("c1"), F.col("c2"))
        + cell(
            F.col("k22"), F.col("n") - F.col("c1"), F.col("n") - F.col("c2")
        )
    )
    scored = cells.select(
        "w1", "w2", "k11", F.round(llr, 4).alias("llr")
    )
    return (
        scored.orderBy(F.col("llr").desc(), F.col("w1"), F.col("w2"))
        .limit(_LLR_TOPK)
        .select(
            "w1",
            "w2",
            F.col("k11").cast("long").alias("n_cooccur"),
            "llr",
        )
    )


# ---------------------------------------------------------------------
# Round 9: peak concurrency — the boundary-point interval sweep
# ---------------------------------------------------------------------

@query(
    "window_peak_concurrency",
    """
    WITH spans AS (
      SELECT ts AS s,
             LEAST(ts + INTERVAL 5 MINUTE,
                   CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS TIMESTAMP)) AS e
      FROM events
    ),
    pts AS (
      SELECT CAST(s AS DATE) AS day, s AS t, 1 AS delta FROM spans
      UNION ALL
      SELECT CAST(s AS DATE) AS day, e AS t, -1 AS delta FROM spans
    ),
    run AS (
      SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY t, delta) AS c
      FROM pts
    )
    SELECT day, CAST(MAX(c) AS BIGINT) AS peak_concurrency
    FROM run GROUP BY day
    """,
)
def window_peak_concurrency(spark, sf_dir):
    """Peak concurrent activity per day via the classic boundary-point
    sweep (gaps-and-islands family): each event opens a 5-minute
    activity span, clipped at midnight so days are independent; the
    span boundaries become (+1 at start, −1 at end) deltas, a
    day-partitioned running sum sweeps them in time order, and the
    day's peak is the max prefix sum. Engine-parity details that make
    the hash gate exact: half-open [s, e) semantics come from the tie
    rule ``ORDER BY t, delta`` (a −1 at instant t sorts before a +1
    at t, so an interval ending exactly when another starts never
    overlaps it), and BOTH engines' default window frame is RANGE …
    CURRENT ROW, which sums all peers of a (t, delta) group at once —
    so duplicate timestamps cannot make the running sum
    order-dependent.

    Scale: one union (no shuffle) and ONE shuffle on the day key for
    the window + the same-keyed max (Catalyst reuses the exchange).
    The per-day sweep needs a per-day total order; day keys are
    bounded (~2.4k) and events are ~uniform per day, so partitions
    are balanced at any corpus size. At extreme per-day volume the
    hierarchical variant (per-hour partial sums + prefix offsets)
    replaces the single in-partition sort; at this workload's shape
    the one-sort form is the faster plan.

    Round-10: the span/sweep pieces are shared verbatim with the
    streaming fold sink (operators/windows.activity_points /
    peak_sweep; stream/batch parity analytic #5 in
    streaming/stream_pipeline.py).
    """
    from data_pipeline_001_spark.operators.windows import (
        activity_points,
        peak_sweep,
    )

    t = load_tables(spark, sf_dir)
    return peak_sweep(activity_points(t["events"].select("ts")))
