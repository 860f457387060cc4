"""Round-6 wave 3: forecasting, seasonal decomposition, rank
correlation, and the l-diversity privacy audit.

Four surfaces rounding out the time-series and governance families
(SURVEY.md §2.13; nearest reference surface is the staleness /
scaling-curve heuristics in `pipeline_logic/`, which extrapolate
pipeline lag but never model the series itself):

* ``time_holt_forecast`` — Holt double-exponential smoothing (level +
  trend) over the monthly revenue series with 1..3-step-ahead
  forecasts. A genuinely sequential recursion: Spark folds it with
  ``F.aggregate`` over the bounded sorted series; the oracle is a
  DuckDB ``WITH RECURSIVE`` running the *identical* per-step rounded
  arithmetic.
* ``time_seasonal_decompose`` — classical additive decomposition of
  daily revenue: centered 7-day moving-average trend, day-of-week
  seasonal indices from the detrended residual.
* ``stats_kendall_tau`` — Kendall's tau-b between daily revenue and
  daily order count, by exact integer pair classification over the
  bounded daily spine (the established bounded-quadratic-twin
  pattern).
* ``governance_l_diversity`` — distinct-value and entropy l-diversity
  of the sensitive attribute within each quasi-identifier group,
  extending the k-anonymity report (Machanavajjhala et al. 2007,
  public).

NOTE: this module must stay LAST in ``__spark_entry__._registry``'s
import order — new registry entries queue behind the pinned coverage
backlog so the driver's prefix sample converges.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

# ---------------------------------------------------------------------
# Holt double-exponential smoothing
# ---------------------------------------------------------------------

_HOLT_ALPHA = 0.3
_HOLT_BETA = 0.1

# Monthly revenue in exact dollars (integer-cents sum divided once):
# ~84 rows at ANY scale factor — the TPC-H date span is fixed, so the
# sequential fold is a constant-size problem.
_HOLT_ORACLE = f"""
WITH RECURSIVE monthly AS (
  SELECT ROW_NUMBER() OVER (ORDER BY m) AS t, x FROM (
    SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS m,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS x
    FROM orders GROUP BY 1
  )
),
holt AS (
  -- anchor types drive the recursion: both states must be DOUBLE or
  -- DuckDB coerces every step back to the 0.0 literal's DECIMAL(2,1)
  SELECT t, x AS l, CAST(0.0 AS DOUBLE) AS b FROM monthly WHERE t = 1
  UNION ALL
  SELECT m.t,
         ROUND({_HOLT_ALPHA} * m.x
               + {1 - _HOLT_ALPHA} * (h.l + h.b), 6),
         ROUND({_HOLT_BETA}
               * (ROUND({_HOLT_ALPHA} * m.x
                        + {1 - _HOLT_ALPHA} * (h.l + h.b), 6) - h.l)
               + {1 - _HOLT_BETA} * h.b, 6)
  FROM holt h JOIN monthly m ON m.t = h.t + 1
),
fin AS (SELECT t, l, b FROM holt ORDER BY t DESC LIMIT 1)
SELECT CAST(s.h AS INT) AS h,
       ROUND(fin.l + s.h * fin.b, 4) AS forecast,
       ROUND(fin.l, 4) AS level,
       ROUND(fin.b, 4) AS trend,
       CAST(fin.t AS BIGINT) AS n_months
FROM fin, range(1, 4) s(h)
ORDER BY h
"""


@query("time_holt_forecast", _HOLT_ORACLE)
def time_holt_forecast(spark, sf_dir):
    """Holt linear-trend smoothing (alpha=0.3, beta=0.1, l1=x1, b1=0)
    over the monthly revenue series, with 1/2/3-month-ahead forecasts
    f_h = l_N + h*b_N.

    Unlike EWMA (whose recursion has the scaled-cumsum closed form),
    Holt's two coupled states have no windowed closed form — this is
    the engine's honest sequential-fold surface. Spark runs it as
    ``F.aggregate`` over the sorted monthly array: the series is
    bounded (~84 rows at any scale factor — aggregating 100 TB down
    to it is the distributed part), so the fold is a constant-size
    expression, never a driver loop. The oracle is a DuckDB
    ``WITH RECURSIVE`` executing the same arithmetic. Determinism:
    each step ROUNDs both states to 6 decimals, so float error cannot
    compound across engines — the same discipline PageRank's
    inter-round rounding uses."""
    t = load_tables(spark, sf_dir)
    monthly = (
        t["orders"]
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"))
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / 100.0
            ).alias("x")
        )
    )
    series = monthly.agg(
        F.sort_array(F.collect_list(F.struct("m", "x"))).alias("s")
    )
    a, b1 = _HOLT_ALPHA, _HOLT_BETA
    folded = series.select(
        F.size("s").alias("n_months"),
        F.aggregate(
            F.slice(F.col("s"), 2, F.size("s") - 1),
            F.struct(
                F.element_at(F.col("s"), 1).x.alias("l"),
                F.lit(0.0).alias("b"),
            ),
            lambda acc, e: F.struct(
                F.round(
                    F.lit(a) * e.x + F.lit(1 - a) * (acc.l + acc.b), 6
                ).alias("l"),
                F.round(
                    F.lit(b1)
                    * (
                        F.round(
                            F.lit(a) * e.x
                            + F.lit(1 - a) * (acc.l + acc.b),
                            6,
                        )
                        - acc.l
                    )
                    + F.lit(1 - b1) * acc.b,
                    6,
                ).alias("b"),
            ),
        ).alias("st"),
    )
    return (
        folded.select(
            "n_months",
            F.col("st.l").alias("l"),
            F.col("st.b").alias("b"),
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("h"),
        )
        .select(
            F.col("h").cast("int").alias("h"),
            F.round(F.col("l") + F.col("h") * F.col("b"), 4).alias(
                "forecast"
            ),
            F.round("l", 4).alias("level"),
            F.round("b", 4).alias("trend"),
            F.col("n_months").cast("long").alias("n_months"),
        )
        .orderBy("h")
    )


# ---------------------------------------------------------------------
# Classical additive seasonal decomposition
# ---------------------------------------------------------------------


@query(
    "time_seasonal_decompose",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
      FROM orders GROUP BY 1
    ),
    trended AS (
      SELECT day, rev_c,
             SUM(rev_c) OVER w AS s7,
             COUNT(*) OVER w AS c7
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    )
    SELECT CAST(EXTRACT(dow FROM day) AS INT) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(SUM(rev_c) / (100.0 * COUNT(*)), 4) AS mean_revenue,
           ROUND(AVG(rev_c / 100.0 - s7 / (100.0 * c7)), 4) AS seasonal
    FROM trended WHERE c7 = 7
    GROUP BY 1 ORDER BY 1
    """,
)
def time_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition of daily revenue: trend =
    centered 7-day moving average (ROWS frame on the day-ordered
    spine — a ROWS frame, not a date-RANGE one, so both engines
    average the same 7 physical rows even where calendar days are
    missing), seasonal index = mean detrended residual per
    day-of-week, edges (partial windows) excluded. The trend is an
    exact BIGINT sum divided once; the residual mean is the only
    float summation, bounded by the ~350-row per-dow spine, far
    inside the 4-decimal round. dow is 0=Sunday..6 on both engines
    (Spark's 1-based dayofweek shifted)."""
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
    trended = daily.select(
        "day",
        "rev_c",
        F.sum("rev_c").over(w).alias("s7"),
        F.count("*").over(w).alias("c7"),
    ).where(F.col("c7") == 7)
    return (
        trended.groupBy(
            (F.dayofweek("day") - 1).cast("int").alias("dow")
        )
        .agg(
            F.count("*").alias("n_days"),
            F.round(F.sum("rev_c") / (100.0 * F.count("*")), 4).alias(
                "mean_revenue"
            ),
            F.round(
                F.avg(
                    F.col("rev_c") / 100.0
                    - F.col("s7") / (100.0 * F.col("c7"))
                ),
                4,
            ).alias("seasonal"),
        )
        .select(
            "dow",
            F.col("n_days").cast("long").alias("n_days"),
            "mean_revenue",
            "seasonal",
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------
# Kendall's tau-b (bounded quadratic twin)
# ---------------------------------------------------------------------


@query(
    "stats_kendall_tau",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rc,
             COUNT(*) AS oc
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT SUM(CASE WHEN (a.rc - b.rc) * (a.oc - b.oc) > 0
                      THEN 1 ELSE 0 END) AS nc,
             SUM(CASE WHEN (a.rc - b.rc) * (a.oc - b.oc) < 0
                      THEN 1 ELSE 0 END) AS nd,
             SUM(CASE WHEN a.rc = b.rc THEN 1 ELSE 0 END) AS tx,
             SUM(CASE WHEN a.oc = b.oc THEN 1 ELSE 0 END) AS ty,
             COUNT(*) AS n0
      FROM daily a JOIN daily b ON a.day < b.day
    )
    SELECT CAST(n0 AS BIGINT) AS n_pairs,
           CAST(nc AS BIGINT) AS concordant,
           CAST(nd AS BIGINT) AS discordant,
           ROUND((nc - nd)
                 / SQRT((n0 - tx) * CAST(n0 - ty AS DOUBLE)), 6)
             AS tau_b
    FROM pairs
    """,
)
def stats_kendall_tau(spark, sf_dir):
    """Kendall's tau-b rank correlation between daily revenue and
    daily order count, joining Spearman in the trend family with the
    estimator whose pair-classification form is EXACT: every pair of
    days is concordant/discordant/tied by integer comparison, the
    single float op is the final sqrt-division. The quadratic pair
    join runs on the bounded daily spine (~2,400 rows at any scale
    factor — 2.9M pairs), the established bounded-quadratic-twin
    pattern: the 100 TB input reduces to the spine FIRST, so the
    O(n^2) never touches raw data. Ties are handled per tau-b
    (pair-counted, equivalent to the per-group formula)."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("rc"),
            F.count("*").alias("oc"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    sgn = (F.col("a.rc") - F.col("b.rc")) * (F.col("a.oc") - F.col("b.oc"))
    pairs = a.join(b, F.col("a.day") < F.col("b.day")).agg(
        F.sum(F.when(sgn > 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(sgn < 0, 1).otherwise(0)).alias("nd"),
        F.sum(
            F.when(F.col("a.rc") == F.col("b.rc"), 1).otherwise(0)
        ).alias("tx"),
        F.sum(
            F.when(F.col("a.oc") == F.col("b.oc"), 1).otherwise(0)
        ).alias("ty"),
        F.count("*").alias("n0"),
    )
    return pairs.select(
        F.col("n0").cast("long").alias("n_pairs"),
        F.col("nc").cast("long").alias("concordant"),
        F.col("nd").cast("long").alias("discordant"),
        F.round(
            (F.col("nc") - F.col("nd"))
            / F.sqrt(
                (F.col("n0") - F.col("tx"))
                * (F.col("n0") - F.col("ty")).cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


# ---------------------------------------------------------------------
# l-diversity privacy audit
# ---------------------------------------------------------------------

_L_DIVERSITY = 3


@query(
    "governance_l_diversity",
    f"""
    WITH g AS (
      SELECT event_type,
             CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
             user_id % 100 AS sensitive,
             COUNT(*) AS n
      FROM events WHERE user_id IS NOT NULL
      GROUP BY 1, 2, 3
    ),
    per AS (
      SELECT event_type, hour_of_day, n,
             SUM(n) OVER (PARTITION BY event_type, hour_of_day) AS tn
      FROM g
    )
    SELECT event_type, hour_of_day,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS l_distinct,
           CAST(CASE WHEN COUNT(*) < {_L_DIVERSITY} THEN 1 ELSE 0 END
                AS INT) AS below_l,
           ROUND(-SUM((n / CAST(tn AS DOUBLE))
                      * LN(n / CAST(tn AS DOUBLE))), 6) AS entropy
    FROM per GROUP BY event_type, hour_of_day
    """,
)
def governance_l_diversity(spark, sf_dir):
    """l-diversity audit of the (event_type, hour-of-day)
    quasi-identifier groups with the user bucket as the sensitive
    attribute: distinct-value l, a below-l flag, and entropy
    l-diversity (Machanavajjhala et al. 2007, public) — the
    attribute-disclosure check that k-anonymity
    (``governance_k_anonymity``) alone misses: a large group whose
    sensitive values are all identical is k-anonymous yet fully
    disclosive. Two narrow aggregates; the entropy sum spans at most
    100 buckets per group, far inside the 6-decimal round."""
    t = load_tables(spark, sf_dir)
    g = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .groupBy(
            "event_type",
            F.hour("ts").cast("int").alias("hour_of_day"),
            (F.col("user_id") % 100).alias("sensitive"),
        )
        .agg(F.count("*").alias("n"))
    )
    wg = Window.partitionBy("event_type", "hour_of_day")
    p = F.col("n") / F.sum("n").over(wg).cast("double")
    per = g.select(
        "event_type", "hour_of_day", "n", (p * F.log(p)).alias("plogp")
    )
    return per.groupBy("event_type", "hour_of_day").agg(
        F.sum("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("l_distinct"),
        (F.count("*") < _L_DIVERSITY).cast("int").alias("below_l"),
        F.round(-F.sum("plogp"), 6).alias("entropy"),
    )


# ---------------------------------------------------------------------
# Holt-Winters triple exponential smoothing (additive, period 7)
# ---------------------------------------------------------------------

_HW_ALPHA = 0.3
_HW_BETA = 0.05
_HW_GAMMA = 0.2
_HW_PERIOD = 7


def _hw_oracle() -> str:
    a, b, g, p = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_PERIOD
    xs = [f"(SELECT x FROM daily WHERE t = {i})" for i in range(1, p + 1)]
    l0 = f"ROUND(({' + '.join(xs)}) / {p}.0, 6)"
    s0 = ", ".join(f"ROUND({x} - l, 6)" for x in xs)
    # the new level appears in both the trend and seasonal updates —
    # spelled out identically so every step is the same arithmetic
    lnew = f"ROUND({a} * (m.x - r.s[1]) + {1 - a} * (r.l + r.b), 6)"
    return f"""
    WITH RECURSIVE daily AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, x FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100.0 AS x
        FROM orders GROUP BY 1
      )
    ),
    init AS (
      SELECT {p} AS t, l, CAST(0.0 AS DOUBLE) AS b, [{s0}] AS s
      FROM (SELECT {l0} AS l)
    ),
    rec AS (
      SELECT t, l, b, s FROM init
      UNION ALL
      SELECT m.t,
             {lnew} AS l,
             ROUND({b} * ({lnew} - r.l) + {1 - b} * r.b, 6) AS b,
             r.s[2:{p}] ||
               [ROUND({g} * (m.x - {lnew}) + {1 - g} * r.s[1], 6)] AS s
      FROM rec r JOIN daily m ON m.t = r.t + 1
    ),
    fin AS (SELECT t, l, b, s FROM rec ORDER BY t DESC LIMIT 1)
    SELECT CAST(u.h AS INT) AS h,
           ROUND(fin.l + u.h * fin.b + fin.s[CAST(u.h AS INT)], 4)
             AS forecast,
           ROUND(fin.l, 4) AS level,
           ROUND(fin.b, 4) AS trend,
           ROUND(fin.s[CAST(u.h AS INT)], 4) AS seasonal,
           CAST(fin.t AS BIGINT) AS n_days
    FROM fin, range(1, {p + 1}) u(h)
    ORDER BY h
    """


@query("time_holt_winters", _hw_oracle())
def time_holt_winters(spark, sf_dir):
    """Holt-Winters additive triple smoothing over daily revenue
    (alpha=0.3, beta=0.05, gamma=0.2, weekly period): level + trend +
    a 7-slot seasonal state, with 1..7-day-ahead forecasts
    f_h = l + h*b + s_h. Completes the forecasting ladder (EWMA →
    Holt → Holt-Winters).

    Like Holt, the three coupled recursions have no windowed closed
    form; Spark folds them with ``F.aggregate`` over the sorted daily
    array — the seasonal state rides in the accumulator as an array
    that rotates one slot per step (consume head, append updated
    tail). The series is calendar-bounded (~2,400 rows at ANY scale
    factor), so the fold is constant-size; reducing 100 TB to the
    spine is the distributed part. The oracle is a 2,400-step DuckDB
    recursive CTE running the identical per-step-rounded arithmetic
    (round-6 both states + seasonal each step — error cannot
    compound). Seasonality is indexed by ROW position mod 7, which
    equals weekday only on a dense spine — true at these scales and
    in any production corpus; documented, not assumed."""
    t = load_tables(spark, sf_dir)
    a, b1, g, p = _HW_ALPHA, _HW_BETA, _HW_GAMMA, _HW_PERIOD
    daily = (
        t["orders"]
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                .cast("double")
                / 100.0
            ).alias("x")
        )
    )
    series = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("arr")
    )
    arr = F.col("arr")
    es = [F.element_at(arr, i).x for i in range(1, p + 1)]
    total = es[0]
    for e in es[1:]:
        total = total + e
    l0 = F.round(total / float(p), 6)
    s0 = F.array(*[F.round(e - l0, 6) for e in es])

    def step(acc, e):
        lnew = F.round(
            F.lit(a) * (e.x - F.element_at(acc.s, 1))
            + F.lit(1 - a) * (acc.l + acc.b),
            6,
        )
        return F.struct(
            lnew.alias("l"),
            F.round(
                F.lit(b1) * (lnew - acc.l) + F.lit(1 - b1) * acc.b, 6
            ).alias("b"),
            F.concat(
                F.slice(acc.s, 2, p - 1),
                F.array(
                    F.round(
                        F.lit(g) * (e.x - lnew)
                        + F.lit(1 - g) * F.element_at(acc.s, 1),
                        6,
                    )
                ),
            ).alias("s"),
        )

    folded = series.select(
        F.size(arr).alias("n_days"),
        F.aggregate(
            F.slice(arr, p + 1, F.size(arr) - p),
            F.struct(l0.alias("l"), F.lit(0.0).alias("b"), s0.alias("s")),
            step,
        ).alias("st"),
    )
    return (
        folded.select(
            "n_days",
            F.col("st.l").alias("l"),
            F.col("st.b").alias("b"),
            F.col("st.s").alias("s"),
            F.explode(F.array(*[F.lit(i) for i in range(1, p + 1)])).alias(
                "h"
            ),
        )
        .select(
            F.col("h").cast("int").alias("h"),
            F.round(
                F.col("l")
                + F.col("h") * F.col("b")
                + F.element_at(F.col("s"), F.col("h")),
                4,
            ).alias("forecast"),
            F.round("l", 4).alias("level"),
            F.round("b", 4).alias("trend"),
            F.round(F.element_at(F.col("s"), F.col("h")), 4).alias(
                "seasonal"
            ),
            F.col("n_days").cast("long").alias("n_days"),
        )
        .orderBy("h")
    )


# ---------------------------------------------------------------------
# Rolling one-step forecast backtest
# ---------------------------------------------------------------------

_BT_HOLDOUT = 28


@query(
    "forecast_backtest",
    f"""
    WITH daily AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, rev_c,
             COUNT(*) OVER () AS nn
      FROM (
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1
      )
    ),
    preds AS (
      SELECT t, rev_c, nn,
             LAG(rev_c, 1) OVER (ORDER BY t) AS p_naive,
             LAG(rev_c, 7) OVER (ORDER BY t) AS p_seasonal,
             CASE WHEN t > 2 THEN
               LAG(rev_c, 1) OVER (ORDER BY t)
               + CAST(ROUND((LAG(rev_c, 1) OVER (ORDER BY t)
                             - FIRST_VALUE(rev_c) OVER (ORDER BY t))
                            / CAST(t - 2 AS DOUBLE)) AS BIGINT)
             END AS p_drift
      FROM daily
    ),
    holdout AS (
      SELECT * FROM preds WHERE t > nn - {_BT_HOLDOUT}
    ),
    long AS (
      SELECT 'drift' AS method, rev_c, p_drift AS p FROM holdout
      UNION ALL
      SELECT 'naive', rev_c, p_naive FROM holdout
      UNION ALL
      SELECT 'seasonal_naive', rev_c, p_seasonal FROM holdout
    )
    SELECT method,
           CAST(COUNT(*) AS BIGINT) AS n_holdout,
           ROUND(SUM(ABS(rev_c - p)) / (100.0 * COUNT(*)), 4)
             AS mae_dollars,
           ROUND(100.0 * AVG(ABS(rev_c - p) / CAST(rev_c AS DOUBLE)), 6)
             AS mape_pct
    FROM long GROUP BY method ORDER BY method
    """,
)
def forecast_backtest(spark, sf_dir):
    """Rolling one-step backtest of three baseline forecasters over
    the last 28-day holdout of the daily revenue series: naive
    (yesterday), seasonal naive (same weekday last week), and drift
    (yesterday + average historical slope, integer-rounded). MAE is
    an exact integer-cents sum divided once; MAPE averages 28
    bounded per-row ratios. This is the model-evaluation loop the
    forecasting family (EWMA/Holt/Holt-Winters) plugs into — before
    trusting a smoother at 100 TB you beat these baselines on a
    holdout, and the baselines themselves are pure window expressions
    over the calendar-bounded spine."""
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
    spine = daily.select(
        F.row_number().over(w).alias("t"),
        "rev_c",
        F.count("*").over(Window.partitionBy()).alias("nn"),
        F.lag("rev_c", 1).over(w).alias("p_naive"),
        F.lag("rev_c", 7).over(w).alias("p_seasonal"),
        F.when(
            F.col("t") > 2,
            F.lag("rev_c", 1).over(w)
            + F.round(
                (F.lag("rev_c", 1).over(w) - F.first("rev_c").over(w))
                / (F.col("t") - 2).cast("double")
            ).cast("long"),
        ).alias("p_drift"),
    )
    holdout = spine.where(F.col("t") > F.col("nn") - _BT_HOLDOUT)
    parts = []
    for method, col in (
        ("drift", "p_drift"),
        ("naive", "p_naive"),
        ("seasonal_naive", "p_seasonal"),
    ):
        parts.append(
            holdout.select(
                F.lit(method).alias("method"),
                "rev_c",
                F.col(col).alias("p"),
            )
        )
    longf = parts[0].unionAll(parts[1]).unionAll(parts[2])
    err = F.abs(F.col("rev_c") - F.col("p"))
    return (
        longf.groupBy("method")
        .agg(
            F.count("*").cast("long").alias("n_holdout"),
            F.round(F.sum(err) / (100.0 * F.count("*")), 4).alias(
                "mae_dollars"
            ),
            F.round(
                100.0 * F.avg(err / F.col("rev_c").cast("double")), 6
            ).alias("mape_pct"),
        )
        .orderBy("method")
    )
