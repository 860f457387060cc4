"""Round-8 wave: robust statistics, revenue concentration, RFM,
event-cadence and session-outcome analytics, and corpus-law text
stats (Zipf / hapax) — depth additions over the same tables, every
entry DuckDB-oracle-backed.

Two idioms this wave leans on:

- ``percentile_disc(p)`` as a zero-key (or grouped) aggregate is the
  exact rank-select quantile: smallest value whose cumulative count
  reaches p. Verified identical to the ``LIMIT 1 OFFSET (n-1)//2``
  lower median (tools round-8). It aggregates as a value→count map —
  partial-aggregated, memory bounded by distinct values, never a
  global sort — so it is the scale-safe exact quantile. Oracles state
  the same cut INTEGER-EXACTLY (``p_den*rn >= p_num*cnt`` over a
  window) so no float boundary can diverge between engines.
- Session analytics reuse the 30-minute lag-gap contract of
  ``window_sessionization`` (plans/queries.py) verbatim.

Reference parity: the reference's analytics stop at count/min/max
audits (data_pipeline_001 audit_manager.py); everything here is
engine-extension surface in the same §2.13 spirit as the curation/
quality families.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import load_tables, query

#: shared constants — generated into BOTH the Spark plan and the
#: oracle SQL so the two sides can never drift
ZIPF_TOP_K = 100
SESSION_GAP_MIN = 30
CONC_NUM, CONC_DEN = 9, 10  # top-decile cut: rank k with 10k >= 9n
MAD_SCALE_NUM = 44478  # 3 * 1.4826 (normal-consistency) * 10^4
MAD_SCALE_DEN = 10_000

_CUST_REV_SQL = """
cust_rev AS (
  SELECT o_custkey,
         CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         MAX(CAST(o_orderdate AS DATE)) AS last_day
  FROM orders GROUP BY 1
)
"""


def _cust_rev(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_c"),
        F.count("*").alias("n_orders"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_day"),
    )


# =====================================================================
# Robust statistics (SPC family)
# =====================================================================


@query(
    "stats_robust_zscore",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(ROUND(SUM(o_totalprice) * 100) AS BIGINT) AS rev_c
      FROM orders GROUP BY 1
    ),
    med AS (
      SELECT rev_c AS m FROM (
        SELECT rev_c, ROW_NUMBER() OVER (ORDER BY rev_c) AS rn,
               COUNT(*) OVER () AS n
        FROM daily
      ) WHERE 2 * rn >= n ORDER BY rev_c LIMIT 1
    ),
    mad AS (
      SELECT d AS mad_c FROM (
        SELECT ABS(rev_c - med.m) AS d,
               ROW_NUMBER() OVER (ORDER BY ABS(rev_c - med.m)) AS rn,
               COUNT(*) OVER () AS n
        FROM daily CROSS JOIN med
      ) WHERE 2 * rn >= n ORDER BY d LIMIT 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(MAX(med.m) AS BIGINT) AS median_rev_c,
           CAST(MAX(mad.mad_c) AS BIGINT) AS mad_c,
           CAST(SUM(CASE WHEN ABS(rev_c - med.m) * {MAD_SCALE_DEN}
                         > {MAD_SCALE_NUM} * mad.mad_c
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_days
    FROM daily CROSS JOIN med CROSS JOIN mad
    """,
)
def stats_robust_zscore(spark, sf_dir):
    """Median/MAD outlier days over daily revenue — the robust twin of
    the XmR chart (a single wild day cannot drag the center the way a
    mean/stddev z-score lets it). Cut: |x − median| > 3·1.4826·MAD,
    stated in scaled integers so both engines compare BIGINTs.
    Both medians are exact ``percentile_disc(0.5)`` zero-key
    aggregates (value→count map, bounded memory, no global sort); the
    oracle states the identical cut with an integer-exact
    ``2·rn ≥ n`` window rank. Three passes over the calendar-bounded
    daily frame; the 1-row broadcasts are gate-provable."""
    t = load_tables(spark, sf_dir)
    daily = t["orders"].groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.round(F.sum("o_totalprice") * 100).cast("long").alias("rev_c")
    )
    med = daily.agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY rev_c)")
        .cast("long")
        .alias("m")
    )
    with_m = daily.crossJoin(F.broadcast(med))
    mad = with_m.agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(rev_c - m))"
        )
        .cast("long")
        .alias("mad_c")
    )
    return (
        with_m.crossJoin(F.broadcast(mad))
        .agg(
            F.count("*").alias("n_days"),
            F.max("m").alias("median_rev_c"),
            F.max("mad_c").alias("mad_c"),
            F.sum(
                (
                    F.abs(F.col("rev_c") - F.col("m")) * MAD_SCALE_DEN
                    > F.lit(MAD_SCALE_NUM) * F.col("mad_c")
                ).cast("long")
            ).alias("n_outlier_days"),
        )
        .select(
            F.col("n_days").cast("long").alias("n_days"),
            F.col("median_rev_c").cast("long").alias("median_rev_c"),
            F.col("mad_c").cast("long").alias("mad_c"),
            F.col("n_outlier_days").cast("long").alias("n_outlier_days"),
        )
    )


# =====================================================================
# Revenue concentration + RFM (customer-level rollups)
# =====================================================================


@query(
    "agg_revenue_concentration",
    f"""
    WITH {_CUST_REV_SQL.strip().lstrip()},
    thr AS (
      SELECT rev_c AS t FROM (
        SELECT rev_c, ROW_NUMBER() OVER (ORDER BY rev_c) AS rn,
               COUNT(*) OVER () AS n
        FROM cust_rev
      ) WHERE {CONC_DEN} * rn >= {CONC_NUM} * n ORDER BY rev_c LIMIT 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(MAX(thr.t) AS BIGINT) AS threshold_rev_c,
           CAST(SUM(CASE WHEN rev_c >= thr.t THEN 1 ELSE 0 END) AS BIGINT)
             AS n_top,
           ROUND(SUM(CASE WHEN rev_c >= thr.t THEN rev_c ELSE 0 END)
                 / CAST(SUM(rev_c) AS DOUBLE), 6) AS top_share
    FROM cust_rev CROSS JOIN thr
    """,
)
def agg_revenue_concentration(spark, sf_dir):
    """Top-decile revenue concentration: the share of total revenue
    held by customers at or above the exact 90th-percentile customer
    revenue. Threshold via ``percentile_disc(0.9)`` (exact rank-select
    — smallest value with 10·rank ≥ 9·n, which the oracle states
    integer-exactly so no float boundary can diverge); ties at the
    threshold are included by value, deterministic on integer cents.
    One groupBy + two passes over the customer-sized rollup; never a
    global sort."""
    cust = _cust_rev(spark, sf_dir)
    thr = cust.agg(
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY rev_c)")
        .cast("long")
        .alias("t")
    )
    top = F.col("rev_c") >= F.col("t")
    return (
        cust.crossJoin(F.broadcast(thr))
        .agg(
            F.count("*").cast("long").alias("n_customers"),
            F.max("t").cast("long").alias("threshold_rev_c"),
            F.sum(top.cast("long")).cast("long").alias("n_top"),
            F.round(
                F.sum(F.when(top, F.col("rev_c")).otherwise(0))
                / F.sum("rev_c").cast("double"),
                6,
            ).alias("top_share"),
        )
    )


@query(
    "agg_customer_rfm",
    f"""
    WITH {_CUST_REV_SQL.strip().lstrip()},
    scored AS (
      SELECT NTILE(4) OVER (ORDER BY last_day DESC, o_custkey) AS r_q,
             NTILE(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f_q,
             NTILE(4) OVER (ORDER BY rev_c DESC, o_custkey) AS m_q
      FROM cust_rev
    )
    SELECT CAST(r_q AS INT) AS r_q, CAST(f_q AS INT) AS f_q,
           CAST(m_q AS INT) AS m_q,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored GROUP BY 1, 2, 3
    """,
)
def agg_customer_rfm(spark, sf_dir):
    """RFM segmentation: recency/frequency/monetary quartiles per
    customer (NTILE with the established exact-integer tiebreak
    contract — custkey breaks every tie, so both engines bucket
    identically), rolled up to the 4×4×4 segment grid with support
    counts — the audit that catches empty segments before a campaign
    targets them. The NTILE ranks run over the customer-sized rollup
    (the documented small-sf contract of the sketch-cut scale path,
    same as ml_quantile_binning)."""
    cust = _cust_rev(spark, sf_dir)
    return (
        cust.select(
            F.ntile(4)
            .over(Window.orderBy(F.col("last_day").desc(), "o_custkey"))
            .cast("int")
            .alias("r_q"),
            F.ntile(4)
            .over(Window.orderBy(F.col("n_orders").desc(), "o_custkey"))
            .cast("int")
            .alias("f_q"),
            F.ntile(4)
            .over(Window.orderBy(F.col("rev_c").desc(), "o_custkey"))
            .cast("int")
            .alias("m_q"),
        )
        .groupBy("r_q", "f_q", "m_q")
        .agg(F.count("*").alias("n_customers"))
    )


# =====================================================================
# Event cadence + session outcomes (events table)
# =====================================================================


@query(
    "events_interarrival",
    """
    WITH gaps AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - LAG(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    ),
    g AS (SELECT event_type, gap_us FROM gaps WHERE gap_us IS NOT NULL)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(MAX(p50) AS BIGINT) AS p50_gap_us,
           ROUND(AVG(gap_us) / 1e6, 6) AS avg_gap_s
    FROM (
      SELECT event_type, gap_us,
             MIN(CASE WHEN ok THEN gap_us END)
               OVER (PARTITION BY event_type) AS p50
      FROM (
        SELECT event_type, gap_us,
               2 * ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY gap_us)
                 >= COUNT(*) OVER (PARTITION BY event_type) AS ok
        FROM g
      )
    ) GROUP BY event_type
    """,
)
def events_interarrival(spark, sf_dir):
    """Inter-arrival cadence per event type: the gap from each event
    to the SAME USER's previous event (any type), attributed to the
    later event's type — exact lower-median and mean gap. Gaps in
    integer microseconds (``unix_micros``/``epoch_us``, both engines
    truncate the parquet NANOS identically), median via grouped
    ``percentile_disc(0.5)`` with the oracle's integer-exact
    ``2·rn ≥ n`` rank cut. One user-partitioned window pass + one
    grouped aggregate — the lag sort is local to each user."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = t["events"].select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_us)")
        .cast("long")
        .alias("p50_gap_us"),
        F.round(F.avg("gap_us") / 1e6, 6).alias("avg_gap_s"),
    )


@query(
    "events_session_conversion",
    f"""
    WITH gaps AS (
      SELECT user_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE THEN 1 ELSE 0 END AS new_session,
             ts, event_id
      FROM events
    ),
    sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid,
             event_type
      FROM gaps
    ),
    per_session AS (
      SELECT user_id, sid,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
             COUNT(*) AS n_events
      FROM sess GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           ROUND(SUM(converted) / CAST(COUNT(*) AS DOUBLE), 6) AS conversion_rate,
           ROUND(AVG(n_events), 6) AS avg_session_events
    FROM per_session
    """,
)
def events_session_conversion(spark, sf_dir):
    """Session-outcome rollup on the 30-minute gap-session contract of
    ``window_sessionization``: share of sessions containing a
    'purchase' event, plus mean session size — the canonical
    sessionized conversion metric. Same lag-gap + running-sum session
    id in both engines (exact integers end-to-end, one float division
    at the end); one user-partitioned window pass, session and final
    rollups reuse the user_id clustering."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = t["events"].select(
        "user_id",
        "event_type",
        F.when(
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"interval {SESSION_GAP_MIN} minutes"),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
        "ts",
        "event_id",
    )
    sess = gaps.select(
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sid"),
        "event_type",
    )
    per_session = sess.groupBy("user_id", "sid").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
        F.count("*").alias("n_events"),
    )
    return per_session.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.round(
            F.sum("converted") / F.count("*").cast("double"), 6
        ).alias("conversion_rate"),
        F.round(F.avg("n_events"), 6).alias("avg_session_events"),
    )


@query(
    "events_new_vs_returning",
    """
    WITH pairs AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE user_id IS NOT NULL
    ),
    first_seen AS (
      SELECT user_id, MIN(day) AS first_day FROM pairs GROUP BY 1
    )
    SELECT p.day,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(SUM(CASE WHEN f.first_day = p.day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_new,
           CAST(SUM(CASE WHEN f.first_day < p.day THEN 1 ELSE 0 END) AS BIGINT)
             AS n_returning
    FROM pairs p JOIN first_seen f USING (user_id)
    GROUP BY 1
    """,
)
def events_new_vs_returning(spark, sf_dir):
    """New-vs-returning user split per day: a user's first active day
    classifies them 'new' on that day, 'returning' after — the growth
    companion to DAU (events_dau_wau_mau shares the distinct
    (user, day) pair base). Distinct pairs once, a user-keyed
    first-day rollup, one join on the same user_id clustering —
    calendar-bounded output."""
    t = load_tables(spark, sf_dir)
    pairs = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    first_seen = pairs.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    return (
        pairs.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_active"),
            F.sum(
                (F.col("first_day") == F.col("day")).cast("long")
            ).cast("long").alias("n_new"),
            F.sum(
                (F.col("first_day") < F.col("day")).cast("long")
            ).cast("long").alias("n_returning"),
        )
    )


# =====================================================================
# Corpus-law text statistics (documents table)
# =====================================================================

_FREQ_SQL = r"""
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
    FROM documents
  ) WHERE tok <> '' GROUP BY tok
)
"""


def _token_freq(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+")
            ).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )


@query(
    "text_zipf_slope",
    f"""
    WITH {_FREQ_SQL.strip().lstrip()},
    top AS (
      SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS rank
      FROM (SELECT * FROM freq ORDER BY n DESC, tok ASC LIMIT {ZIPF_TOP_K})
    ),
    pts AS (SELECT LN(rank) AS x, LN(n) AS y FROM top)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6) AS zipf_slope
    FROM pts
    """,
)
def text_zipf_slope(spark, sf_dir):
    """Zipf's-law exponent of the corpus: OLS slope of ln(frequency)
    on ln(rank) over the top-{ZIPF_TOP_K} token ranks (deterministic
    rank: frequency desc, token asc). Natural corpora sit near −1;
    template/boilerplate-heavy corpora flatten — a one-number corpus
    health check for LLM data curation. The rank window runs AFTER a
    TakeOrdered top-K, so the single-partition sort touches exactly
    {ZIPF_TOP_K} rows; the frequency table itself is a plain groupBy."""
    freq = _token_freq(spark, sf_dir)
    top = (
        freq.orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(ZIPF_TOP_K)
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), F.col("tok").asc()))
            .alias("rank"),
            "n",
        )
    )
    pts = top.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    cnt = F.count("*")
    return pts.agg(
        cnt.cast("long").alias("n_points"),
        F.round(
            (cnt * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y"))
            / (cnt * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")),
            6,
        ).alias("zipf_slope"),
    )


@query(
    "text_hapax_ratio",
    f"""
    WITH {_FREQ_SQL.strip().lstrip()}
    SELECT CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
    FROM freq
    """,
)
def text_hapax_ratio(spark, sf_dir):
    """Hapax legomena share of the vocabulary (types occurring exactly
    once / all types) plus token/type totals — the vocabulary-richness
    companion to the Zipf slope (a high hapax share flags noisy or
    unnormalized text; near-zero flags templated text). One token
    explode + two aggregates, all integers until the final division."""
    freq = _token_freq(spark, sf_dir)
    hapax = F.sum((F.col("n") == 1).cast("long"))
    return freq.agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        hapax.cast("long").alias("n_hapax"),
        F.round(hapax / F.count("*").cast("double"), 6).alias(
            "hapax_ratio"
        ),
    )
