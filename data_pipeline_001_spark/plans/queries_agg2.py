"""Second wave of aggregate/scalar coverage (SURVEY.md §2.4/§2.8
breadth): grouping sets, exact percentiles, ordered string_agg,
conditional aggregation, point lookup (P4), sink path construction
(F15), date arithmetic. Registers into the shared REGISTRY.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables


@query(
    "agg_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube) via Spark SQL."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_exact_percentiles",
    """
    SELECT o_orderpriority,
           ROUND(quantile_cont(o_totalprice, 0.5), 6)  AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 6)  AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 6) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_percentiles(spark, sf_dir):
    """Exact continuous percentiles (Spark ``percentile`` ==
    DuckDB ``quantile_cont``); the approx variant is
    approx_percentile/percentile_approx for the at-scale path."""
    t = load_tables(spark, sf_dir)
    return t["orders"].groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 6).alias("p99"),
    )


@query(
    "agg_string_agg_ordered",
    """
    SELECT n_name, string_agg(c_name, ',' ORDER BY c_name) AS customers
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def agg_string_agg(spark, sf_dir):
    """Ordered string aggregation: array_sort(collect_list) + join —
    collect_list alone is order-nondeterministic, the sort makes it
    reproducible on any partitioning."""
    t = load_tables(spark, sf_dir)
    return (
        t["nation"]
        .join(t["customer"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("customers")
        )
    )


@query(
    "agg_conditional_counts",
    """
    SELECT event_type,
           COUNT(*) AS total,
           CAST(COUNT(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high,
           ROUND(COALESCE(SUM(value) FILTER (WHERE user_id IS NOT NULL), 0), 2) AS known_user_value,
           ROUND(AVG(CASE WHEN value > 50 THEN value END), 6) AS avg_high
    FROM events GROUP BY event_type
    """,
)
def agg_conditional(spark, sf_dir):
    """Conditional aggregation: count_if / filtered sums / CASE-avg."""
    t = load_tables(spark, sf_dir)
    return t["events"].groupBy("event_type").agg(
        F.count("*").alias("total"),
        F.count_if(F.col("value") > 50).alias("n_high"),
        F.round(
            F.coalesce(
                F.sum(F.when(F.col("user_id").isNotNull(), F.col("value"))), F.lit(0.0)
            ),
            2,
        ).alias("known_user_value"),
        F.round(F.avg(F.when(F.col("value") > 50, F.col("value"))), 6).alias("avg_high"),
    )


@query(
    "agg_statistics",
    """
    SELECT l_returnflag,
           ROUND(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           ROUND(covar_samp(l_extendedprice, l_quantity), 4) AS price_qty_covar,
           ROUND(stddev_samp(l_extendedprice), 6) AS price_stddev,
           ROUND(var_samp(l_discount), 6) AS disc_var
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_statistics(spark, sf_dir):
    """Statistical aggregates: correlation, covariance, stddev, variance."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_quantity"), 4).alias(
            "price_qty_covar"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("price_stddev"),
        F.round(F.var_samp("l_discount"), 6).alias("disc_var"),
    )


@query(
    "profile_columns",
    """
    SELECT 'event_type' AS column_name, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(event_type) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*),
           CAST(COUNT(*) - COUNT(user_id) AS BIGINT),
           CAST(COUNT(DISTINCT user_id) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'value', COUNT(*),
           CAST(COUNT(*) - COUNT(value) AS BIGINT),
           CAST(COUNT(DISTINCT value) AS BIGINT)
    FROM events
    """,
)
def profile_columns(spark, sf_dir):
    """Data-quality column profile (nulls + cardinality per column) —
    delegates to the general one-pass profiler
    (``operators/profiling.py``, round 4), which this query predates;
    kept as the events-table registry entry with its original output
    shape. At 100 TB use the profiler's default HLL distinct mode."""
    from data_pipeline_001_spark.operators.profiling import profile

    t = load_tables(spark, sf_dir)
    return profile(
        t["events"], ["event_type", "user_id", "value"], exact_distinct=True
    ).select(
        F.col("column").alias("column_name"),
        "n_rows",
        "n_null",
        "n_distinct",
    )


@query(
    "point_lookup_projection",
    """
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders WHERE o_orderkey = 42
    """,
)
def point_lookup(spark, sf_dir):
    """P4: key-equality point lookup + projection (the shape of every
    manager's _get_record_info; pushdown makes it an indexed-ish scan)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .where(F.col("o_orderkey") == 42)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


@query(
    "sink_path_construction",
    """
    SELECT DISTINCT
           strftime(date_trunc('hour', ts), '%Y-%m-%d/%H-%M') AS window_path,
           'stage/' || strftime(date_trunc('hour', ts), '%Y-%m-%d/%H-%M')
             || '/part-' || CAST(CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS VARCHAR) || '.parquet'
             AS file_path
    FROM events
    """,
)
def sink_paths(spark, sf_dir):
    """F15: deterministic stage-path construction
    (stage/ingestion_engine.py:62-99 'YYYY-MM-DD/HH-mm' layout) as a
    column expression — idempotence derives from this determinism."""
    t = load_tables(spark, sf_dir)
    h = F.date_trunc("hour", "ts")
    wp = F.date_format(h, "yyyy-MM-dd/HH-mm")
    return t["events"].select(
        wp.alias("window_path"),
        F.concat(
            F.lit("stage/"), wp, F.lit("/part-"),
            F.unix_timestamp(h).cast("string"), F.lit(".parquet"),
        ).alias("file_path"),
    ).distinct()


@query(
    "date_arithmetic",
    """
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_day,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch_start,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter
    FROM orders WHERE o_orderkey < 2000
    """,
)
def date_arithmetic(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .where(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.to_date(F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_day"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            ).alias("days_since_epoch_start"),
            F.year("o_orderdate").alias("order_year"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
    )


@query(
    "agg_salted_skew",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(MIN(l_extendedprice), 2) AS min_price,
           ROUND(MAX(l_extendedprice), 2) AS max_price
    FROM lineitem GROUP BY 1
    """,
)
def agg_salted(spark, sf_dir):
    """Skew-resistant two-phase aggregation (operators/relational.
    salted_agg): 3 group keys over the whole fact table is the
    pathological skew shape — phase 1 splits each hot key across 8
    salts, phase 2 merges. Result exactly equals the direct groupBy
    (the oracle)."""
    from data_pipeline_001_spark.operators.relational import salted_agg

    t = load_tables(spark, sf_dir)
    out = salted_agg(
        t["lineitem"],
        ("l_returnflag",),
        {
            "n": F.count("*"),
            "sum_qty": F.sum("l_quantity"),
            "min_price": F.min("l_extendedprice"),
            "max_price": F.max("l_extendedprice"),
        },
        salt=8,
    )
    return out.select(
        "l_returnflag",
        "n",
        F.round("sum_qty", 2).alias("sum_qty"),
        F.round("min_price", 2).alias("min_price"),
        F.round("max_price", 2).alias("max_price"),
    )


@query(
    "agg_retention_daily",
    """
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id)
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS INT) AS day_offset,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark, sf_dir):
    """Cohort retention triangle: users bucketed by first-seen day,
    distinct-active counts per (cohort, day offset) — the standard
    product-analytics rollup.

    Round-8 recovery: this query originally registered as
    ``agg_retention_cohorts``; when queries_mlprep later registered
    the weekly retention matrix under the same name, the registry's
    silent last-writer-wins overwrite left this daily triangle DEAD
    (unreachable) for several rounds. The ``query`` decorator now
    raises on duplicate names; this is the daily-granularity entry,
    renamed.

    Scale shape: the first-seen aggregate and the enrichment join both
    key on user_id, so the join is co-partitioned off one shuffle (AQE
    reuses the exchange); the final aggregate shuffles on the tiny
    (cohort, offset) key with a partial distinct underneath. No
    broadcast needed, no skew (user_id is high-cardinality-uniform).
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@query(
    "window_funnel_steps",
    """
    WITH per_user AS (
      SELECT user_id,
             MIN(ts) FILTER (WHERE event_type = 'view')     AS t_view,
             MIN(ts) FILTER (WHERE event_type = 'click')    AS t_click,
             MIN(ts) FILTER (WHERE event_type = 'signup')   AS t_signup,
             MIN(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
      FROM events GROUP BY user_id),
    staged AS (
      SELECT user_id,
             CASE
               WHEN t_view IS NULL THEN 0
               WHEN t_click IS NULL OR t_click < t_view THEN 1
               WHEN t_signup IS NULL OR t_signup < t_click THEN 2
               WHEN t_purchase IS NULL OR t_purchase < t_signup THEN 3
               ELSE 4
             END AS funnel_stage
      FROM per_user)
    SELECT funnel_stage, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM staged GROUP BY funnel_stage
    """,
)
def funnel_steps(spark, sf_dir):
    """Ordered conversion funnel (view → click → signup → purchase):
    a user sits at stage k when the first occurrences of the first k
    steps happen in order and step k+1 is missing or out of order.

    One shuffle total: conditional MIN aggregates collapse each user's
    history in a single groupBy (map-side partials do the heavy
    lifting); the stage CASE and final count are narrow. This is the
    funnel shape that survives 100 TB — no per-user sort, no window,
    no self-join per step.
    """
    t = load_tables(spark, sf_dir)
    ev = t["events"].select("user_id", "event_type", "ts")
    mins = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in ("view", "click", "signup", "purchase")
        ]
    )
    stage = (
        F.when(F.col("t_view").isNull(), 0)
        .when(F.col("t_click").isNull() | (F.col("t_click") < F.col("t_view")), 1)
        .when(F.col("t_signup").isNull() | (F.col("t_signup") < F.col("t_click")), 2)
        .when(
            F.col("t_purchase").isNull() | (F.col("t_purchase") < F.col("t_signup")), 3
        )
        .otherwise(4)
    )
    return (
        mins.select(stage.alias("funnel_stage"))
        .groupBy("funnel_stage")
        .agg(F.count("*").alias("n_users"))
    )


@query(
    "agg_hll_sketch_reaggregate",
    """
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS reagg_matches_direct,
           TRUE AS within_rsd_bound
    FROM events WHERE user_id IS NOT NULL GROUP BY event_type
    """,
)
def hll_sketch_reaggregate(spark, sf_dir):
    """MERGEABLE distinct-count sketches (DataSketches HLL): per-day
    sketches built once, then rolled up per event type with
    ``hll_union_agg`` — the two-level shape that makes distinct counts
    cheap at 100 TB (daily partials are KB-sized and re-aggregate
    without touching raw data; approx_count_distinct can't be re-rolled
    from saved results). HLL register state is a max over hashes, so
    union-of-partials is EXACTLY the direct sketch — the query asserts
    that equality, plus the rsd contract vs the exact count (the
    cross-engine gate checks both flags and the exact twin; sketch
    bytes themselves are engine-specific)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    reagg = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_reagg")
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est_direct"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return direct.join(reagg, "event_type").select(
        "event_type",
        "exact_users",
        (F.col("est_reagg") == F.col("est_direct")).alias(
            "reagg_matches_direct"
        ),
        (
            F.abs(F.col("est_reagg") - F.col("exact_users"))
            <= F.greatest(
                F.col("exact_users") * F.lit(5 * 0.0208), F.lit(1.0)
            )
        ).alias("within_rsd_bound"),
    )


@query(
    "agg_kll_quantile_sketch",
    """
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
           TRUE AS rank_err_ok
    FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
)
def kll_quantile_sketch(spark, sf_dir):
    """Streaming-quantile sketch (DataSketches KLL): the sketch's
    median estimate must sit within the published rank-error bound —
    asserted by computing the TRUE rank of the estimate against the
    exact distribution (|rank − 0.5| ≤ 0.03 at default k=200). KLL
    partials merge like HLL's, which is what percentile dashboards
    roll up at scale instead of re-scanning history. The oracle checks
    the contract flag, the exact-median twin column, and the count."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("value").isNotNull())
    est = ev.groupBy("event_type").agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("value"), F.lit(0.5)
        ).alias("est_p50")
    )
    return (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("value").alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
            (
                F.abs(
                    F.avg((F.col("value") <= F.col("est_p50")).cast("double"))
                    - 0.5
                )
                <= 0.03
            ).alias("rank_err_ok"),
        )
    )


@query(
    "agg_content_checksum",
    """
    WITH h AS (SELECT CAST(ts AS DATE) AS day,
                      CAST(('0x' || substr(md5(concat_ws('|',
                           COALESCE(CAST(event_id AS VARCHAR), '␀'),
                           COALESCE(CAST(user_id AS VARCHAR), '␀'),
                           COALESCE(event_type, '␀'),
                           COALESCE(props, '␀'))), 1, 15))::UBIGINT
                           AS HUGEINT) AS hv
               FROM events)
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(hv) % 2305843009213693951 AS BIGINT) AS checksum
    FROM h GROUP BY day
    """,
)
def content_checksum_q(spark, sf_dir):
    """Per-day order-insensitive CONTENT checksum of the events table
    — the deep-audit primitive behind content reconciliation
    (operators/constraints.content_checksum). The oracle recomputes
    the same 60-bit md5 arithmetic, so the checksum VALUE itself must
    agree across engines: any row-level divergence between the two
    reads would flip it. One scan, one narrow agg."""
    from data_pipeline_001_spark.operators.constraints import (
        content_checksum,
    )

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count("*").alias("n_rows"),
            content_checksum(
                ["event_id", "user_id", "event_type", "props"]
            ).alias("checksum"),
        )
    )


@query(
    "join_hint_shuffle_hash",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           ROUND(SUM(l_extendedprice), 2) AS total_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def join_hint_shuffle_hash(spark, sf_dir):
    """Join-strategy control: the SHUFFLE_HASH hint overrides
    Catalyst's default sort-merge choice for this fact-fact join —
    the right call when one side comfortably fits a per-task hash map
    (build-side rows / shuffle partitions), because it skips BOTH
    sort passes. The hint is advisory surface the engine exposes to
    users who know their data; plan-shape test asserts it actually
    takes effect (ShuffledHashJoin, no SortMergeJoin)."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .join(
            t["orders"].hint("shuffle_hash"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("total_price"),
        )
    )


@query(
    "window_rank_distribution",
    """
    WITH u AS (SELECT user_id, SUM(value) AS total
               FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
               GROUP BY user_id)
    SELECT user_id,
           ROUND(total, 6) AS total,
           ROUND(PERCENT_RANK() OVER (ORDER BY total), 6) AS pct_rank,
           ROUND(CUME_DIST() OVER (ORDER BY total), 6) AS cume,
           CAST(NTILE(10) OVER (ORDER BY total) AS INT) AS decile
    FROM u
    """,
)
def window_rank_distribution(spark, sf_dir):
    """Distribution-position window functions (percent_rank,
    cume_dist, ntile deciles) over per-user value totals — the
    user-scoring shape behind spend percentiles / engagement deciles.
    The global ORDER BY window runs on the per-user aggregate (one row
    per user), not the raw events — the same bounded-intermediate rule
    the as-of join's carry table follows; for billions of KEYS use
    global_row_index's bucket decomposition on the rank."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    u = (
        t["events"]
        .where(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(F.sum("value").alias("total"))
    )
    w = Window.orderBy("total")
    return u.select(
        "user_id",
        F.round("total", 6).alias("total"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(10).over(w).alias("decile"),
    )


@query(
    "window_user_paths",
    """
    WITH seq AS (SELECT user_id, event_type,
                        LEAD(event_type, 1) OVER w AS e2,
                        LEAD(event_type, 2) OVER w AS e3
                 FROM events WHERE user_id IS NOT NULL
                 WINDOW w AS (PARTITION BY user_id
                              ORDER BY ts, event_id)),
    paths AS (SELECT user_id,
                     event_type || '>' || e2 || '>' || e3 AS path
              FROM seq WHERE e3 IS NOT NULL)
    SELECT path,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM paths
    GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT 20
    """,
)
def user_paths_q(spark, sf_dir):
    """Path analysis: the 20 most-travelled 3-step event sequences
    across all users — the product-analytics "what do users actually
    do" query. Sequences come from two LEADs over the per-user
    event-time window (ties broken by event_id so the path strings are
    deterministic), then one count shuffle on the path string; the
    per-user window partitions on user_id, so no step touches a global
    sort. Top-k via TakeOrderedAndProject like the other sort/limit
    queries."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .where(F.col("e3").isNotNull())
    )
    paths = seq.select(
        "user_id",
        F.concat_ws(">", "event_type", "e2", "e3").alias("path"),
    )
    return (
        paths.groupBy("path")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(20)
    )


@query(
    "window_event_transitions",
    """
    WITH seq AS (SELECT event_type AS src,
                        LEAD(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS dst
                 FROM events WHERE user_id IS NOT NULL),
    t AS (SELECT src, dst, COUNT(*) AS n FROM seq
          WHERE dst IS NOT NULL GROUP BY src, dst),
    tot AS (SELECT src, SUM(n) AS row_total FROM t GROUP BY src)
    SELECT t.src, t.dst,
           CAST(t.n AS BIGINT) AS n,
           ROUND(t.n / CAST(tot.row_total AS DOUBLE), 6) AS p
    FROM t JOIN tot USING (src)
    """,
)
def event_transitions_q(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next event | current event) — the behavioral model
    behind churn/next-action prediction features. One LEAD window per
    user, one (src, dst) count shuffle, and the row totals broadcast
    back (|event types|² cells — bounded however big the corpus is).
    The probability is an exact integer ratio, so it is cross-engine
    deterministic without quantization tricks."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
    )
    counts = seq.groupBy("src", "dst").agg(F.count("*").alias("n"))
    totals = counts.groupBy("src").agg(F.sum("n").alias("row_total"))
    return counts.join(F.broadcast(totals), "src").select(
        "src",
        "dst",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("row_total").cast("double"), 6).alias("p"),
    )


@query(
    "agg_equidepth_bins",
    """
    WITH b AS (SELECT event_type, value,
                      NTILE(8) OVER (PARTITION BY event_type
                                     ORDER BY value, event_id) AS bin
               FROM events WHERE value IS NOT NULL)
    SELECT event_type, CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 4) AS lo,
           ROUND(MAX(value), 4) AS hi
    FROM b GROUP BY event_type, bin
    """,
)
def equidepth_bins_q(spark, sf_dir):
    """Equi-depth (quantile) binning per event type: 8 buckets of
    near-equal population with their value ranges — the feature-
    binning step before monotonic encodings or drift comparisons
    (equi-WIDTH bins are the PSI monitor's choice; equi-depth resists
    skew). NTILE ties broken by event_id so bin assignment is
    deterministic. Per-type window then one count shuffle; at billions
    of rows per type the approx_percentile cut-point form is the
    drop-in twin (same contract, no full sort)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    b = (
        t["events"]
        .where(F.col("value").isNotNull())
        .select("event_type", "value", F.ntile(8).over(w).alias("bin"))
    )
    return b.groupBy("event_type", "bin").agg(
        F.count("*").alias("n"),
        F.round(F.min("value"), 4).alias("lo"),
        F.round(F.max("value"), 4).alias("hi"),
    )


@query(
    "agg_regression_trend",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(regr_slope(value, epoch(ts)) * 86400, 4)
               AS slope_per_day,
           ROUND(regr_r2(value, epoch(ts)), 4) AS r2
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def regression_trend_q(spark, sf_dir):
    """Per-group linear trend: OLS slope of value over event time
    (scaled to per-day) with the fit's R² — the drift direction the
    PSI monitor flags but can't quantify. Built-in regr_* aggregates
    (one pass, map-side partials); both engines compute the same
    moment sums, rounded to absorb their accumulation-order ULP."""
    t = load_tables(spark, sf_dir)
    epoch = F.unix_timestamp("ts").cast("double")
    return (
        t["events"]
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.regr_slope(F.col("value"), epoch) * 86400, 4).alias(
                "slope_per_day"
            ),
            F.round(F.regr_r2(F.col("value"), epoch), 4).alias("r2"),
        )
    )


@query(
    "agg_equidepth_bins_approx",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS bins_balanced
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def equidepth_bins_approx_q(spark, sf_dir):
    """The 100 TB twin of agg_equidepth_bins: cut points from
    approx_percentile (one pass, mergeable sketch — no per-type full
    sort), bins assigned by comparing against the broadcast cut array.
    Contract oracle: every bin's population must sit within ±25% of
    the ideal n/8 (the sketch's rank error is far tighter than that at
    the configured accuracy), checked in-query; the oracle supplies
    the exact per-type counts and expects the flag TRUE."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("value").isNotNull())
    cuts = ev.groupBy("event_type").agg(
        F.expr(
            "approx_percentile(value, "
            "array(0.125,0.25,0.375,0.5,0.625,0.75,0.875), 10000)"
        ).alias("cuts")
    )
    binned = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        (
            F.size(F.filter(F.col("cuts"), lambda c: F.col("value") > c)) + 1
        ).alias("bin"),
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.count("*").alias("bn")
    )
    return per_bin.groupBy("event_type").agg(
        F.sum("bn").cast("long").alias("n"),
        (
            (F.count("*") == 8)
            & (F.max("bn") <= F.sum("bn") / 8 * 1.25)
            & (F.min("bn") >= F.sum("bn") / 8 * 0.75)
        ).alias("bins_balanced"),
    )


@query(
    "agg_mode_deterministic",
    """
    WITH c AS (SELECT event_type, CAST(FLOOR(value) AS INT) AS v,
                      COUNT(*) AS n
               FROM events WHERE value IS NOT NULL
               GROUP BY event_type, CAST(FLOOR(value) AS INT)),
    r AS (SELECT event_type, v, n,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY n DESC, v) AS rk
          FROM c)
    SELECT event_type, CAST(v AS INT) AS mode_value,
           CAST(n AS BIGINT) AS mode_count
    FROM r WHERE rk = 1
    """,
)
def mode_deterministic_q(spark, sf_dir):
    """Per-group mode with a DETERMINISTIC tie-break (highest count,
    then smallest value) — the built-in ``mode()`` breaks ties
    arbitrarily in both engines, which is exactly the class of silent
    cross-engine divergence the A2 argmax pattern already guards
    against; this is that pattern applied to the most-frequent-value
    statistic. Count shuffle + per-group top-1 window over the
    bounded distinct-value table."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    c = (
        t["events"]
        .where(F.col("value").isNotNull())
        # explicit FLOOR: Spark's double->int cast truncates, DuckDB's
        # ROUNDS — a silent cross-engine divergence without it
        .groupBy("event_type", F.floor("value").cast("int").alias("v"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "v")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("v").cast("int").alias("mode_value"),
            F.col("n").cast("long").alias("mode_count"),
        )
    )


@query(
    "agg_weighted_median",
    """
    WITH x AS (SELECT event_type, value,
                      1 + user_id % 3 AS wt
               FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL),
    r AS (SELECT event_type, value, wt,
                 SUM(wt) OVER (PARTITION BY event_type
                               ORDER BY value, wt
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum,
                 SUM(wt) OVER (PARTITION BY event_type) AS total
          FROM x)
    SELECT event_type,
           ROUND(MIN(value), 4) AS weighted_median,
           CAST(MAX(total) AS BIGINT) AS total_weight
    FROM r WHERE cum * 2 >= total
    GROUP BY event_type
    """,
)
def weighted_median_q(spark, sf_dir):
    """Weighted median per group: the first value whose cumulative
    weight crosses half the total — the statistic mixture rebalancing
    needs when documents carry importance weights (plain median
    ignores them). Weights here derive deterministically from the
    key; the crossing test is pure integer comparison (cum*2 >=
    total), so no float threshold can straddle engines. One ordered
    window over the group, then a min-reduce of the crossing set."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    x = (
        t["events"]
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .select(
            "event_type",
            "value",
            (1 + F.col("user_id") % 3).alias("wt"),
        )
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("value", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt_total = Window.partitionBy("event_type")
    r = x.select(
        "event_type",
        "value",
        F.sum("wt").over(wc).alias("cum"),
        F.sum("wt").over(wt_total).alias("total"),
    )
    return (
        r.where(F.col("cum") * 2 >= F.col("total"))
        .groupBy("event_type")
        .agg(
            F.round(F.min("value"), 4).alias("weighted_median"),
            F.max("total").cast("long").alias("total_weight"),
        )
    )


@query(
    "agg_median_absolute_deviation",
    """
    WITH m AS (SELECT event_type,
                      quantile_cont(value, 0.5) AS med
               FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT e.event_type,
           ROUND(MAX(m.med), 6) AS median_value,
           ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad,
           ROUND(quantile_cont(abs(e.value - m.med), 0.5) * 1.4826, 6)
               AS sigma_robust
    FROM events e JOIN m ON e.event_type = m.event_type
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type
    """,
)
def mad_q(spark, sf_dir):
    """Median absolute deviation per group with the 1.4826 consistency
    factor — the robust scale estimate the rolling z-score monitor
    should switch to when outliers contaminate the trailing window
    (stddev is exactly what a spike inflates; MAD ignores it). Two
    exact-percentile passes (median, then median of absolute
    residuals) with the tiny per-group medians broadcast between them;
    percentile_approx is the one-pass twin at scale."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("value").isNotNull())
    m = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    j = ev.join(F.broadcast(m), "event_type")
    mad = F.expr("percentile(abs(value - med), 0.5)")
    return j.groupBy("event_type").agg(
        F.round(F.max("med"), 6).alias("median_value"),
        F.round(mad, 6).alias("mad"),
        F.round(mad * 1.4826, 6).alias("sigma_robust"),
    )


@query(
    "agg_cohort_ltv_curve",
    """
    WITH first_seen AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
                        FROM events WHERE user_id IS NOT NULL
                        GROUP BY user_id),
    acts AS (SELECT e.user_id,
                    date_trunc('week', f.cohort_day) AS cohort_week,
                    CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                         // 7 AS INT) AS age_weeks,
                    e.value
             FROM events e JOIN first_seen f ON e.user_id = f.user_id
             WHERE e.value IS NOT NULL),
    wk AS (SELECT cohort_week, age_weeks, SUM(value) AS wk_value
           FROM acts GROUP BY cohort_week, age_weeks)
    SELECT cohort_week, age_weeks,
           CAST(FLOOR(SUM(wk_value) OVER (PARTITION BY cohort_week
                                          ORDER BY age_weeks
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) * 100 + 0.5)
                AS BIGINT) AS cum_value_cents
    FROM wk
    """,
)
def cohort_ltv_q(spark, sf_dir):
    """Cohort LTV curve: cumulative value per signup-week cohort by
    age in weeks — the running-sum extension of the retention-cohort
    matrix (agg_retention_cohorts counts presence; this accumulates
    value). Emitted in floor'd cents: the cumulative window re-sums a
    per-week double total whose half-cases would straddle ROUND across
    engines. first-seen shuffle + weekly agg + a window over the
    bounded (cohort, age) grid."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    acts = (
        ev.where(F.col("value").isNotNull())
        .join(first_seen, "user_id")
        .select(
            F.date_trunc("week", "cohort_day").alias("cohort_week"),
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7
            )
            .cast("int")
            .alias("age_weeks"),
            "value",
        )
    )
    wk = acts.groupBy("cohort_week", "age_weeks").agg(
        F.sum("value").alias("wk_value")
    )
    wcum = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return wk.select(
        "cohort_week",
        "age_weeks",
        F.floor(F.sum("wk_value").over(wcum) * 100 + 0.5)
        .cast("long")
        .alias("cum_value_cents"),
    )
