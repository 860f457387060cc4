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
    ONE pass over the table producing a long-form profile, the
    training-data QC primitive. At 100 TB swap count_distinct for
    approx_count_distinct."""
    t = load_tables(spark, sf_dir)
    cols = ["event_type", "user_id", "value"]
    aggs = [F.count("*").alias("n_rows")]
    for c in cols:
        aggs.append((F.count("*") - F.count(c)).alias(f"{c}__null"))
        aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = t["events"].agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__null, {c}__distinct" for c in cols
    )
    return wide.selectExpr(
        "n_rows",
        f"stack({len(cols)}, {stack_expr}) AS (column_name, n_null, n_distinct)",
    ).select("column_name", "n_rows", "n_null", "n_distinct")


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
