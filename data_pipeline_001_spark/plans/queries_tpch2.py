"""Third-wave relational coverage: more TPC-H-shaped queries over the
available columns, subquery forms (EXISTS / IN / scalar), null
semantics, pivot/unpivot, first/last window values. Registers into
the shared REGISTRY in ``plans.queries``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables


@query(
    "q06_forecast_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06(spark, sf_dir):
    """TPC-H Q6 shape: pure scan+filter+agg — the pushdown showcase."""
    t = load_tables(spark, sf_dir)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q04_order_priority_check",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q04(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery → left-semi join."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    late = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q14_promo_revenue",
    """
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                                  THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q14(spark, sf_dir):
    """TPC-H Q14 shape: conditional revenue share over a month."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6).alias("promo_pct"))
    )


@query(
    "q18_large_orders",
    """
    SELECT c_custkey, o_orderkey, ROUND(total_qty, 2) AS total_qty
    FROM (SELECT l_orderkey, SUM(l_quantity) AS total_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 150) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q18(spark, sf_dir):
    """TPC-H Q18 shape: HAVING on a grouped sum, then joins."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 150)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "o_orderkey", F.round("total_qty", 2).alias("total_qty"))
    )


@query(
    "subquery_scalar_above_avg",
    """
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark, sf_dir):
    """Scalar subquery in a predicate (orders above 1.5× average)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
        """
    )


@query(
    "subquery_in_list",
    """
    SELECT o_orderkey, o_custkey FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'O'
    """,
)
def subquery_in(spark, sf_dir):
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus = 'O'
        """
    )


@query(
    "null_semantics",
    """
    SELECT event_id,
           COALESCE(user_id, -1) AS user_or_default,
           (user_id IS NOT DISTINCT FROM NULL) AS is_anon,
           NULLIF(event_type, 'error') AS type_or_null
    FROM events WHERE event_id < 2000
    """,
)
def null_semantics(spark, sf_dir):
    """Null handling: COALESCE / null-safe equality (<=>) / NULLIF."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("event_id") < 2000)
        .select(
            "event_id",
            F.coalesce("user_id", F.lit(-1)).alias("user_or_default"),
            F.col("user_id").eqNullSafe(F.lit(None).cast("long")).alias("is_anon"),
            F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        )
    )


@query(
    "pivot_event_type_by_day",
    """
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click')    AS BIGINT) AS click,
           CAST(COUNT(*) FILTER (WHERE event_type = 'view')     AS BIGINT) AS view,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(COUNT(*) FILTER (WHERE event_type = 'signup')   AS BIGINT) AS signup,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error')    AS BIGINT) AS error
    FROM events GROUP BY 1
    """,
)
def pivot_events(spark, sf_dir):
    """Pivot: event counts per day × type (explicit value list keeps
    one pass; unlisted values would force a distinct scan first)."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@query(
    "unpivot_nation_activity",
    """
    WITH c AS (SELECT c_nationkey AS nationkey,
                      CAST(COUNT(*) AS BIGINT) AS customers,
                      CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS segments
               FROM customer GROUP BY 1)
    SELECT nationkey, 'customers' AS metric, customers AS metric_value FROM c
    UNION ALL
    SELECT nationkey, 'segments' AS metric, segments AS metric_value FROM c
    """,
)
def unpivot_nation(spark, sf_dir):
    """Unpivot/melt wide metrics to long form."""
    t = load_tables(spark, sf_dir)
    wide = t["customer"].groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count("*").alias("customers"),
        F.countDistinct("c_mktsegment").alias("segments"),
    )
    return wide.unpivot(
        "nationkey", ["customers", "segments"], "metric", "metric_value"
    )


@query(
    "window_first_last_values",
    """
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last(spark, sf_dir):
    """first/last/nth_value over per-customer order history."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )
