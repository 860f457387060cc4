"""Fourth-wave relational coverage: the remaining TPC-H query shapes
adapted to the testdata star schema (no partsupp table; lineitem has
l_shipdate only), plus token counting and map-typed column ops from the
training-data surface. Registers into the shared REGISTRY.

Shapes covered here and their reference/TPC-H pedigree:
  q07  two-nation volume shipping   (multi-hop dim joins, OR of pairs)
  q08  market share within region   (CTE + conditional share)
  q09  product profit by nation/yr  (faux supply cost from retailprice)
  q11  HAVING vs scalar subquery    (partsupp→supplier acctbal adapted)
  q13  customer order distribution  (outer join + two-level agg)
  q15  top supplier by revenue      (CTE + scalar MAX subquery)
  q16  supplier variety             (anti-predicates + COUNT DISTINCT)
  q17  small-quantity revenue       (correlated scalar subquery)
  q19  disjunctive predicate stack  (OR-of-AND pushdown)
  q20  nested-IN supplier selection (IN over grouped HAVING subquery)
  q22  idle customers               (NOT EXISTS + scalar AVG subquery)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q07_volume_shipping",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey  = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def q07(spark, sf_dir):
    """TPC-H Q7 shape: revenue flow between a nation pair by year.

    Fact side joins two broadcast dim chains (customer-nation and
    supplier-nation); the pair predicate lands post-join on dim
    columns, the dims themselves broadcast so the fact never shuffles.
    """
    t = load_tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .where(pair)
        .groupBy(
            "cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
    )


@query(
    "q08_market_share",
    """
    WITH sales AS (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON c_custkey  = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey
        JOIN supplier ON s_suppkey  = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE')
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM sales GROUP BY o_year
    """,
)
def q08(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's revenue by year."""
    t = load_tables(spark, sf_dir)
    euro_nations = (
        t["nation"]
        .join(
            t["region"].where(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    supp_nation = t["nation"].select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    sales = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["customer"].select("c_custkey", "c_nationkey"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(F.broadcast(euro_nations), F.col("c_nationkey") == F.col("c_nkey"))
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nkey"))
        .select(F.year("o_orderdate").alias("o_year"), _rev().alias("volume"), "supp_nation")
    )
    share = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0)
    return sales.groupBy("o_year").agg(
        F.round(F.sum(share) / F.sum("volume"), 6).alias("mkt_share")
    )


@query(
    "q09_product_profit",
    """
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)
                     - 0.5 * p_retailprice * l_quantity), 2) AS profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON n_nationkey = s_nationkey
    WHERE p_type = 'PROMO'
    GROUP BY 1, 2
    """,
)
def q09(spark, sf_dir):
    """TPC-H Q9 shape: profit by supplier nation × year.

    The testdata has no partsupp/ps_supplycost, so cost is modeled as
    0.5 × p_retailprice × quantity — same plan shape (fact joins two
    broadcast dims + nation, grouped two-key agg).
    """
    t = load_tables(spark, sf_dir)
    profit = _rev() - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        t["lineitem"]
        .join(
            t["part"].where(F.col("p_type") == "PROMO"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("s_suppkey") == F.col("l_suppkey"),
        )
        .join(F.broadcast(t["nation"]), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


@query(
    "q11_balance_concentration",
    """
    SELECT s_nationkey, ROUND(SUM(s_acctbal), 2) AS total_bal
    FROM supplier
    GROUP BY s_nationkey
    HAVING SUM(s_acctbal) > (SELECT SUM(s_acctbal) * 0.04 FROM supplier)
    """,
)
def q11(spark, sf_dir):
    """TPC-H Q11 shape: groups exceeding a global-scalar share.

    partsupp value → supplier acctbal adapted; the point is HAVING
    against an uncorrelated scalar subquery (Spark plans the scalar as
    a broadcast ReusedSubquery, one extra tiny agg job — no O(n²)).
    """
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_nationkey, ROUND(SUM(s_acctbal), 2) AS total_bal
        FROM supplier
        GROUP BY s_nationkey
        HAVING SUM(s_acctbal) > (SELECT SUM(s_acctbal) * 0.04 FROM supplier)
        """
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey) per_cust
    GROUP BY c_count
    """,
)
def q13(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts,
    preserving zero-order customers via the outer join (COUNT(col)
    skips the null-extended rows)."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t["customer"]
        .join(
            t["orders"].where(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15(spark, sf_dir):
    """TPC-H Q15 shape: argmax supplier by quarterly revenue via a
    scalar MAX subquery over a shared CTE (Spark reuses the agg)."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        WITH rev AS (
          SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        """
    )


@query(
    "q16_supplier_variety",
    """
    SELECT p_brand, p_size, CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'MEDIUM'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY 1, 2
    """,
)
def q16(spark, sf_dir):
    """TPC-H Q16 shape: supplier variety per brand/size with
    anti-predicates and an IN-list (all pushed to the part scan)."""
    t = load_tables(spark, sf_dir)
    parts = t["part"].where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    return (
        t["lineitem"]
        .join(parts, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery (below half the
    per-part average quantity). Catalyst de-correlates this into an
    aggregate + join — no per-row re-execution."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#3'
          AND l1.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                               FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)
        """
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-AND predicate stack across both join
    sides; Catalyst extracts the common single-side conjuncts
    (p_brand/p_size disjunction) down to the part scan."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity")
    branch = lambda brand, size_hi, q_lo, q_hi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, size_hi)
        & q.between(q_lo, q_hi)
    )
    return (
        t["lineitem"]
        .join(t["part"], F.col("p_partkey") == F.col("l_partkey"))
        .where(
            branch("Brand#12", 5, 1, 11)
            | branch("Brand#23", 10, 10, 20)
            | branch("Brand#15", 15, 20, 30)
        )
        .agg(
            F.round(F.sum(_rev()), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q20_part_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_type = 'SMALL'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(l_quantity) > 300)
    """,
)
def q20(spark, sf_dir):
    """TPC-H Q20 shape: IN over a grouped-HAVING subquery (suppliers
    that moved >300 units of SMALL parts in 1997) → left-semi join."""
    t = load_tables(spark, sf_dir)
    heavy = (
        t["lineitem"]
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            t["part"].where(F.col("p_type") == "SMALL"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return t["supplier"].join(
        heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


@query(
    "q22_idle_customers",
    """
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q22(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no urgent
    orders (NOT EXISTS → left-anti join; phone-prefix filter replaced
    by the available c_mktsegment grouping; 'no orders at all' is empty
    at every test SF, so the anti-join keys on the urgent subset)."""
    t = load_tables(spark, sf_dir)
    avg_bal = (
        t["customer"]
        .where(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .first()[0]
    )
    return (
        t["customer"]
        .where(F.col("c_acctbal") > F.lit(avg_bal))
        .join(
            t["orders"]
            .where(F.col("o_orderpriority") == "1-URGENT")
            .select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@query(
    "q02_min_balance_supplier",
    """
    SELECT DISTINCT p_partkey, s_suppkey, ROUND(s_acctbal, 2) AS s_acctbal
    FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size = 1
      AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                       FROM supplier s2 JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                       WHERE l2.l_partkey = p_partkey)
    """,
)
def q02(spark, sf_dir):
    """TPC-H Q2 shape: per-part argmin supplier via a correlated MIN
    subquery (ps_supplycost → supplier acctbal adapted). Catalyst
    decorrelates into a per-part aggregate joined back — one pass."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT DISTINCT p_partkey, s_suppkey, ROUND(s_acctbal, 2) AS s_acctbal
        FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_size = 1
          AND s_acctbal = (SELECT MIN(s2.s_acctbal)
                           FROM supplier s2 JOIN lineitem l2 ON s2.s_suppkey = l2.l_suppkey
                           WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q12_late_shipment_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def q12(spark, sf_dir):
    """TPC-H Q12 shape: late shipments (>60 days after order) counted
    by priority class per returnflag (l_shipmode → l_returnflag
    adapted; the late predicate is cross-column, so it evaluates
    post-join but inside codegen)."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(t["lineitem"], F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q21_last_shipper_in_shared_orders",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    """,
)
def q21(spark, sf_dir):
    """TPC-H Q21 shape: the supplier who shipped last in multi-supplier
    finished orders, >30 days late — correlated EXISTS (semi) and
    NOT EXISTS (anti) against the same fact table in one query."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
          JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
          JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > l1.l_shipdate)
        GROUP BY s_name
        """
    )


@query(
    "explode_word_frequency",
    r"""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
          FROM documents WHERE doc_id < 200) toks
    WHERE token <> ''
    GROUP BY token
    """,
)
def explode_word_frequency(spark, sf_dir):
    """Generator/UDTF surface: explode tokenized text into rows (the
    LATERAL VIEW / unnest shape) and aggregate term frequency. At
    scale the explode happens partition-local — no shuffle until the
    final count."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .where(F.col("doc_id") < 200)
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )


# ---------------------------------------------------------------------
# Training-data surface: token counting + map-typed column ops
# ---------------------------------------------------------------------

# One alternation, no lookarounds: word runs | single digits | single
# non-space symbols — the GPT-2-ish split granularity, expressed in the
# regex subset where Java (Spark) and RE2 (DuckDB) agree.
# whitespace spelled explicitly ([ \t\n\x0B\f\r], the JVM \s class):
# RE2's \s omits \x0B, so the bare class diverges between engines
_BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]"


@query(
    "text_token_counts",
    r"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT)
             AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 \t\n\x0B\f\r]'))
             AS BIGINT) AS bpe_tokens
    FROM documents
    """,
)
def text_token_counts(spark, sf_dir):
    """Token counting over documents: whitespace tokens as a codegen'd
    JVM expression; the BPE-ish count (word runs / digits /
    punctuation) via the Arrow/RE2 counter — counting (not
    extracting) needs no materialized match array, and RE2 measured
    2.3× faster than java.util.regex on document-length text."""
    from data_pipeline_001_spark.functions.udfs import arrow_regex_count

    t = load_tables(spark, sf_dir)
    trimmed = F.trim(F.col("text"))
    ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    bpe = arrow_regex_count(_BPE_PATTERN)(F.col("text"))
    return t["documents"].select(
        "doc_id",
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


@query(
    "map_ops_props",
    """
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events WHERE event_id < 5000
    """,
)
def map_ops_props(spark, sf_dir):
    """Map-typed column surface: parse the JSON props column into a
    map<string,long>, then map_keys / size / element_at (SURVEY §2.8
    'engine exposes Spark map built-ins')."""
    t = load_tables(spark, sf_dir)
    m = F.from_json(F.col("props"), "map<string,bigint>")
    return (
        t["events"]
        .where(F.col("event_id") < 5000)
        .select(
            "event_id",
            F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
            F.size(F.map_keys(m)).alias("n_keys"),
            F.element_at(m, "k").alias("k_value"),
        )
    )
