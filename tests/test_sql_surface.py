"""Spark 4 SQL-surface features the engine leans on: session
variables, positional/named parameter binding, and LATERAL
decorrelation (plan-shape: no per-row re-execution)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_session_variables_roundtrip(spark):
    spark.sql("DECLARE OR REPLACE VARIABLE qthresh DOUBLE DEFAULT 1.0")
    spark.sql("SET VARIABLE qthresh = 42.5")
    assert spark.sql("SELECT qthresh AS t").first().t == 42.5


def test_positional_and_named_sql_args(spark):
    got = spark.sql(
        "SELECT id FROM range(10) WHERE id BETWEEN ? AND ?", args=[3, 5]
    ).collect()
    assert [r.id for r in got] == [3, 4, 5]
    got = spark.sql(
        "SELECT id FROM range(10) WHERE id < :hi", args={"hi": 2}
    ).collect()
    assert [r.id for r in got] == [0, 1]


def test_lateral_decorrelates_to_one_join(spark, tables):
    """The LATERAL top-n plan contains exactly one join and a window
    rank — Catalyst decorrelated it; a correlated re-execution per
    outer row would show a nested-loop cascade."""
    tables["nation"].createOrReplaceTempView("nation")
    tables["customer"].createOrReplaceTempView("customer")
    df = spark.sql(
        """
        SELECT n.n_name, t.c_custkey FROM nation n,
        LATERAL (SELECT c_custkey FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        """
    )
    assert df.count() == 50  # 25 nations × 2
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Join") >= 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_analyze_table_stats_feed_optimizer(spark, tables, tmp_path):
    """ANALYZE TABLE row/column statistics land in the catalog and the
    optimizer's plan-stats read them (CBO input at 100 TB: join
    reordering and broadcast decisions come from these numbers, not
    file sizes, once tables are analyzed)."""
    tables["nation"].write.mode("overwrite").saveAsTable("nation_stats_t")
    try:
        spark.sql(
            "ANALYZE TABLE nation_stats_t COMPUTE STATISTICS "
            "FOR COLUMNS n_nationkey, n_regionkey"
        )
        desc = {
            r.info_name: r.info_value
            for r in spark.sql(
                "DESCRIBE TABLE EXTENDED nation_stats_t"
            ).selectExpr(
                "col_name AS info_name", "data_type AS info_value"
            ).collect()
        }
        assert "25 rows" in desc.get("Statistics", ""), desc.get("Statistics")
        prev = spark.conf.get("spark.sql.cbo.enabled", "false")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            df = spark.table("nation_stats_t")
            stats = (
                df._jdf.queryExecution().optimizedPlan().stats()
            )
            assert stats.rowCount().get() == 25
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_stats_t")
