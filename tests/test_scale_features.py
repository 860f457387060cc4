"""Scale-feature tests: salted skew joins produce identical results to
plain joins; bucketed tables join without a shuffle exchange; custom
stateful streaming accumulates across micro-batches."""

import pytest
from pyspark.sql import functions as F


def test_salted_join_matches_plain_join(spark, tables):
    from data_pipeline_001_spark.operators.relational import salted_join

    orders = tables["orders"].select(F.col("o_custkey").alias("k"), "o_orderkey")
    cust = tables["customer"].select(F.col("c_custkey").alias("k"), "c_name")
    plain = orders.join(cust, "k").select("o_orderkey", "c_name")
    salted = salted_join(orders, cust, "k", salt=8).select("o_orderkey", "c_name")
    assert plain.subtract(salted).count() == 0
    assert salted.subtract(plain).count() == 0
    assert plain.count() == salted.count()  # multiset equality for inner join


def test_bucketed_join_has_no_shuffle(spark, tables, tmp_path):
    """Co-located join: both sides bucketed by the join key into the
    same bucket count → the join plans without Exchange on either side
    (the 100 TB answer to repeated fact-fact joins)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        tables["orders"].write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy(
            "o_orderkey"
        ).saveAsTable("orders_bucketed")
        tables["lineitem"].write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy(
            "l_orderkey"
        ).saveAsTable("lineitem_bucketed")
        joined = spark.table("lineitem_bucketed").join(
            spark.table("orders_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        # and it returns the same rows as the plain join
        plain = tables["lineitem"].join(
            tables["orders"], F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_stateful_streaming_accumulates(spark, tables, tmp_path):
    from data_pipeline_001_spark.streaming.stateful import running_user_stats

    src_dir = str(tmp_path / "events_src")
    tables["events"].write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(tables["events"].schema).parquet(src_dir)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.table("user_stats")
    batch = (
        tables["events"]
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
    )
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in out.collect()}
    for r in batch.collect():
        n, s = got[r["user_id"]]
        assert n == r["n"]
        assert abs(s - r["s"]) < 1e-6


def test_salted_agg_matches_plain_and_rejects_nonalgebraic(spark, tables):
    from data_pipeline_001_spark.operators.relational import salted_agg

    li = tables["lineitem"]
    plain = {
        r["l_returnflag"]: (r["n"], round(r["s"], 4))
        for r in li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("s"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (r["n"], round(r["s"], 4))
        for r in salted_agg(
            li, ("l_returnflag",), {"n": F.count("*"), "s": F.sum("l_quantity")}
        ).collect()
    }
    assert salted == plain

    with pytest.raises(ValueError, match="algebraic"):
        salted_agg(li, ("l_returnflag",), {"a": F.avg("l_quantity")}).collect()


def test_salted_join_rejects_outer_right_modes(spark, tables):
    from data_pipeline_001_spark.operators.relational import salted_join

    orders = tables["orders"].select(F.col("o_custkey").alias("k"))
    cust = tables["customer"].select(F.col("c_custkey").alias("k"))
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(orders, cust, "k", how=how)


def test_global_row_index_raises_on_null_order_col(spark):
    from data_pipeline_001_spark.operators.relational import global_row_index

    df = spark.createDataFrame([(1,), (None,), (3,)], "k long")
    with pytest.raises(ValueError, match="NULL"):
        global_row_index(df, "k", bucket_width=10).collect()


def test_constraint_name_must_be_simple_identifier(spark):
    from data_pipeline_001_spark.operators.constraints import (
        Constraint,
        check_constraints,
    )

    df = spark.createDataFrame([(1,)], "k long")
    bad = Constraint("x` , `y", F.max("k"), None, None)
    with pytest.raises(ValueError, match="must match"):
        check_constraints(df, [bad])


def test_aqe_skew_join_splits_hot_partition(spark, tables):
    """AQE's runtime skew-join re-plan actually engages on a planted
    hot key: with the skew thresholds lowered, the executed SMJ is
    marked skew=true and the result still matches the plain join —
    the zero-code-change complement to operators.relational.salted_join
    at 100 TB (AQE handles moderate skew; salting handles the
    pathological tail)."""
    from pyspark.sql import functions as F

    prev = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
        # force SMJ: broadcast would bypass the skew machinery
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # 100k rows on ONE key + a sprinkle of others vs a small dim
        fact = spark.range(0, 100_000).select(
            F.when(F.col("id") % 50 == 0, F.col("id") % 7)
            .otherwise(F.lit(3))
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(0, 7).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = fact.join(dim, "k")
        # execute THIS DataFrame's queryExecution (count() would spawn
        # a separate one whose AQE final plan we can't inspect)
        n = len(joined.collect())
        assert n == 100_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
