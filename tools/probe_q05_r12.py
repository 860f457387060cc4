"""Round-12 task 1: WHY does the custkey-clustered denorm layout buy
q05 nothing at sf1 (1.747 s, ratio 23.9, == bucketed 1.762) when it
pays 2.4x for q03 and 3.8x for q10?

Captures explain("formatted") for q05 plain / bucketed / denorm at sf1
and times a decomposition of the denorm form with the noop sink:
  (a) full query
  (b) fact scan + agg only (no customer join)
  (c) fact scan only
Usage: python tools/probe_q05_r12.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_001_spark.session import get_spark, load_tables  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def best3(label, make):
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        noop(make())
        ts.append(time.perf_counter() - t0)
    print(f"{label}: best {min(ts):.3f}  all {[round(t,3) for t in ts]}")
    return min(ts)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    import bench

    spark = get_spark(app_name="probe_q05")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prepare_point(spark, sf_dir)

    import __spark_entry__ as entry

    qs = entry.queries()
    os.makedirs("plans/r12", exist_ok=True)
    for name in (
        "q05_nation_revenue",
        "q05_nation_revenue_bucketed",
        "q05_nation_revenue_denorm",
    ):
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"plans/r12/{name}_sf1_before.txt", "w") as fh:
            fh.write(plan)
        print(f"wrote plans/r12/{name}_sf1_before.txt")

    # interleaved timing: the three forms
    for _ in range(2):
        for name in (
            "q05_nation_revenue",
            "q05_nation_revenue_bucketed",
            "q05_nation_revenue_denorm",
        ):
            t0 = time.perf_counter()
            noop(qs[name](spark, sf_dir))
            print(f"{name}: {time.perf_counter()-t0:.3f}")

    # decomposition of the denorm form
    from pyspark.sql import functions as F
    from data_pipeline_001_spark.plans.queries_bucketed import (
        ensure_bucketed,
        ensure_denorm_custkey,
    )
    from data_pipeline_001_spark.plans.queries import _rev

    n = ensure_denorm_custkey(spark, sf_dir)
    names = ensure_bucketed(spark, sf_dir)
    t = load_tables(spark, sf_dir)

    best3("denorm fact scan only", lambda: spark.table(n).select(
        "o_custkey", "l_extendedprice", "l_discount"))
    best3("denorm scan+agg by custkey", lambda: spark.table(n)
          .groupBy("o_custkey").agg(F.sum(_rev()).alias("rev")))
    best3("plain lineitem scan 3cols", lambda: t["lineitem"].select(
        "l_orderkey", "l_extendedprice", "l_discount"))
    best3("bucketed customer scan", lambda: spark.table(names["customer"]))

    def cust_asia():
        nation_asia = (
            t["nation"]
            .join(
                F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("n_nationkey", "n_name")
        )
        return (
            spark.table(names["customer"])
            .join(
                F.broadcast(nation_asia),
                F.col("c_nationkey") == F.col("n_nationkey"),
            )
            .select("c_custkey", "n_name")
        )

    best3("cust_asia only", cust_asia)
    best3("denorm full q05", lambda: qs["q05_nation_revenue_denorm"](spark, sf_dir))
    best3("denorm join no agg", lambda: spark.table(n).join(
        cust_asia(), F.col("o_custkey") == F.col("c_custkey"))
        .select("n_name", "l_extendedprice", "l_discount"))


if __name__ == "__main__":
    main()
