"""Interleaved A/B of the round-10 customer-dimension experiments at a
scale point — the committed, reproducible form of the BENCH_NOTES
round-10 numbers (the decompose_bucketed pattern: measured claims ship
with their harness).

Experiments (each interleaved best-of-``n``, one variant pair per
session so neither side owns the page cache):

  q03_customer   q03 over the bucketed facts, customer read from the
                 c_custkey-bucketed layout VS the plain parquet scan.
                 Round-10 measured 11.12 s vs 13.39 s at sf100 (−17%):
                 above the broadcast ceiling the bucketed dimension
                 side is scan-local (no exchange, no sort).

  q05_precust    q05 current form (join per-order rows, then 25-group
                 n_name rollup) VS a q10-style per-custkey
                 pre-aggregation before the customer join. Round-10
                 measured 16.0 s vs 17.15 s at sf100 — REJECTED: the
                 custkey exchange volume is identical (custkeys are
                 ~unique within orderkey-clustered map partitions, so
                 map-side partials reduce nothing) and the 15M-group
                 aggregation costs more than the smaller probe saves.

  denorm_q03 / denorm_q05 / denorm_q10   (round-11, verdict task 1)
                 each headliner's custkey-clustered DENORMALIZED form
                 (queries_bucketed.ensure_denorm_custkey — zero fact
                 exchanges) VS its orderkey-bucketed form, via the
                 registry callables so the measured plan IS the
                 shipped plan. The layout materializes lazily on
                 first DataFrame construction (outside the timed
                 region).

Usage: python tools/ab_sf100_dim.py [sf_dir] [experiment] [n]
       experiment in {q03_customer, q05_precust, denorm_q03,
       denorm_q05, denorm_q10}; default sf100, all. Pass sf_dir
       ABSOLUTE (layout names derive from the absolute path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf100"
    which = sys.argv[2] if len(sys.argv) > 2 else "all"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from data_pipeline_001_spark.plans.queries import _rev
    from data_pipeline_001_spark.plans.queries_bucketed import ensure_bucketed
    from data_pipeline_001_spark.session import get_spark, load_tables

    spark = get_spark(app_name="ab_sf100_dim")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    names = ensure_bucketed(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    cut = F.lit("1998-06-15 00:00:00").cast("timestamp")

    def q03(cust):
        li = (
            spark.table(names["lineitem"])
            .where(F.col("l_shipdate") > cut)
            .groupBy("l_orderkey")
            .agg(F.sum(_rev()).alias("rev"))
        )
        return (
            li.join(
                spark.table(names["orders"]).where(F.col("o_orderdate") < cut),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .join(
                cust.where(F.col("c_mktsegment") == "BUILDING"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .select(
                "o_orderkey",
                F.round("rev", 2).alias("revenue"),
                "o_orderdate",
                "o_orderpriority",
            )
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10)
        )

    def nation_cust():
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

    def per_order():
        return (
            spark.table(names["lineitem"])
            .groupBy("l_orderkey")
            .agg(F.sum(_rev()).alias("rev"))
            .join(
                spark.table(names["orders"]).select("o_orderkey", "o_custkey"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
        )

    def q05_current():
        return (
            per_order()
            .join(nation_cust(), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        )

    def q05_precust():
        pc = per_order().groupBy("o_custkey").agg(F.sum("rev").alias("rev"))
        return (
            pc.join(nation_cust(), F.col("o_custkey") == F.col("c_custkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        )

    # round-11: the denormalized custkey layout vs the orderkey-bucketed
    # form, per headliner — the structural A/B behind verdict task 1.
    # Uses the registry callables so the measured plan IS the shipped
    # plan; ensure_denorm_custkey materializes lazily during DataFrame
    # construction (`fn()`), which happens BEFORE the timer starts —
    # the one-time build never lands in a timed run.
    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def _pair(q: str):
        return (
            ("denorm", lambda: qs[f"{q}_denorm"](spark, sf_dir)),
            ("bucketed", lambda: qs[f"{q}_bucketed"](spark, sf_dir)),
        )

    experiments = {
        "q03_customer": (
            ("bucketed_cust", lambda: q03(spark.table(names["customer"]))),
            ("plain_cust", lambda: q03(t["customer"])),
        ),
        "q05_precust": (
            ("current", q05_current),
            ("precust", q05_precust),
        ),
        "denorm_q03": _pair("q03_shipping_priority"),
        "denorm_q05": _pair("q05_nation_revenue"),
        "denorm_q10": _pair("q10_returned_revenue"),
    }
    run = experiments if which == "all" else {which: experiments[which]}
    _noop(spark.table(names["lineitem"]).groupBy("l_returnflag").count())

    out = {"sf_dir": sf_dir, "n": n, "results": {}}
    for exp, variants in run.items():
        res: dict[str, list[float]] = {}
        for _ in range(n):
            for vname, fn in variants:  # interleave A/B within each round
                df = fn()
                t0 = time.perf_counter()
                _noop(df)
                res.setdefault(vname, []).append(
                    round(time.perf_counter() - t0, 2)
                )
        out["results"][exp] = {v: {"runs": r, "best": min(r)} for v, r in res.items()}
        print(exp, out["results"][exp], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
