"""Stage-by-stage attribution of q05_nation_revenue at a scale point.

Round-8 (verdict task 1): the sf30 point broke the "ratio falls with
scale" trend for q05 (11.19x -> 18.43x plain, 6.16x -> 7.54x bucketed
vs DuckDB) while q01 and bucketed q03/q10 kept falling. This harness
answers WHERE the extra time goes by timing the query's cumulative
prefixes under the exact bench session/protocol, then A/B-ing the
candidate levers the verdict named (AQE shuffle width, scan
parallelism, sort-merge vs hash join strategy).

Usage: python tools/decompose_q05.py [sf_dir] [out_json]
       python tools/decompose_q05.py --experiments   # lever A/Bs too

Protocol matches bench.py: noop sink, best-of-N per measurement,
session warmed once, AQE + shuffle width sized to the point. Numbers
from any other protocol are not comparable (BENCH_NOTES round-5).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from data_pipeline_001_spark.session import get_spark, load_tables  # noqa: E402


def _dir_bytes(sf_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _time_noop(df, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _prefixes(spark, sf_dir):
    """Cumulative prefixes of the q05 plan, each ending in a zero-key
    aggregate so the noop sink measures scan+join+shuffle work, not
    row transfer."""
    t = load_tables(spark, sf_dir)
    nation_asia = (
        t["nation"]
        .join(
            F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust_asia = (
        t["customer"]
        .join(F.broadcast(nation_asia), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "n_name")
    )
    ord_asia = (
        t["orders"]
        .select("o_orderkey", "o_custkey")
        .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "n_name")
    )
    full = (
        t["lineitem"]
        .select("l_orderkey", _rev().alias("r"))
        .join(ord_asia, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("r"), 2).alias("revenue"))
    )
    return {
        # scan floor: full lineitem pass + revenue expression, no join
        "lineitem_scan_agg": t["lineitem"].agg(F.sum(_rev()).alias("s")),
        # the dimension chain alone (2 broadcasts over customer)
        "dims_cust_asia": cust_asia.agg(F.count("*").alias("n")),
        # + the orders join (first real shuffle pair at scale)
        "orders_join": ord_asia.agg(F.count("*").alias("n")),
        # + the lineitem join and final 25-group rollup = the query
        "full_q05": full,
    }


def _final_plan(df) -> str:
    # executedPlan AFTER an action on THIS DataFrame's own
    # QueryExecution shows AQE's final choices (a .write wraps the
    # plan in a separate command QueryExecution, leaving df's
    # unexecuted — isFinalPlan stays false)
    df.collect()
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )


def _plan_summary(plan: str) -> dict:
    import re

    return {
        "joins": sorted(
            set(re.findall(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)", plan))
        ),
        "exchanges": len(re.findall(r"Exchange hashpartitioning", plan)),
        "partition_widths": sorted(
            {int(m) for m in re.findall(r"hashpartitioning\([^)]*?, (\d+)\)", plan)},
            reverse=True,
        )[:4],
        "aqe_reads": re.findall(r"AQEShuffleRead (\w+)", plan),
        "final": "isFinalPlan=true" in plan,
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_exp = "--experiments" in sys.argv
    sf_dir = args[0] if args else "/root/repo/.benchdata/sf30"
    out = args[1] if len(args) > 1 else "/tmp/decompose_q05.json"
    point_bytes = _dir_bytes(sf_dir)
    shuffle = max(8, min(2048, point_bytes // (8 * 1024 * 1024)))
    spark = get_spark(app_name="decompose_q05", shuffle_partitions=int(shuffle))
    spark.sparkContext.setLogLevel("ERROR")
    from data_pipeline_001_spark.session import size_adaptive_execution

    size_adaptive_execution(spark, point_bytes)
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    # warm: JVM, listing, codegen (bench._prepare_point's warm query)
    t = load_tables(spark, sf_dir)
    t["lineitem"].groupBy("l_returnflag").count().write.mode("overwrite").format(
        "noop"
    ).save()

    result: dict = {
        "sf_dir": sf_dir,
        "point_bytes": point_bytes,
        "shuffle_partitions": int(shuffle),
        "stages": {},
    }
    prev = 0.0
    for name, df in _prefixes(spark, sf_dir).items():
        s = _time_noop(df)
        result["stages"][name] = {"cum_s": s, "delta_s": round(s - prev, 3)}
        prev = s
        print(f"{s:8.2f}s (+{result['stages'][name]['delta_s']:.2f})  {name}", flush=True)

    full = _prefixes(spark, sf_dir)["full_q05"]
    result["final_plan"] = _plan_summary(_final_plan(full))
    print("final plan:", json.dumps(result["final_plan"]), flush=True)

    if run_exp:
        result["experiments"] = {}
        base = _time_noop(full, n=3)
        result["experiments"]["baseline"] = base
        print(f"baseline best-of-3: {base:.2f}s", flush=True)

        # --- plan-shape alternatives (not knobs) ---------------------
        nation_asia = (
            t["nation"]
            .join(
                F.broadcast(t["region"].where(F.col("r_name") == "ASIA")),
                F.col("n_regionkey") == F.col("r_regionkey"),
            )
            .select("n_nationkey", "n_name")
        )
        cust_asia = (
            t["customer"]
            .join(F.broadcast(nation_asia), F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey", "n_name")
        )
        ord_asia = (
            t["orders"]
            .select("o_orderkey", "o_custkey")
            .join(cust_asia, F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey", "n_name")
        )
        # (a) shuffle-materialization floor: exchange the projected fact
        # on the join key, nothing else — the irreducible cost of any
        # shuffle join's big side
        shuffle_only = (
            t["lineitem"]
            .select("l_orderkey", _rev().alias("r"))
            .repartition(int(shuffle), "l_orderkey")
            .agg(F.sum("r").alias("s"))
        )
        result["experiments"]["fact_shuffle_only"] = _time_noop(shuffle_only, n=3)
        print(f"{result['experiments']['fact_shuffle_only']:8.2f}s  fact_shuffle_only", flush=True)
        # (b) forced broadcast of ord_asia (the documented round-2
        # scale-killer at unbounded corpus — measured here purely for
        # attribution: what DuckDB's shared-memory hash join costs Spark)
        forced = (
            t["lineitem"]
            .select("l_orderkey", _rev().alias("r"))
            .join(F.broadcast(ord_asia), F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum("r"), 2).alias("revenue"))
        )
        result["experiments"]["forced_bcast_ord_asia"] = _time_noop(forced, n=3)
        print(f"{result['experiments']['forced_bcast_ord_asia']:8.2f}s  forced_bcast_ord_asia", flush=True)
        # (c) per-order pre-agg below the join (rejected at sf10 —
        # re-measured because shuffle economics shift with scale: the
        # partial agg cuts exchanged rows ~4:1 before the SMJ)
        preagg = (
            t["lineitem"]
            .groupBy("l_orderkey")
            .agg(F.sum(_rev()).alias("rev"))
            .join(ord_asia, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("n_name")
            .agg(F.round(F.sum("rev"), 2).alias("revenue"))
        )
        result["experiments"]["preagg_per_order"] = _time_noop(preagg, n=3)
        print(f"{result['experiments']['preagg_per_order']:8.2f}s  preagg_per_order", flush=True)
        levers = {
            "shj_over_smj": {"spark.sql.join.preferSortMergeJoin": "false"},
            "scan_64mb": {"spark.sql.files.maxPartitionBytes": str(64 << 20)},
            "scan_32mb": {"spark.sql.files.maxPartitionBytes": str(32 << 20)},
            "shuffle_128": {"spark.sql.shuffle.partitions": "128"},
            "shuffle_256": {"spark.sql.shuffle.partitions": "256"},
            "shj_and_scan64": {
                "spark.sql.join.preferSortMergeJoin": "false",
                "spark.sql.files.maxPartitionBytes": str(64 << 20),
            },
        }
        for name, confs in levers.items():
            saved = {k: spark.conf.get(k) for k in confs}
            for k, v in confs.items():
                spark.conf.set(k, v)
            try:
                s = _time_noop(full, n=3)
                plan = _plan_summary(_final_plan(full))
                result["experiments"][name] = {"best_s": s, "plan": plan}
                print(f"{s:8.2f}s  {name}  {json.dumps(plan['joins'])}", flush=True)
            finally:
                for k, v in saved.items():
                    spark.conf.set(k, v)

    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
