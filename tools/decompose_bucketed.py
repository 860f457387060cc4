"""Stage decomposition of the BUCKETED q03/q05 path at a scale point.

Round-9: the sf100 rung showed bucketed q03's ratio vs DuckDB rising
(2.42x at sf30 -> 2.99x at sf100) while q10's fell — the first
bucketed trend break since the round-8 layout fix. This tool answers
WHERE the extra time goes by timing the plan's stages cumulatively on
the same bucketed tables bench.py uses:

  scan      bucketed lineitem scan + ship-date filter (no agg)
  preagg    + groupBy(l_orderkey).sum  (the bucket-local aggregation)
  join      + orders join on the bucket key (sort-merge, no exchange)
  full      the whole registry query (adds dim broadcast + top-k)

Each stage runs to the noop sink, best of ``n`` (default 3),
interleaved with nothing else. Compare two points to see which
stage's per-row throughput degrades.

Usage: python tools/decompose_bucketed.py [sf_dir] [n]
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


def _best(fn, n: int) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf30"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from data_pipeline_001_spark.plans.queries_bucketed import ensure_bucketed
    from data_pipeline_001_spark.session import get_spark, load_tables

    spark = get_spark(app_name="decompose_bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    names = ensure_bucketed(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    li = spark.table(names["lineitem"])
    orders = spark.table(names["orders"])
    cut = F.lit("1998-06-15 00:00:00").cast("timestamp")

    import __spark_entry__ as entry

    qs = entry.queries()

    li_f = li.where(F.col("l_shipdate") > cut)
    rev = F.sum(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    ).alias("rev")
    preagg = li_f.groupBy("l_orderkey").agg(rev)
    joined = preagg.join(
        orders.where(F.col("o_orderdate") < cut),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )

    stages = {
        "scan_filter": lambda: _noop(li_f.select("l_orderkey", "l_extendedprice", "l_discount")),
        "preagg": lambda: _noop(preagg),
        "join_orders": lambda: _noop(joined.select("o_orderkey", "rev")),
        "q03_full": lambda: _noop(qs["q03_shipping_priority_bucketed"](spark, sf_dir)),
        "preagg_unfiltered_q05": lambda: _noop(
            li.groupBy("l_orderkey").agg(rev)
        ),
        "q05_full": lambda: _noop(qs["q05_nation_revenue_bucketed"](spark, sf_dir)),
    }
    # warm the session (file listing, codegen) before timing
    _noop(li.groupBy("l_returnflag").count())

    out = {"sf_dir": sf_dir, "n": n, "stages": {}}
    for name, fn in stages.items():
        out["stages"][name] = _best(fn, n)
        print(f"{name:24s} {out['stages'][name]:8.3f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
