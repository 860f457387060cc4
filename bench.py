"""Benchmark harness: timed headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes fully via the no-op sink (forces the whole plan —
scan, shuffles, aggregation — without driver-side collection cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_nation_revenue",
    "q10_returned_revenue",
    "join_range_events_buckets",
    "join_asof_events_spine",
    "agg_count_reconciliation",
    "agg_rollup_region_nation",
    "window_topk_orders_per_customer",
    "window_sessionization",
    "time_tumbling_agg",
    "json_extract_props",
    "dedup_exact_fingerprint",
    "dedup_minhash_lsh",
    "text_stats_by_lang",
    "similarity_bruteforce_topk",
]


def _dir_bytes(sf_dir: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(sf_dir):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from data_pipeline_001_spark.session import get_spark, load_tables

    # size shuffle parallelism to the data: ~1 partition per 8 MB of
    # input, clamped to [8, 2048]. At sf0.1 that's 8 (tiny tasks cost
    # more than they parallelize); at 100 TB the same rule gives
    # thousands and AQE coalesces the excess at runtime.
    shuffle = max(8, min(2048, _dir_bytes(sf_dir) // (8 * 1024 * 1024)))
    spark = get_spark(app_name="bench", shuffle_partitions=int(shuffle))
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # warm the JVM + file listing + codegen pipeline once so per-query
    # times measure the plans, not session startup
    tables = load_tables(spark, sf_dir)
    tables["lineitem"].groupBy("l_returnflag").count().write.mode(
        "overwrite"
    ).format("noop").save()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        timings[name] = round(dt, 3)
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
