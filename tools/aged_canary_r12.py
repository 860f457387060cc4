"""Round-12 aged-session canary (VERDICT task 3 done-criterion):
run a probe set EARLY in a fresh session, then run the cache-heavy
operator queries N times to age the session the way the 308-query
sweep does, then re-run the probe LATE. Late/early ratio per probe
query is the canary; the round-11 finding was up to 3.5x with
accumulating persists, and the fix target is <= 1.2x.

Also prints the number of entries left in the CacheManager and the
storage memory used after aging — the direct observable.

Usage: python tools/aged_canary_r12.py [sf_dir] [n_age_rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


PROBES = [
    "quality_constraint_report",
    "geo_haversine_pairs",
    "text_stats_by_lang",
    "q05_nation_revenue",
]

#: the queries whose operators materialize bounded intermediates —
#: each iteration leaves N cache entries behind under the persist
#: form and none (post-GC) under the checkpoint form
AGERS = [
    # NOT dedup_cluster_components / dedup_substring_spans: the former
    # is quadratic-by-design on a full corpus (the sweep runs it on a
    # 2k slice only) and the latter runs ~50 s at sf1 — the canary
    # needs cache-entry COUNT, not per-query weight
    "dedup_minhash_lsh",
    "dedup_simhash",
    "graph_triangle_stats",
    "text_line_dedup",
    "text_winnowing_fingerprints",
    "dedup_incremental_near",
]


def run(spark, qs, name, sf_dir):
    t0 = time.perf_counter()
    noop(qs[name](spark, sf_dir))
    return time.perf_counter() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import bench
    import data_pipeline_001_spark.operators._scoped as scoped
    from data_pipeline_001_spark.session import get_spark

    if len(sys.argv) > 3:  # "persist" re-creates the round-11 shape
        scoped.USE_CHECKPOINT = sys.argv[3] != "persist"
    print("mode:", "checkpoint" if scoped.USE_CHECKPOINT else "persist")
    spark = get_spark(app_name="aged_canary_r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prepare_point(spark, sf_dir)

    import __spark_entry__ as entry

    qs = entry.queries()

    early = {n: min(run(spark, qs, n, sf_dir) for _ in range(2)) for n in PROBES}
    print("early:", {n: round(v, 3) for n, v in early.items()})

    for r in range(n_rounds):
        t0 = time.perf_counter()
        for n in AGERS:
            run(spark, qs, n, sf_dir)
        print(f"aging round {r}: {time.perf_counter()-t0:.1f}s")

    try:
        sc = spark.sparkContext._jsc.sc()
        infos = list(sc.getRDDStorageInfo())
        used = sum(i.memSize() for i in infos)
        print(
            f"cached RDDs after aging: {len(infos)}"
            f"  storage mem used: {used/1e6:.1f} MB"
        )
    except Exception as exc:  # noqa: BLE001
        print("storage probe failed:", exc)
    try:
        n_cm = spark._jsparkSession.sharedState().cacheManager()
        print("cacheManager isEmpty:", n_cm.isEmpty())
    except Exception as exc:  # noqa: BLE001
        print("cacheManager probe failed:", exc)

    late = {n: min(run(spark, qs, n, sf_dir) for _ in range(2)) for n in PROBES}
    print("late:", {n: round(v, 3) for n, v in late.items()})
    print(
        "late/early:",
        {n: round(late[n] / early[n], 2) for n in PROBES},
    )


if __name__ == "__main__":
    main()
