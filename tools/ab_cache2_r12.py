"""Round-12 cache-hygiene A/B, second cut: noop-sink timing (guide
§1.4) with a CHEAP aggregated identity check (count + xxhash64 sum of
the stringified row) instead of full-output collects — the first cut
stalled for minutes collecting 500k-doc text outputs through the
driver.

Usage: python tools/ab_cache2_r12.py [sf_dir] [query ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def digest(df):
    cols = [F.col(c).cast("string") for c in df.columns]
    return df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(F.concat_ws("\x1f", *cols)).cast("decimal(38,0)")
        ).alias("h"),
    ).collect()[0]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    names = sys.argv[2:] or [
        "graph_triangle_stats",
        "dedup_substring_spans",
        "text_line_dedup",
        "dedup_cluster_components",
        "embedding_covariance",
    ]
    import bench
    from data_pipeline_001_spark.session import get_spark

    spark = get_spark(app_name="ab_cache2_r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prepare_point(spark, sf_dir)

    import __spark_entry__ as entry
    import data_pipeline_001_spark.operators._scoped as scoped

    qs = entry.queries()
    for name in names:
        digs = {}
        for mode in (False, True):
            scoped.USE_CHECKPOINT = mode
            digs[mode] = tuple(digest(qs[name](spark, sf_dir)))
            spark.catalog.clearCache()
        assert digs[False] == digs[True], f"{name}: digests differ {digs}"
        best = {}
        for _ in range(3):
            for mode in (False, True):
                scoped.USE_CHECKPOINT = mode
                t0 = time.perf_counter()
                noop(qs[name](spark, sf_dir))
                dt = time.perf_counter() - t0
                best[mode] = min(best.get(mode, 1e9), dt)
                spark.catalog.clearCache()
        print(
            f"{name}: persist {best[False]:.3f}s  checkpoint {best[True]:.3f}s"
            f"  (digest n={digs[False][0]} identical)",
            flush=True,
        )


if __name__ == "__main__":
    main()
