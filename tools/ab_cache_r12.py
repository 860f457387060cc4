"""Round-12 task 3 (cache hygiene, guide §5): A/B persist vs
localCheckpoint for the operator-level bounded intermediates that the
round-11 aged-session finding showed accumulate in the CacheManager
for the session lifetime (up to 3.5x late-session degradation):

  - dedup.minhash_lsh_pairs per-doc table   (dedup.py:182)
  - dedup.ngram_jaccard_pairs gram table    (dedup.py:490)
  - graph.triangle_stats edges + oriented   (graph.py:94/117)
  - text_analysis.duplicated_substring_spans grams (text_analysis.py:706)
  - text_analysis.line_dedup lines          (text_analysis.py:956)

Protocol: same-session interleaved best-of-3 per variant, identical
output asserted (sorted collect) before timing. The variants are
selected via the SPARK_GRAFT_CKPT env toggle the operators honor in
round 12 (persist when unset/0 — the round-11 shape — checkpoint
when 1), so both forms run the SAME code path.

Usage: python tools/ab_cache_r12.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    import bench
    from data_pipeline_001_spark.session import get_spark

    spark = get_spark(app_name="ab_cache_r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prepare_point(spark, sf_dir)

    import __spark_entry__ as entry
    import data_pipeline_001_spark.operators._scoped as scoped

    qs = entry.queries()
    targets = [
        "dedup_minhash_lsh",
        "graph_triangle_stats",
        "dedup_substring_spans",
        "text_line_dedup",
        "dedup_cluster_components",
    ]
    for name in targets:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        # output identity first (one run per variant)
        rows = {}
        for mode in (False, True):
            scoped.USE_CHECKPOINT = mode
            rows[mode] = sorted(
                map(tuple, qs[name](spark, sf_dir).collect())
            )
            spark.catalog.clearCache()
        assert rows[False] == rows[True], f"{name}: outputs differ!"
        best = {}
        for rep in range(3):
            for mode in (False, True):
                scoped.USE_CHECKPOINT = mode
                t0 = time.perf_counter()
                noop(qs[name](spark, sf_dir))
                dt = time.perf_counter() - t0
                best[mode] = min(best.get(mode, 1e9), dt)
                spark.catalog.clearCache()
        print(
            f"{name}: persist {best[False]:.3f}s  checkpoint {best[True]:.3f}s"
            f"  ({len(rows[False])} rows identical)"
        )


if __name__ == "__main__":
    main()
