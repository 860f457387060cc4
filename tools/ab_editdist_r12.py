"""Round-12 task 5: editdist1_pairs — pack the deletion-variant join
key (guide §2.3 "shuffle keys instead of payloads").

The FastSS variant table carries (s, i, v) where v is the length-L-1
deletion string; the substitution self-join shuffles (i, v, s) per
side and the indel probe shuffles v against the full string set.
Packing v to xxhash64(v) shrinks the exchanged key from ~L chars to 8
bytes. Exactness is unconditional WITHOUT a residual v-equality
check: hashing only ADDS candidate pairs (collisions), never drops
one, and the operator's final ``levenshtein(x, y) = 1`` verification
(previously a no-op by the FastSS exactness argument) kills any
collision pair — a colliding pair that IS at distance 1 is a true
output pair the exact blocking also finds.

A/B asserts identical pair sets before timing.

Usage: python tools/ab_editdist_r12.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def pairs_packed(df, col):
    base = df.select(F.col(col).alias("s")).where(F.col(col).isNotNull()).distinct()
    var = (
        base.where(F.length("s") >= 1)
        .select("s", F.explode(F.expr("sequence(1, length(s))")).alias("i"))
        .select(
            "s",
            "i",
            F.xxhash64(
                F.expr(
                    "concat(substring(s, 1, i - 1),"
                    " substring(s, i + 1, length(s) - i))"
                )
            ).alias("hv"),
        )
        .localCheckpoint()
    )
    a = var.select("i", "hv", F.col("s").alias("sa"))
    b = var.select("i", "hv", F.col("s").alias("sb"))
    sub = (
        a.join(b, ["i", "hv"])
        .where(F.col("sa") < F.col("sb"))
        .select(F.col("sa").alias("x"), F.col("sb").alias("y"))
    )
    ind = (
        var.select("hv", F.col("s").alias("sa"))
        .join(
            base.select(F.xxhash64("s").alias("hv"), F.col("s").alias("sb")),
            "hv",
        )
        .select(
            F.least("sa", "sb").alias("x"), F.greatest("sa", "sb").alias("y")
        )
        .where(F.col("x") != F.col("y"))
    )
    cand = sub.unionByName(ind).distinct()
    return cand.where(F.levenshtein("x", "y") == 1).select(
        F.col("x").alias("name_a"),
        F.col("y").alias("name_b"),
        F.lit(1).cast("int").alias("dist"),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    import bench
    from data_pipeline_001_spark.session import get_spark, load_tables
    from data_pipeline_001_spark.operators.fuzzy_join import editdist1_pairs

    spark = get_spark(app_name="ab_editdist_r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prepare_point(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    cust = t["customer"]

    old = sorted(map(tuple, editdist1_pairs(cust, "c_name").collect()))
    new = sorted(map(tuple, pairs_packed(cust, "c_name").collect()))
    assert old == new, f"pair sets differ: {len(old)} vs {len(new)}"
    print(f"identical pair sets: {len(old)} pairs")

    best = {"old": 1e9, "new": 1e9}
    for _ in range(3):
        t0 = time.perf_counter(); noop(editdist1_pairs(cust, "c_name"))
        best["old"] = min(best["old"], time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(pairs_packed(cust, "c_name"))
        best["new"] = min(best["new"], time.perf_counter() - t0)
    print(f"editdist1_pairs: old {best['old']:.3f}s  packed {best['new']:.3f}s")

    # end-to-end consumer
    import __spark_entry__ as entry

    qs = entry.queries()
    t0 = time.perf_counter(); noop(qs["er_customer_entities"](spark, sf_dir))
    print(f"er_customer_entities (current code): {time.perf_counter()-t0:.3f}s")
    t0 = time.perf_counter(); noop(qs["join_fuzzy_editdist1"](spark, sf_dir))
    print(f"join_fuzzy_editdist1 (current code): {time.perf_counter()-t0:.3f}s")


if __name__ == "__main__":
    main()
