"""Round-12 task 4: copurchase_edges — A/B the distinct+self-join
edge builder against groupBy(order)+positional pair expansion at the
real basket-size distribution (guide §1.2: item-17 showed expansion
can LOSE to the codegen join at large per-group sizes, so this needs
its own measurement, not an assumption).

Both forms produce identical (src, dst, weight) edge sets (asserted
by sorted collect of the full edge list before timing).

Usage: python tools/ab_copurchase_r12.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def edges_join(lineitem):
    """Current form (operators/graph.copurchase_edges)."""
    items = lineitem.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("src"), F.col("b.item").alias("dst"))
        .agg(F.count("*").alias("weight"))
    )


def edges_agg(lineitem):
    """Candidate: ONE aggregation collects each order's distinct item
    set (collect_set — bounded by basket size), positional pair
    expansion over the sorted array (identical to a.item < b.item),
    then the same groupBy(src, dst) count."""
    baskets = (
        lineitem.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .where(F.size("items") >= 2)
    )
    return (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (a, i) -> "
                    "transform(slice(items, i + 2, size(items) - i - 1), "
                    "b -> struct(a AS src, b AS dst))))"
                )
            ).alias("p")
        )
        .groupBy("p.src", "p.dst")
        .agg(F.count("*").alias("weight"))
        .select(F.col("src"), F.col("dst"), F.col("weight"))
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    import bench
    from data_pipeline_001_spark.session import get_spark, load_tables

    spark = get_spark(app_name="ab_copurchase_r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prepare_point(spark, sf_dir)
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]

    # basket-size distribution for the record
    dist = (
        li.select("l_orderkey", "l_partkey").distinct()
        .groupBy("l_orderkey").count()
        .groupBy("count").agg(F.count("*").alias("n_orders"))
        .orderBy("count")
    )
    print("basket-size distribution:", dist.collect())

    old = sorted(map(tuple, edges_join(li).collect()))
    new = sorted(map(tuple, edges_agg(li).collect()))
    assert old == new, f"edge sets differ: {len(old)} vs {len(new)}"
    print(f"identical edge sets: {len(old)} edges")

    best = {"join": 1e9, "agg": 1e9}
    for _ in range(3):
        t0 = time.perf_counter(); noop(edges_join(li))
        best["join"] = min(best["join"], time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(edges_agg(li))
        best["agg"] = min(best["agg"], time.perf_counter() - t0)
    print(f"edge build only: join {best['join']:.3f}s  agg {best['agg']:.3f}s")

    # end-to-end: the heaviest consumer (triangle_stats over the edges)
    from data_pipeline_001_spark.operators.graph import triangle_stats

    beste = {"join": 1e9, "agg": 1e9}
    for _ in range(3):
        t0 = time.perf_counter(); noop(triangle_stats(edges_join(li)))
        beste["join"] = min(beste["join"], time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(triangle_stats(edges_agg(li)))
        beste["agg"] = min(beste["agg"], time.perf_counter() - t0)
    print(
        f"triangle_stats end-to-end: join {beste['join']:.3f}s"
        f"  agg {beste['agg']:.3f}s"
    )


if __name__ == "__main__":
    main()
