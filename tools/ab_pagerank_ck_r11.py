import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from data_pipeline_001_spark.session import get_spark
from data_pipeline_001_spark.operators.graph import copurchase_edges, pagerank

def pagerank_ck_bcast(edges, iterations=5, damping=0.85, inter_round=8, cap=100_000):
    sym = edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    adj = (sym.groupBy("src").agg(F.collect_list("dst").alias("all_nbrs"))
        .select("src", F.size("all_nbrs").alias("deg"),
            F.explode(F.expr(
                "transform(sequence(0, int(ceil(size(all_nbrs) /"
                f" {cap}.0)) - 1), i -> slice(all_nbrs, i * {cap} + 1, {cap}))")).alias("nbrs"))
        .localCheckpoint(eager=True))
    nodes = adj.select("src").distinct()
    n = nodes.count()
    pr = nodes.select("src", F.round(F.lit(1.0) / F.lit(n), inter_round).alias("pr"))
    for _ in range(iterations):
        contrib = (adj.join(F.broadcast(pr), "src")
            .select(F.explode("nbrs").alias("dst"), (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("mass")))
        pr = contrib.select(F.col("dst").alias("src"),
            F.round(F.lit((1.0 - damping) / n) + F.lit(damping) * F.col("mass"), inter_round).alias("pr"))
    return pr.select(F.col("src").alias("node"), "pr")

def finish(pr):
    return (pr.select("node", F.round("pr", 6).alias("pagerank"))
              .orderBy(F.col("pagerank").desc(), F.col("node").asc()).limit(20))

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_pr3_r11")
edges = copurchase_edges(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
o = sorted(map(tuple, finish(pagerank(edges)).collect()))
spark.catalog.clearCache()
n = sorted(map(tuple, finish(pagerank_ck_bcast(edges)).collect()))
assert o == n, "MISMATCH"
print("identity OK")
def run(f):
    t0 = time.time(); finish(f(edges)).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache(); return time.time()-t0
times = {"persist_bcast": [], "ck_bcast": []}
for i in range(rounds):
    for name, f in (("persist_bcast", pagerank), ("ck_bcast", pagerank_ck_bcast)):
        spark.sparkContext.setJobDescription(f"{name} r{i}")
        times[name].append(run(f))
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
