import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from data_pipeline_001_spark.session import get_spark, load_tables
from data_pipeline_001_spark.operators.graph import copurchase_edges
from data_pipeline_001_spark.operators.dedup import connected_components

def old_cc(pairs, a_col="id_a", b_col="id_b", max_iterations=20):
    pairs_ck = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst")).localCheckpoint()
    edges = pairs_ck.unionByName(pairs_ck.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("label", F.col("node")).localCheckpoint())
    for _ in range(max_iterations):
        nbr_min = (edges.join(labels, edges.src == labels.node)
                   .groupBy("dst").agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr_min, labels.node == nbr_min.dst, "left")
            .select("node", F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"))
            .localCheckpoint())
        changed = (new_labels.alias("n").join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label")).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))

def finish(comp):
    return (comp.groupBy("cluster_id").agg(F.count("*").alias("size"))
            .groupBy(F.col("size").cast("long").alias("size")).agg(F.count("*").alias("n_components")))

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_cc2_r11")
edges = (copurchase_edges(spark.read.parquet(f"{sf_dir}/lineitem.parquet"))
         .where(F.col("weight") >= 2)
         .select(F.col("src").alias("id_a"), F.col("dst").alias("id_b")))
o = sorted(map(tuple, finish(old_cc(edges)).collect()))
n = sorted(map(tuple, finish(connected_components(edges)).collect()))
assert o == n, f"MISMATCH {o} {n}"
print("identity OK:", len(o), "rows")
def run(f):
    t0 = time.time(); finish(f(edges)).write.format("noop").mode("overwrite").save(); return time.time()-t0
times = {"old": [], "new": []}
for i in range(rounds):
    for name, f in (("old", old_cc), ("new", connected_components)):
        spark.sparkContext.setJobDescription(f"ab_cc {name} r{i}")
        times[name].append(run(f))
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
