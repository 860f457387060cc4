import sys, time, math
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from data_pipeline_001_spark.session import get_spark
from data_pipeline_001_spark.operators.similarity import _hyperplanes, _cos_prenormed, embedding_near_dup_lsh
from data_pipeline_001_spark.functions.vectors import norm, random_projection_signature

def old_form(corpus, threshold=0.4, tables=16, dim=64, seed=42, max_bucket_size=500, target_bucket_size=64):
    n = corpus.count()
    bits = max(4, min(16, math.ceil(math.log2(max(n, 2) / target_bucket_size))))
    parts = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        sig = random_projection_signature("`embedding`", planes)
        parts.append(corpus.select(F.col("vec_id").alias("id"), F.lit(t).alias("tbl"), sig.alias("bucket")))
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)
    wb = Window.partitionBy("tbl", "bucket")
    banded = (banded.withColumn("_bsz", F.count("*").over(wb))
              .where(F.col("_bsz") <= max_bucket_size).drop("_bsz"))
    candidates = (banded.alias("l").join(banded.alias("r"),
        (F.col("l.tbl") == F.col("r.tbl")) & (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b")).distinct())
    vecs = corpus.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"), norm(F.col("embedding")).alias("n"))
    cos = _cos_prenormed(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (candidates
        .join(vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")), "id_a")
        .join(vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")), "id_b")
        .where(cos >= threshold)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine")))

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_emblsh_r11")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
o = sorted(map(tuple, old_form(emb).collect()))
n = sorted(map(tuple, embedding_near_dup_lsh(emb, threshold=0.4).collect()))
assert o == n, f"MISMATCH {len(o)} {len(n)}"
print(f"identity OK: {len(o)} pairs")
def run(fn):
    t0 = time.time(); fn().write.format("noop").mode("overwrite").save(); return time.time()-t0
times = {"old": [], "new": []}
for i in range(rounds):
    for name, fn in (("old", lambda: old_form(emb)), ("new", lambda: embedding_near_dup_lsh(emb, threshold=0.4))):
        spark.sparkContext.setJobDescription(f"ab_emblsh {name} r{i}")
        times[name].append(run(fn))
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
