import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from data_pipeline_001_spark.session import get_spark
from data_pipeline_001_spark.operators.text_analysis import bpe_pair_stats

def old_form(docs, top_k=50):
    words = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    ).where(F.length("w") >= 2)
    pairs = words.select(F.explode(
        F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).alias("pair"))
    return (pairs.groupBy("pair").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), F.asc("pair")).limit(top_k))

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_bpe_r11")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
o = [tuple(r) for r in old_form(docs).collect()]
n = [tuple(r) for r in bpe_pair_stats(docs).collect()]
assert o == n, f"MISMATCH\n{o[:5]}\n{n[:5]}"
print(f"identity OK: {len(o)} rows identical (ordered)")
def run(fn):
    t0 = time.time(); fn().write.format("noop").mode("overwrite").save(); return time.time()-t0
times = {"old": [], "new": []}
for i in range(rounds):
    for name, fn in (("old", lambda: old_form(docs)), ("new", lambda: bpe_pair_stats(docs))):
        spark.sparkContext.setJobDescription(f"ab_bpe {name} r{i}")
        times[name].append(run(fn))
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
