import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F, Window
from data_pipeline_001_spark.session import get_spark
from data_pipeline_001_spark.operators.dedup import simhash_signatures, simhash_near_duplicates
from data_pipeline_001_spark.operators.similarity import embedding_near_dup_lsh

def old_simhash(docs, prefix_bits=16, max_block_size=200):
    sigs = simhash_signatures(docs, "text", "doc_id")
    blocks = sigs.select("id", "sig", F.explode(F.array(*[
        F.struct(F.lit(i).alias("block"),
                 F.shiftrightunsigned("sig", i * prefix_bits).bitwiseAND(F.lit((1 << prefix_bits) - 1)).alias("key"))
        for i in range(64 // prefix_bits)])).alias("bk")).select("id", "sig", "bk.block", "bk.key")
    wb = Window.partitionBy("block", "key")
    blocks = (blocks.withColumn("_bsz", F.count("*").over(wb))
              .where(F.col("_bsz") <= max_block_size).drop("_bsz"))
    l, r = blocks.alias("l"), blocks.alias("r")
    return (l.join(r, (F.col("l.block") == F.col("r.block")) & (F.col("l.key") == F.col("r.key")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig"))).alias("hamming")).distinct())

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_simhash_r11")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

o = sorted(map(tuple, old_simhash(docs).collect()))
n = sorted(map(tuple, simhash_near_duplicates(docs).collect()))
assert o == n, f"SIMHASH MISMATCH {len(o)} {len(n)}"
print(f"simhash identity OK: {len(o)} pairs")

def run(fn):
    t0 = time.time(); fn().write.format("noop").mode("overwrite").save(); return time.time()-t0
times = {"sim_old": [], "sim_new": [], "emb_lsh_new": []}
for i in range(rounds):
    spark.sparkContext.setJobDescription(f"sim_old r{i}")
    times["sim_old"].append(run(lambda: old_simhash(docs)))
    spark.sparkContext.setJobDescription(f"sim_new r{i}")
    times["sim_new"].append(run(lambda: simhash_near_duplicates(docs)))
    spark.sparkContext.setJobDescription(f"emb_lsh_new r{i}")
    times["emb_lsh_new"].append(run(lambda: embedding_near_dup_lsh(emb, threshold=0.4)))
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
