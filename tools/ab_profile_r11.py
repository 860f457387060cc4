import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from data_pipeline_001_spark.session import get_spark
from data_pipeline_001_spark.operators.profiling import profile

COLS = ["l_orderkey","l_quantity","l_extendedprice","l_discount","l_returnflag","l_linestatus"]

def new_form(df):
    from pyspark.sql import types as T
    fields = {f.name: f.dataType for f in df.schema.fields}
    NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)
    parts = []
    for c in COLS:
        dt = fields[c]
        aggs = [F.count(F.lit(1)).cast("long").alias("n_rows"),
                (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_null"),
                F.count_distinct(F.col(c)).cast("long").alias("n_distinct")]
        if isinstance(dt, NUMERIC):
            aggs += [F.round(F.min(c).cast("double"),6).alias("min_num"),
                     F.round(F.max(c).cast("double"),6).alias("max_num"),
                     F.round(F.avg(F.col(c).cast("double")),6).alias("mean_num"),
                     F.lit(None).cast("string").alias("min_str"),
                     F.lit(None).cast("string").alias("max_str")]
        else:
            aggs += [F.lit(None).cast("double").alias("min_num"),
                     F.lit(None).cast("double").alias("max_num"),
                     F.lit(None).cast("double").alias("mean_num"),
                     F.min(c).alias("min_str"), F.max(c).alias("max_str")]
        parts.append(df.select(c).agg(F.lit(c).alias("column"), *aggs).select(
            "column","n_rows","n_null","n_distinct","min_num","max_num","mean_num","min_str","max_str"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.drop("mean_num")

def old_form(df):
    return profile(df, COLS, exact_distinct=True).drop("mean_num")

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_profile_r11")
df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
o = sorted(map(tuple, old_form(df).collect()))
n = sorted(map(tuple, new_form(df).collect()))
assert o == n, f"MISMATCH\n{o}\n{n}"
print(f"identity OK: {len(o)} rows identical")
def run(f):
    t0 = time.time(); f(df).write.format("noop").mode("overwrite").save(); return time.time()-t0
times = {"old": [], "new": []}
for i in range(rounds):
    for name, f in (("old", old_form), ("new", new_form)):
        spark.sparkContext.setJobDescription(f"ab_profile {name} r{i}")
        times[name].append(run(f))
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
