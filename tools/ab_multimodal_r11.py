import sys, time, importlib.util
sys.path.insert(0, "/root/repo")
from data_pipeline_001_spark.session import get_spark
spec = importlib.util.spec_from_file_location("old_mm", "/tmp/old_multimodal.py")
old_mm = importlib.util.module_from_spec(spec); spec.loader.exec_module(old_mm)
from data_pipeline_001_spark.operators import multimodal as new_mm

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_mm_r11")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

def old_form():
    return old_mm.decode_features(old_mm.attach_media_fixtures(docs)).select(
        "media_id","media_type","width","height","mean_r","mean_g","mean_b",
        "sample_rate","n_samples","duration_ms","rms")
def new_form():
    return new_mm.decode_features(new_mm.attach_media_fixtures(docs)).select(
        "media_id","media_type","width","height","mean_r","mean_g","mean_b",
        "sample_rate","n_samples","duration_ms","rms")

o = sorted(map(tuple, old_form().collect()))
n = sorted(map(tuple, new_form().collect()))
assert o == n, "MISMATCH"
print(f"identity OK: {len(o)} rows identical (incl. rms doubles)")
times = {"old": [], "new": []}
for i in range(rounds):
    for name, f in (("old", old_form), ("new", new_form)):
        spark.sparkContext.setJobDescription(f"ab_mm {name} r{i}")
        t0 = time.time(); f().write.format("noop").mode("overwrite").save(); times[name].append(time.time()-t0)
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
