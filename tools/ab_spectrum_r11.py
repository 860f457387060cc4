import sys, time
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import functions as F
from data_pipeline_001_spark.session import get_spark, load_tables
from data_pipeline_001_spark.operators.multimodal import make_tone_wav, wav_spectrum, SPECTRUM_SCHEMA

def old_form(spark, sf_dir):
    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    def build(batches):
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            yield pd.DataFrame({"media_id": ids, "payload": [make_tone_wav(int(d)) for d in ids]})
    media = docs.mapInPandas(build, "media_id long, payload binary")
    def run(batches):
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                row = {"media_id": int(mid)}
                row.update(wav_spectrum(bytes(payload)))
                out.append(row)
            yield pd.DataFrame(out, columns=["media_id","sample_rate","n_samples","dominant_bin","dominant_hz","spectral_centroid_hz"])
    return media.mapInPandas(run, SPECTRUM_SCHEMA).select(
        "media_id", "sample_rate", "n_samples", "dominant_bin", "dominant_hz")

def new_form(spark, sf_dir):
    import __spark_entry__ as e
    return e.queries()["multimodal_wav_spectrum"](spark, sf_dir)

sf_dir = sys.argv[1]; rounds = int(sys.argv[2])
spark = get_spark("ab_spectrum_r11")
sys.path.insert(0, "/root/repo")
o = sorted(map(tuple, old_form(spark, sf_dir).collect()))
n = sorted(map(tuple, new_form(spark, sf_dir).collect()))
assert o == n, f"MISMATCH {len(o)} {len(n)}"
print(f"identity OK: {len(o)} rows identical")
def run(f):
    t0 = time.time(); f(spark, sf_dir).write.format("noop").mode("overwrite").save(); return time.time()-t0
times = {"old": [], "new": []}
for i in range(rounds):
    for name, f in (("old", old_form), ("new", new_form)):
        spark.sparkContext.setJobDescription(f"ab_spectrum {name} r{i}")
        times[name].append(run(f))
for name, ts in times.items():
    print(f"{name}: best {min(ts):.3f}s  all {[round(t,3) for t in ts]}")
