"""Same-session interleaved A/B: round-11 `pairwise_cosine_pairs`
(one batched-NumPy Arrow task) vs the former broadcast-BNLJ + HOF
fold for the exact pairwise cosine twin.

Identity is proved BEFORE timing, on the raw doubles (bitwise, via
struct packing) — the claim is bit-identical arithmetic, not
approximate equality.

Usage: python tools/ab_cosine_r11.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import struct
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def old_form(emb):
    from data_pipeline_001_spark.functions.vectors import dot, norm

    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        norm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        norm(F.col("embedding")).alias("nb"),
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .where(cos >= 0.5)
        .select("id_a", "id_b", cos.alias("cosine"))
    )


def new_form(emb):
    from data_pipeline_001_spark.operators.similarity import (
        pairwise_cosine_pairs,
    )

    return pairwise_cosine_pairs(emb, threshold=0.5)


def canon(df):
    rows = df.collect()
    return sorted(
        (r.id_a, r.id_b, struct.pack(">d", r.cosine).hex()) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from data_pipeline_001_spark.session import get_spark

    spark = get_spark("ab_cosine_r11")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    old_c, new_c = canon(old_form(emb)), canon(new_form(emb))
    assert old_c == new_c, (
        f"MISMATCH: {len(old_c)} vs {len(new_c)} rows; "
        f"first diff {next((a, b) for a, b in zip(old_c, new_c) if a != b)}"
    )
    print(f"identity OK: {len(old_c)} pairs bit-identical (raw doubles)")

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    times = {"old": [], "new": []}
    for i in range(rounds):
        for name, form in (("old", old_form), ("new", new_form)):
            spark.sparkContext.setJobDescription(f"ab_cosine {name} r{i}")
            times[name].append(run(form(emb)))
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.3f}s  all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
