"""Round-11 A/B (measured REJECTION, kept as evidence): interpreted
HOF dot/norm (zip_with+aggregate) vs a dim-unrolled 64-term
element_at/get expression tree.

Hypothesis (inherited from the interrupted round-11 session): array
lambda HOFs evaluate interpreted, one lambda call per element per
row, so unrolling the fixed-64 dot into a flat expression tree should
codegen and win. MEASURED RESULT on Spark 4.1.2: the unroll LOSES
~2x in every real query context —

  pairwise cosine, 2k slice (noop best-of-2, interleaved):
      hof 22.99s / 25.76s   unrolled 43.11s / 46.35s
  brute_force_topk sf1:
      hof 1.86s / 1.84s     unrolled 3.56s / 3.83s
  isolated scored-join (this file), warm:
      hof 1.44s  get-unroll 2.81s  element_at-unroll 3.09s

Both forms print identical WholeStageCodegen status, and `get`
(no ANSI bounds machinery) is only marginally better than
`element_at` — the HOF fold is simply the faster evaluation path for
64-float arrays on this engine version. The production dot/norm
therefore stay in HOF form (functions/vectors.py), and this harness
pins the rejection so the hypothesis isn't re-tried blind.

Outputs are asserted IDENTICAL (sorted collect) before timing: the
unroll keeps the exact left-fold order, so equality is bit-level.

Usage: python tools/ab_vec_r11.py [sf1_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def unrolled_dot(a, b, dim: int, use_get: bool = False):
    """0.0 left-fold in array order with per-element double casts —
    operation-for-operation the HOF fold, flattened."""
    acc = F.lit(0.0)
    for i in range(dim):
        if use_get:
            acc = acc + F.get(a, i).cast("double") * F.get(b, i).cast("double")
        else:
            acc = acc + F.element_at(a, i + 1).cast("double") * F.element_at(
                b, i + 1
            ).cast("double")
    return acc


def timed(spark, df, label, n=2):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    print(f"  {label}: best-of-{n} {best:.3f}s", flush=True)
    return best


def pairwise(emb, dim):
    from data_pipeline_001_spark.functions.vectors import dot, norm

    def d(a, b):
        return dot(a, b) if dim is None else unrolled_dot(a, b, dim)

    def nrm(a):
        return F.sqrt(d(a, a))

    _ = norm  # HOF reference form lives in functions.vectors
    a = emb.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        nrm(F.col("embedding")).alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        nrm(F.col("embedding")).alias("nb"),
    )
    cos = d(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
        .where(cos >= 0.5)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


def main():
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
    from sweep_sf1 import _build_slice

    from data_pipeline_001_spark.session import get_spark

    spark = get_spark()
    slice_dir = _build_slice(sf1)
    emb2k = spark.read.parquet(os.path.join(slice_dir, "embeddings.parquet"))

    print("== pairwise cosine, 2k slice ==", flush=True)
    before, after = pairwise(emb2k, None), pairwise(emb2k, 64)
    rows_b = sorted(map(tuple, before.collect()))
    rows_a = sorted(map(tuple, after.collect()))
    assert rows_b == rows_a, "pairwise outputs differ"
    print(f"  identical: {len(rows_a)} rows", flush=True)
    for tag, df in [("hof", before), ("unrolled", after)] * 2:
        timed(spark, df, tag)


if __name__ == "__main__":
    main()
