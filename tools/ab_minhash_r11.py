"""Same-session interleaved A/B: the round-11 bucket-capped pair
GENERATION (groupBy + collect_list + in-bucket pair expansion) vs the
former window-cap + self-join shape, over the identical per-doc
minhash table and identical verify stage.

Usage: python tools/ab_minhash_r11.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def old_pairs(per_doc, num_hashes=32, bands=8, jaccard_threshold=0.5,
              max_bucket_size=100):
    """The pre-round-11 extraction, verbatim: window count cap +
    (band,bucket) self-join."""
    from pyspark.sql import Window

    from data_pipeline_001_spark.operators.dedup import _banded_buckets

    rows_per_band = num_hashes // bands
    banded = _banded_buckets(per_doc.select("id", "sig"), bands, rows_per_band)
    wb = Window.partitionBy("band", "bucket")
    banded = (
        banded.withColumn("_bsz", F.count("*").over(wb))
        .where(F.col("_bsz") <= max_bucket_size)
        .drop("_bsz")
    )
    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    sh = per_doc.select("id", F.col("sh_set").alias("sh"))
    return (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn("_i", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.col("_i").cast("double")
            / (F.size("sh_a") + F.size("sh_b") - F.col("_i")).cast("double"),
        )
        .drop("_i")
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from data_pipeline_001_spark.operators.dedup import (
        _minhash_per_doc,
        minhash_pairs_from_per_doc,
    )
    from data_pipeline_001_spark.session import get_spark, load_tables

    spark = get_spark(app_name="ab_minhash_r11", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t = load_tables(spark, sf_dir)
    t["lineitem"].groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()

    docs = t["documents"].select("doc_id", "text")

    def build(kind):
        from pyspark import StorageLevel

        per_doc = _minhash_per_doc(docs, "text", "doc_id", 32, 3, 42)
        per_doc = per_doc.persist(StorageLevel.MEMORY_AND_DISK)
        if kind == "new":
            return minhash_pairs_from_per_doc(per_doc)
        return old_pairs(per_doc)

    # equivalence first: identical pair rows both shapes
    a = sorted(map(tuple, build("old").collect()))
    spark.catalog.clearCache()
    b = sorted(map(tuple, build("new").collect()))
    assert a == b, f"shapes disagree: {len(a)} vs {len(b)} rows"
    spark.catalog.clearCache()

    best = {"old": float("inf"), "new": float("inf")}
    for i in range(n):
        for kind in ("old", "new"):
            spark.sparkContext.setJobDescription(f"minhash pairs [{kind}] round {i}")
            t0 = time.perf_counter()
            build(kind).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            best[kind] = min(best[kind], dt)
            print(f"round {i} {kind}: {dt:.3f}s", flush=True)
            spark.catalog.clearCache()
    print(json.dumps({"sf_dir": sf_dir, "best": best,
                      "pairs_rows": len(a), "equal": True}))


if __name__ == "__main__":
    main()
