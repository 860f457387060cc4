"""Same-session interleaved A/B: round-11 `char_ngram_group_counts`
(Arrow int64-packed map-side counting) vs the former transform+explode
string path for text_trigram_coverage. Identity proved on the full
output rows before timing.

Usage: python tools/ab_trigram_r11.py [sf_dir] [n_rounds]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F


def _finish(tc):
    wl = Window.partitionBy("lang")
    ranked = tc.select(
        "lang",
        "c",
        F.row_number().over(wl.orderBy(F.desc("c"), F.asc("tg"))).alias("rn"),
        F.sum("c").over(wl).alias("total"),
        F.count("*").over(wl).alias("n_distinct"),
    )
    return (
        ranked.groupBy("lang")
        .agg(
            F.min("total").cast("bigint").alias("n_trigrams"),
            F.min("n_distinct").cast("bigint").alias("distinct_trigrams"),
            F.round(
                F.sum(
                    F.when(F.col("rn") <= 100, F.col("c").cast("double")).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.min("total"),
                6,
            ).alias("top100_coverage"),
        )
        .orderBy("lang")
    )


def old_form(docs):
    tri = (
        docs.where(F.length("text") >= 3)
        .select("lang", F.lower("text").alias("low"))
        .select(
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(length(low) - 2, 1)),"
                    " i -> substring(low, i, 3))"
                )
            ).alias("tg"),
        )
    )
    return _finish(tri.groupBy("lang", "tg").agg(F.count("*").alias("c")))


def new_form(docs):
    from data_pipeline_001_spark.operators.text_analysis import (
        char_ngram_group_counts,
    )

    tc = char_ngram_group_counts(docs, "text", "lang", 3).select(
        F.col("g").alias("lang"), "tg", "c"
    )
    return _finish(tc)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from data_pipeline_001_spark.session import get_spark

    spark = get_spark("ab_trigram_r11")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    old_rows = sorted(map(tuple, old_form(docs).collect()))
    new_rows = sorted(map(tuple, new_form(docs).collect()))
    assert old_rows == new_rows, f"MISMATCH:\n{old_rows}\n{new_rows}"
    print(f"identity OK: {len(old_rows)} output rows identical")

    def run(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    times = {"old": [], "new": []}
    for i in range(rounds):
        for name, form in (("old", old_form), ("new", new_form)):
            spark.sparkContext.setJobDescription(f"ab_trigram {name} r{i}")
            times[name].append(run(form(docs)))
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.3f}s  all {[round(t, 3) for t in ts]}")


if __name__ == "__main__":
    main()
