"""Round-12 task 6: text_keyword_rake single-pass rewrite (guide
§2.4). Phrases and phrase membership are doc-LOCAL, so the
posexplode + row_number window + three joins can collapse into a
per-doc split: runs of non-stopwords are recovered by replacing
whole stopword tokens in the doubled-space-joined word list and
splitting — no window, no (doc_id, grp) join, no members table. The
two global aggregations that remain are vocabulary-sized (word
degree/frequency) and distinct-phrase-sized (occurrence counts); a
phrase's score is then recomputed from its OWN words (an occurrence's
word multiset is a pure function of the phrase string), so
min(sc) == sc and the per-occurrence score join disappears.

Integer-exactness: word micro-scores use the same
round(1e6 * sum(plen)/count) expression on the same exact integer
partials, and phrase scores are the same BIGINT sums — the oracle's
determinism argument is unchanged.

A/B asserts identical 20-row output before timing.

Usage: python tools/ab_rake_r12.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def noop(df):
    df.write.mode("overwrite").format("noop").save()


def rake_single_pass(spark, sf_dir):
    from data_pipeline_001_spark.plans.queries_mining import (
        _RAKE_MAX_PHRASE,
        _RAKE_STOPS,
        _RAKE_TOPK,
    )
    from data_pipeline_001_spark.session import load_tables

    t = load_tables(spark, sf_dir)
    stop_alt = "|".join(_RAKE_STOPS)
    # '  w1  w2 ...  ': two-space separators so adjacent stopword
    # matches cannot overlap (each ' stop ' consumes one space per
    # side and leaves one for the neighbor)
    joined = F.concat(
        F.lit("  "),
        F.array_join(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"), "  "
        ),
        F.lit("  "),
    )
    cut = F.regexp_replace(joined, f" (?:{stop_alt}) ", " | ")
    # runs -> word arrays; empty chunks (leading/trailing/adjacent
    # stopwords) trim to '' and drop; plen > max phrases drop (HAVING)
    phrases = F.filter(
        F.transform(
            F.split(cut, r"\|"),
            lambda r: F.split(F.trim(r), "  +"),
        ),
        lambda a: (F.size(a) <= _RAKE_MAX_PHRASE)
        & (F.element_at(a, 1) != F.lit("")),
    )
    occ = t["documents"].select(
        F.explode(phrases).alias("pw")
    ).select(
        F.array_join("pw", " ").alias("phrase"),
        F.size("pw").alias("plen"),
        F.col("pw"),
    )
    # vocabulary-sized: degree/frequency micro-score per word
    wstats = (
        occ.select(F.explode("pw").alias("w"), "plen")
        .groupBy("w")
        .agg(
            F.round(F.lit(1000000.0) * F.sum("plen") / F.count("*"))
            .cast("long")
            .alias("s")
        )
    )
    # distinct-phrase-sized: occurrence counts
    pstats = occ.groupBy("phrase").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
    # a phrase's score from its own words (same multiset as any of its
    # occurrences' member rows)
    scored = (
        pstats.select(
            "phrase",
            "n_occurrences",
            F.explode(F.split("phrase", " ")).alias("w"),
        )
        .join(wstats, "w")
        .groupBy("phrase", "n_occurrences")
        .agg(F.sum("s").alias("msc"))
    )
    return (
        scored.orderBy(F.col("msc").desc(), F.col("phrase"))
        .limit(_RAKE_TOPK)
        .select(
            "phrase",
            "n_occurrences",
            F.round(F.col("msc") / 1000000.0, 6).alias("score"),
        )
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".benchdata/sf1"
    import bench
    from data_pipeline_001_spark.session import get_spark

    spark = get_spark(app_name="ab_rake_r12")
    spark.sparkContext.setLogLevel("ERROR")
    bench._prepare_point(spark, sf_dir)

    import __spark_entry__ as entry

    qs = entry.queries()
    old = [tuple(r) for r in qs["text_keyword_rake"](spark, sf_dir).collect()]
    new = [tuple(r) for r in rake_single_pass(spark, sf_dir).collect()]
    assert old == new, f"outputs differ:\nold={old}\nnew={new}"
    print(f"identical top-{len(old)} (ordered)")

    best = {"old": 1e9, "new": 1e9}
    for _ in range(3):
        t0 = time.perf_counter(); noop(qs["text_keyword_rake"](spark, sf_dir))
        best["old"] = min(best["old"], time.perf_counter() - t0)
        t0 = time.perf_counter(); noop(rake_single_pass(spark, sf_dir))
        best["new"] = min(best["new"], time.perf_counter() - t0)
    print(f"rake: old {best['old']:.3f}s  single-pass {best['new']:.3f}s")


if __name__ == "__main__":
    main()
