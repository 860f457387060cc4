"""Dataset-curation queries for the training-data surface (§2.13):
deterministic train/holdout splitting and stratified sampling over the
documents corpus. Registers into the shared REGISTRY.

Splits must be a pure function of a stable document key — never of
row order, partitioning, or a RNG — so that re-running the pipeline
on a grown corpus keeps every existing document on its original side
(no train/test contamination as data accretes). The md5-prefix rule
here is the standard trick: hex prefix "00".."cc" ≈ 205/256 ≈ 80.1%
of keys, uniformly and engine-independently.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

# first two hex chars of md5(doc_id); "00".."cc" = 205 of 256 buckets
TRAIN_PREFIX_MAX = "cc"


def with_split(df, key_col: str = "doc_id"):
    """Assign each row to 'train' or 'holdout' by md5 prefix of its
    key — deterministic, engine-independent, stable under appends."""
    prefix = F.substring(F.md5(F.col(key_col).cast("string")), 1, 2)
    return df.withColumn(
        "split",
        F.when(prefix <= TRAIN_PREFIX_MAX, F.lit("train")).otherwise(
            F.lit("holdout")
        ),
    )


@query(
    "curation_train_holdout_split",
    """
    SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT lang, n_chars,
                 CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= 'cc'
                      THEN 'train' ELSE 'holdout' END AS split
          FROM documents) t
    GROUP BY split, lang
    """,
)
def train_holdout_split(spark, sf_dir):
    """Split health check: doc and char counts per (split, lang) —
    the numbers a dataset card reports to show the holdout is
    stratification-representative."""
    t = load_tables(spark, sf_dir)
    return (
        with_split(t["documents"])
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query("curation_pack_sequences")  # greedy bin-pack UDTF — rows-only check
def pack_sequences(spark, sf_dir):
    """Sequence packing: whitespace-token counts → bucket-parallel
    first-fit-decreasing into 512-token packs (operators/packing)."""
    from data_pipeline_001_spark.functions import text as TX
    from data_pipeline_001_spark.operators.packing import pack_documents

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    return pack_documents(docs, budget=512, n_buckets=16)


@query("curation_stratified_sample")  # seeded RNG — rows-only check
def stratified_sample(spark, sf_dir):
    """Per-language stratified sample (`sampleBy`): equalize language
    representation by downsampling the dominant strata. Bernoulli
    per-row sampling — one scan, no shuffle, no driver collection;
    exact-size strata would need a per-stratum sort (sampleBy's
    trade-off is size variance for a single cheap pass)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    fractions = {
        r["lang"]: 0.25 for r in docs.select("lang").distinct().collect()
    }
    return docs.sampleBy("lang", fractions, seed=42).select(
        "doc_id", "lang", "source"
    )
