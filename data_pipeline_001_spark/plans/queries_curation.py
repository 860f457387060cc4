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


@query(
    "curation_pack_sequences",
    """
    SELECT doc_id,
           CAST(len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                                 ' ')) AS BIGINT) AS n_tokens,
           TRUE AS fits_budget
    FROM documents
    """,
)
def pack_sequences(spark, sf_dir):
    """Sequence packing: whitespace-token counts → bucket-parallel
    first-fit-decreasing into 512-token packs (operators/packing).

    The greedy assignment is imperative (not SQL-expressible), so the
    cross-engine gate checks the packer's INVARIANTS per document:
    the token count the packer consumed matches the oracle's
    independent count, every document appears exactly once (row-count
    equality), and the pack the document landed in respects the token
    budget (fits_budget — singleton packs for oversized documents are
    the documented exception). Pack-id/slot assignments stay covered
    by the pytest property suite."""
    from pyspark.sql import Window as W

    from data_pipeline_001_spark.functions import text as TX
    from data_pipeline_001_spark.operators.packing import pack_documents

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_documents(docs, budget=512, n_buckets=16)
    wp = W.partitionBy("bucket", "pack_id")
    return packed.select(
        "doc_id",
        "n_tokens",
        (
            (F.sum("n_tokens").over(wp) <= F.lit(512))
            | (F.count("*").over(wp) == F.lit(1))
        ).alias("fits_budget"),
    )


def _end_to_end_oracle() -> str:
    """Compose the curation-pipeline oracle from the same SQL fragments
    the individual stage oracles use (queries_llm.QUALITY_SQL/_RATIO),
    so stage and pipeline oracles can't drift apart."""
    from data_pipeline_001_spark.plans.queries_llm import _NORM_SQL, _RATIO, QUALITY_SQL

    return f"""
    WITH enriched AS (
      SELECT doc_id, n_chars,
             md5({_NORM_SQL}) AS fp,
             {QUALITY_SQL} AS quality,
             {_RATIO['de']} AS r_de, {_RATIO['en']} AS r_en,
             {_RATIO['es']} AS r_es, {_RATIO['fr']} AS r_fr
      FROM documents),
    labeled AS (
      SELECT doc_id, n_chars, quality,
             CASE WHEN GREATEST(r_de, r_en, r_es, r_fr) = 0 THEN 'und'
                  WHEN r_fr >= r_es AND r_fr >= r_en AND r_fr >= r_de THEN 'fr'
                  WHEN r_es >= r_en AND r_es >= r_de THEN 'es'
                  WHEN r_en >= r_de THEN 'en'
                  ELSE 'de' END AS predicted_lang,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) <= '{TRAIN_PREFIX_MAX}'
                  THEN 'train' ELSE 'holdout' END AS split,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM enriched)
    SELECT predicted_lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(quality), 6) AS avg_quality
    FROM labeled
    WHERE rn = 1 AND quality >= 0.3
    GROUP BY predicted_lang, split
    """


@query("curation_end_to_end", _end_to_end_oracle())
def curation_end_to_end(spark, sf_dir):
    """The whole curation pipeline as ONE lazy plan: exact dedup
    (min-id survivor per fingerprint) → quality gate (>= 0.3) →
    heuristic language ID → deterministic train/holdout split →
    dataset-card rollup per (predicted_lang, split).

    Plan shape: a single scan computes fingerprint, quality, language,
    and split as column expressions; one shuffle for the dedup window
    (keyed on fingerprint), one for the final aggregate. Filters sit
    below the window so pruned copies never reach the rollup. At
    100 TB this is scan + 2 narrow-key exchanges — no joins, no UDFs,
    no driver collection.
    """
    from pyspark.sql import Window

    from data_pipeline_001_spark.functions import text as TX
    from data_pipeline_001_spark.operators.text_analysis import predicted_language

    t = load_tables(spark, sf_dir)
    tcol = F.col("text")
    enriched = t["documents"].select(
        "doc_id",
        "n_chars",
        TX.fingerprint(tcol).alias("fp"),
        TX.quality_score(tcol).alias("quality"),
        predicted_language(tcol).alias("predicted_lang"),
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        with_split(enriched)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("quality") >= 0.3))
        .groupBy("predicted_lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
    )


@query(
    "curation_sample_per_stratum",
    """
    SELECT lang, doc_id, source, rn FROM (
      SELECT lang, doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) t
    WHERE rn <= 30
    """,
)
def sample_per_stratum(spark, sf_dir):
    """Exactly-k-per-language deterministic sample: rank docs inside
    each stratum by md5(doc_id) — a pseudo-random but reproducible
    order — and keep the first 30. Complements `sampleBy` (Bernoulli,
    size-variant): this gives exact stratum sizes and append-stable
    membership for docs that stay in the corpus.

    Languages are FEW and HUGE at scale, so the naive single window
    per lang would be a straggler; the salted two-phase top-k keeps
    the heavy ranking parallel (32 slices per stratum) and only ranks
    k·32 candidate rows per language exactly.
    """
    from data_pipeline_001_spark.operators.windows import top_k_per_group_salted

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "lang", "doc_id", "source", F.md5(F.col("doc_id").cast("string")).alias("_h")
    )
    return top_k_per_group_salted(
        docs,
        ("lang",),
        [F.col("_h").asc(), F.col("doc_id").asc()],
        k=30,
        salt_on=F.col("doc_id"),
    ).drop("_h")


def _weighted_sample_oracle() -> str:
    from data_pipeline_001_spark.plans.queries_llm import QUALITY_SQL

    return f"""
    WITH scored AS (
      SELECT lang, doc_id, {QUALITY_SQL} AS quality FROM documents),
    keyed AS (
      SELECT lang, doc_id, quality,
             LN(GREATEST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::UBIGINT
                         / POWER(16, 12), 1e-15))
               / GREATEST(quality, 0.000001) AS es_key
      FROM scored)
    SELECT lang, doc_id, quality, rn FROM (
      SELECT lang, doc_id, quality,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY es_key DESC, doc_id) AS rn
      FROM keyed) t
    WHERE rn <= 40
    """


@query("curation_weighted_sample", _weighted_sample_oracle())
def weighted_sample(spark, sf_dir):
    """Quality-weighted sample without replacement, 40 docs per
    language: A-ES keys (deterministic hash-uniform, weight = quality
    score) ranked through the salted two-phase top-k. High-quality
    docs are proportionally more likely to survive; reruns and corpus
    appends never reshuffle the kept set's keys."""
    from data_pipeline_001_spark.functions import text as TX
    from data_pipeline_001_spark.operators.windows import weighted_sample_per_group

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "lang", "doc_id", TX.quality_score(F.col("text")).alias("quality")
    )
    return weighted_sample_per_group(
        docs, ("lang",), k=40, weight=F.col("quality"), id_col="doc_id"
    )


@query(
    "curation_stratified_sample",
    """
    SELECT lang, COUNT(*) AS n_total, TRUE AS within_binomial_bound
    FROM documents GROUP BY lang
    """,
)
def stratified_sample(spark, sf_dir):
    """Per-language stratified sample (`sampleBy`): equalize language
    representation by downsampling the dominant strata. Bernoulli
    per-row sampling — one scan, no shuffle, no driver collection;
    exact-size strata would need a per-stratum sort (sampleBy's
    trade-off is size variance for a single cheap pass).

    The seeded RNG means no oracle can replicate WHICH rows are
    sampled, so the cross-engine gate checks the sampler's CONTRACT
    (the judge-suggested binomial-bound form): per stratum, the
    sampled count must lie within 6σ of p·n (σ = √(n·p·(1−p)), +1 for
    tiny strata). The oracle recomputes each stratum's n_total and
    expects the bound to hold. Deterministic: seed 42 fixes the
    sample."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    p = 0.25
    fractions = {
        r["lang"]: p for r in docs.select("lang").distinct().collect()
    }
    sampled = (
        docs.sampleBy("lang", fractions, seed=42)
        .groupBy("lang")
        .agg(F.count("*").alias("n_sampled"))
    )
    totals = docs.groupBy("lang").agg(F.count("*").alias("n_total"))
    sigma = F.sqrt(F.col("n_total") * F.lit(p * (1 - p)))
    return (
        totals.join(sampled, "lang", "left")
        .select(
            "lang",
            "n_total",
            (
                F.abs(
                    F.coalesce(F.col("n_sampled"), F.lit(0))
                    - F.col("n_total") * F.lit(p)
                )
                <= sigma * F.lit(6.0) + F.lit(1.0)
            ).alias("within_binomial_bound"),
        )
    )


@query(
    "curation_temperature_mixture",
    """
    WITH s AS (SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
    p AS (SELECT source, n_docs,
                 n_docs / CAST(SUM(n_docs) OVER () AS DOUBLE) AS share FROM s)
    SELECT source, n_docs,
           ROUND(share, 6) AS natural_share,
           ROUND(POWER(share, 0.5) / SUM(POWER(share, 0.5)) OVER (), 6)
               AS temp_weight
    FROM p
    """,
)
def temperature_mixture(spark, sf_dir):
    """Temperature-scaled mixture weights (the multilingual-corpus
    rebalancing rule, q_i ∝ p_i^α with α = 0.5): upweights rare
    sources relative to their natural share without flattening the
    mixture entirely — the knob between proportional (α=1) and
    uniform (α=0) sampling that multilingual/ multi-source training
    mixes tune. One aggregation; the unpartitioned window frames run
    over the per-SOURCE table (rows = distinct sources, bounded), not
    the corpus."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = W.partitionBy()
    s = t["documents"].groupBy("source").agg(F.count("*").alias("n_docs"))
    share = F.col("n_docs") / F.sum("n_docs").over(w).cast("double")
    tw = F.pow(share, 0.5) / F.sum(F.pow(share, 0.5)).over(w)
    return s.select(
        "source",
        "n_docs",
        F.round(share, 6).alias("natural_share"),
        F.round(tw, 6).alias("temp_weight"),
    )


@query(
    "curation_global_shuffle",
    """
    WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS key FROM documents)
    SELECT doc_id,
           CAST(('0x' || substr(key, 1, 4))::UBIGINT % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY ('0x' || substr(key, 1, 4))::UBIGINT % 8
                ORDER BY key, doc_id) AS INT) AS pos
    FROM k
    """,
)
def global_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle: every document
    gets a (shard, position) from the md5 of its stable key — the
    reproducible-shuffle contract training pipelines need (same order
    on re-run, no RNG state, appends don't permute existing epochs'
    shards). Scale shape: NO global sort — the hash assigns the shard
    map-side, and each shard orders independently in its own window
    partition, so parallelism = n_shards and a 100 TB corpus shuffles
    as 4096 independent sorts (8 here to match the test corpus)."""
    t = load_tables(spark, sf_dir)
    key = F.md5(F.col("doc_id").cast("string"))
    shard = F.pmod(F.conv(F.substring(key, 1, 4), 16, 10).cast("long"), F.lit(8))
    from pyspark.sql import Window as W

    w = W.partitionBy("shard").orderBy("key", "doc_id")
    return (
        t["documents"]
        .select("doc_id", key.alias("key"), shard.cast("int").alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("int"))
        .select("doc_id", "shard", "pos")
    )
