"""Second wave of training-data curation queries (SURVEY.md §2.13):
benchmark decontamination, incremental corpus dedup, token-length
packing buckets, and TF-IDF salient terms. Registers into the shared
REGISTRY.

All four have exact DuckDB oracles — the n-gram / TF-IDF arithmetic is
integer-and-IEEE-deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

# benchmark membership rule for the decontamination demo: a stable
# pure function of the key, so the split never moves as data accretes
_BENCH_MOD = 29


@query(
    "curation_decontaminate",
    f"""
    WITH t AS (SELECT doc_id,
                      string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    g AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(w) >= 8
                     THEN [array_to_string(w[i:i+7], ' ')
                           for i in range(1, len(w) - 8 + 2)]
                     ELSE [] END) AS grams
          FROM t),
    bench AS (SELECT DISTINCT unnest(grams) AS gram
              FROM g WHERE doc_id % {_BENCH_MOD} = 0),
    train AS (SELECT DISTINCT doc_id, unnest(grams) AS gram
              FROM g WHERE doc_id % {_BENCH_MOD} <> 0),
    hits AS (SELECT t.doc_id, COUNT(*) AS n_hits
             FROM train t JOIN bench b ON t.gram = b.gram
             GROUP BY t.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS INT)
               AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % {_BENCH_MOD} <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
)
def decontaminate_q(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing any word
    8-gram with the (broadcast) benchmark split — the GPT-3/Llama
    eval-hygiene check. Corpus grams never shuffle; only matches do."""
    from data_pipeline_001_spark.operators.text_analysis import decontaminate

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    bench = docs.where(F.col("doc_id") % _BENCH_MOD == 0)
    train = docs.where(F.col("doc_id") % _BENCH_MOD != 0)
    return decontaminate(train, bench, n=8)


@query(
    "dedup_incremental_batch",
    f"""
    WITH fp AS (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents),
    batch AS (SELECT fp, MIN(doc_id) AS keep_id,
                     COUNT(*) AS n_in_batch
              FROM fp WHERE doc_id % 2 = 1 GROUP BY fp)
    SELECT b.fp, b.keep_id, b.n_in_batch
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM fp c
                      WHERE c.doc_id % 2 = 0 AND c.fp = b.fp)
    """,
)
def dedup_incremental_q(spark, sf_dir):
    """Incremental ingest dedup: odd doc_ids play the daily delta,
    even doc_ids the accumulated corpus; admit batch docs that are
    batch-unique AND absent from the corpus (fingerprint anti-join)."""
    from data_pipeline_001_spark.operators.dedup import dedup_incremental

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    return dedup_incremental(
        docs.where(F.col("doc_id") % 2 == 1),
        docs.where(F.col("doc_id") % 2 == 0),
    )


@query(
    "curation_length_buckets",
    f"""
    WITH t AS (SELECT len(string_split({_NORM_SQL}, ' ')) AS n_tokens
               FROM documents),
    b AS (SELECT n_tokens,
                 CAST(GREATEST(16, POWER(2, CEIL(LOG2(GREATEST(n_tokens, 1)))))
                      AS BIGINT) AS bucket
          FROM t)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(SUM(n_tokens) / CAST(COUNT(*) * bucket AS DOUBLE), 6)
               AS fill_ratio
    FROM b
    GROUP BY bucket
    """,
)
def length_buckets_q(spark, sf_dir):
    """Token-length histogram over power-of-two packing buckets with
    the padding efficiency (fill ratio) a packed pretraining batch at
    that context length would achieve — the planning input for
    sequence packing. One scan, one narrow agg."""
    t = load_tables(spark, sf_dir)
    n_tokens = F.size(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
        )
    ).cast("long")
    bucket = F.greatest(
        F.lit(16),
        F.pow(F.lit(2), F.ceil(F.log2(F.greatest(n_tokens, F.lit(1))))),
    ).cast("long")
    return (
        t["documents"]
        .select(bucket.alias("bucket"), n_tokens.alias("n_tokens"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(
                F.sum("n_tokens")
                / (F.count("*") * F.first("bucket")).cast("double"),
                6,
            ).alias("fill_ratio"),
        )
    )


@query(
    "text_tfidf_top_term",
    f"""
    WITH w AS (SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS word
               FROM documents),
    tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM w GROUP BY 1, 2),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (SELECT tf.doc_id, tf.word,
                      tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df) AS score
               FROM tf JOIN df USING (word) CROSS JOIN n)
    SELECT doc_id, word AS top_term, ROUND(score, 6) AS tfidf
    FROM (SELECT doc_id, word, score,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY score DESC, word) AS rn
          FROM scored)
    WHERE rn <= 1
    """,
)
def tfidf_top_term_q(spark, sf_dir):
    """Most-salient term per document by TF-IDF (unsmoothed ln(N/df)).

    Plan: one explode + (doc, word) partial-agg shuffle for TF; the
    word→df table derives from the SAME grouped result (no second
    corpus scan), is orders of magnitude smaller than the corpus, and
    broadcast-joins back; top-1 is a per-doc row_number — partitioned
    window, never global. Word arithmetic is exact-integer into one
    IEEE ln/mul, so Spark and DuckDB agree bit-for-bit."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    words = docs.select(
        "doc_id",
        F.explode(
            F.split(
                F.trim(
                    F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                ),
                " ",
            )
        ).alias("word"),
    )
    tf = words.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = docs.count()  # scalar: one cheap count job on a small projection
    from pyspark.sql import Window

    scored = tf.join(F.broadcast(df), "word").select(
        "doc_id",
        "word",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias(
            "score"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("word")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 1)
        .select(
            "doc_id",
            F.col("word").alias("top_term"),
            F.round("score", 6).alias("tfidf"),
        )
    )


_SUBSTR_K = 40


@query(
    "dedup_substring_spans",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS s FROM documents),
    g AS (SELECT doc_id, i, substr(s, i, {_SUBSTR_K}) AS gram
          FROM (SELECT doc_id, s,
                       unnest(range(1, GREATEST(length(s) - {_SUBSTR_K - 1}, 0) + 1)) AS i
                FROM t)),
    d AS (SELECT gram FROM g GROUP BY gram
          HAVING COUNT(DISTINCT doc_id) >= 2),
    m AS (SELECT g.doc_id, g.i FROM g JOIN d USING (gram)),
    isl AS (SELECT doc_id, i,
                   i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
            FROM m)
    SELECT doc_id,
           CAST(MIN(i) AS BIGINT) AS span_start,
           CAST(MAX(i) - MIN(i) + {_SUBSTR_K} AS BIGINT) AS span_len,
           CAST(COUNT(*) AS BIGINT) AS n_windows
    FROM isl GROUP BY doc_id, grp
    """,
)
def substring_spans_q(spark, sf_dir):
    """ExactSubstr dedup (Lee et al. 2022): maximal spans whose every
    40-char window appears verbatim in another document. Hash-first /
    verify-late — the oracle computes the same spans directly from
    substrings; the engine's Rabin-Karp + exact-verify route must
    agree exactly (collisions are verified away)."""
    from data_pipeline_001_spark.operators.text_analysis import (
        duplicated_substring_spans,
    )

    t = load_tables(spark, sf_dir)
    return duplicated_substring_spans(t["documents"], k=_SUBSTR_K)


@query(
    "profile_join_key_skew",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events
               WHERE user_id IS NOT NULL GROUP BY user_id),
    s AS (SELECT SUM(cnt) AS total, AVG(cnt) AS mean_cnt,
                 MAX(cnt) AS max_cnt, COUNT(*) AS n_keys FROM c)
    SELECT r.user_id, r.cnt, r.rk AS rank,
           ROUND(r.cnt / s.mean_cnt, 6) AS skew_factor,
           ROUND(r.cnt / CAST(s.total AS DOUBLE), 6) AS share
    FROM (SELECT user_id, cnt,
                 CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS BIGINT) AS rk
          FROM c) r CROSS JOIN s
    WHERE r.rk <= 20
    """,
)
def key_skew_q(spark, sf_dir):
    """Join-key skew profiler: top-20 hottest keys with their share of
    rows and skew factor vs the mean key. The pre-flight diagnostic
    that decides between a plain shuffle join, AQE skew-join, and
    explicit salting at 100 TB. One narrow agg + a 20-row top-k
    (TakeOrderedAndProject) + broadcast scalar join."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    c = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
    )
    s = c.agg(
        F.sum("cnt").alias("total"),
        F.avg("cnt").alias("mean_cnt"),
    )
    ranked = c.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("user_id")))
        .cast("long"),
    ).where(F.col("rank") <= 20)
    return ranked.crossJoin(F.broadcast(s)).select(
        "user_id",
        "cnt",
        "rank",
        F.round(F.col("cnt") / F.col("mean_cnt"), 6).alias("skew_factor"),
        F.round(F.col("cnt") / F.col("total").cast("double"), 6).alias("share"),
    )
