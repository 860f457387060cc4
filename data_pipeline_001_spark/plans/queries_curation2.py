"""Second wave of training-data curation queries (SURVEY.md §2.13):
benchmark decontamination, incremental corpus dedup, token-length
packing buckets, TF-IDF salient terms, ExactSubstr span dedup,
join-key skew profiling, dense-spine resample with forward-fill,
domain-mixture rebalancing, the Deequ-style quality-constraint
report, the training-export shard plan, and the Z-order layout
histogram. Registers into the shared REGISTRY.

Every query here has an exact DuckDB oracle — the n-gram / TF-IDF /
Morton arithmetic is integer-and-IEEE-deterministic on both engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

# explicit class: RE2 \s omits U+000B, Java \s includes it (see
# queries_llm._NORM_SQL)
_NORM_SQL = "trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"


def _norm_tokens():
    """Whitespace token count of the normalized text (bigint column) —
    the Spark twin of ``len(string_split(_NORM_SQL, ' '))``."""
    return F.size(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
        )
    ).cast("long")

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
    n_tokens = _norm_tokens()
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


@query(
    "time_resample_ffill",
    """
    WITH obs AS (SELECT date_trunc('hour', ts) AS obs_hour,
                        ROUND(SUM(value), 6) AS hourly_value
                 FROM events GROUP BY 1),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
                 date_trunc('hour', MAX(ts)) AS h1 FROM events),
    spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
              FROM b)
    SELECT s.hour, o.hourly_value AS last_value,
           o.obs_hour AS last_obs_hour,
           CAST(date_diff('hour', o.obs_hour, s.hour) AS BIGINT)
               AS hours_since_obs
    FROM spine s ASOF LEFT JOIN obs o ON s.hour >= o.obs_hour
    """,
)
def resample_ffill_q(spark, sf_dir):
    """Time-series resample to a dense hourly spine with forward-fill:
    silent hours inherit the latest observed hourly value, plus a
    staleness counter — the standard gauge-metric densification.
    Rides the bucketed as-of join (operators/relational.asof_join), so
    the fill is a partitioned window with boundary carry, never a
    global single-task sort."""
    from data_pipeline_001_spark.operators.relational import asof_join

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    obs = ev.groupBy(
        F.date_trunc("hour", "ts").alias("obs_hour")
    ).agg(F.round(F.sum("value"), 6).alias("hourly_value"))
    spine = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    ).select(
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("hour")
    )
    out = asof_join(spine, obs, left_time="hour", right_time="obs_hour")
    return out.select(
        "hour",
        F.col("hourly_value").alias("last_value"),
        F.col("asof_time").alias("last_obs_hour"),
        (
            (F.unix_timestamp("hour") - F.unix_timestamp("asof_time"))
            / 3600
        )
        .cast("long")
        .alias("hours_since_obs"),
    )


@query(
    "curation_domain_mixture",
    f"""
    WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(len(string_split({_NORM_SQL}, ' '))) AS BIGINT)
                          AS tokens
               FROM documents GROUP BY source),
    tot AS (SELECT SUM(tokens) AS total, MIN(tokens) AS min_tokens FROM s)
    SELECT s.source, s.n_docs, s.tokens,
           ROUND(s.tokens / CAST(tot.total AS DOUBLE), 6) AS natural_share,
           ROUND(tot.min_tokens / CAST(s.tokens AS DOUBLE), 6) AS sampling_rate,
           CAST(tot.min_tokens AS BIGINT) AS expected_tokens
    FROM s CROSS JOIN tot
    """,
)
def domain_mixture_q(spark, sf_dir):
    """Domain-mixture rebalancing plan: per-source token counts and
    the downsampling rate that equalizes every source's contribution
    (rate = min_source_tokens / source_tokens — the largest equal
    mixture achievable without upsampling). The knob sheet a
    pretraining data recipe starts from. One narrow agg + a broadcast
    scalar join."""
    t = load_tables(spark, sf_dir)
    tokens = F.size(
        F.split(
            F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
        )
    ).cast("long")
    s = (
        t["documents"]
        .select("source", tokens.alias("tok"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("tok").alias("tokens"))
    )
    tot = s.agg(
        F.sum("tokens").alias("total"), F.min("tokens").alias("min_tokens")
    )
    return s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens",
        F.round(F.col("tokens") / F.col("total").cast("double"), 6).alias(
            "natural_share"
        ),
        F.round(
            F.col("min_tokens") / F.col("tokens").cast("double"), 6
        ).alias("sampling_rate"),
        F.col("min_tokens").cast("long").alias("expected_tokens"),
    )


@query(
    "quality_constraint_report",
    """
    WITH obs AS (
      SELECT ROUND(AVG(CASE WHEN o_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END), 6)
                 AS completeness_custkey,
             ROUND(COUNT(DISTINCT o_orderkey) / CAST(COUNT(*) AS DOUBLE), 6)
                 AS uniqueness_orderkey,
             ROUND(AVG(o_totalprice), 6) AS avg_totalprice,
             ROUND(MIN(o_totalprice), 6) AS min_totalprice
      FROM orders),
    fk AS (
      SELECT ROUND(1.0 - (SELECT COUNT(*) FROM lineitem l
                          WHERE l.l_orderkey IS NOT NULL
                            AND NOT EXISTS (SELECT 1 FROM orders o
                                            WHERE o.o_orderkey = l.l_orderkey))
                       / CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE), 6)
                 AS frac),
    rep AS (
      SELECT 'completeness_custkey' AS check_name, completeness_custkey AS observed,
             1.0 AS lo, 1.0 AS hi FROM obs
      UNION ALL
      SELECT 'uniqueness_orderkey', uniqueness_orderkey, 1.0, 1.0 FROM obs
      UNION ALL
      SELECT 'avg_totalprice', avg_totalprice, 1000.0, 500000.0 FROM obs
      UNION ALL
      SELECT 'min_totalprice', min_totalprice, 0.0, 100000.0 FROM obs
      UNION ALL
      SELECT 'fk_l_orderkey_in_o_orderkey', frac, 1.0, 1.0 FROM fk)
    SELECT check_name, observed, lo, hi,
           CAST(CASE WHEN observed >= lo AND observed <= hi THEN 1 ELSE 0 END
                AS INT) AS passed
    FROM rep
    """,
)
def constraint_report_q(spark, sf_dir):
    """Deequ-style declarative quality gate: four single-scan
    constraints over orders (all aggregates fused into ONE pass) plus
    a referential-integrity check lineitem→orders (anti-join count),
    unioned into one report. The engine's generalization of the
    reference's count-audit stage (SURVEY §2.12 R3)."""
    from data_pipeline_001_spark.operators.constraints import (
        Constraint,
        check_constraints,
        completeness,
        referential_integrity,
        uniqueness,
    )

    t = load_tables(spark, sf_dir)
    orders = t["orders"]
    report = check_constraints(
        orders,
        [
            Constraint("completeness_custkey", completeness("o_custkey"), 1.0, 1.0),
            Constraint("uniqueness_orderkey", uniqueness("o_orderkey"), 1.0, 1.0),
            Constraint("avg_totalprice", F.avg("o_totalprice"), 1000.0, 500000.0),
            Constraint("min_totalprice", F.min("o_totalprice"), 0.0, 100000.0),
        ],
    )
    fk = referential_integrity(t["lineitem"], "l_orderkey", orders, "o_orderkey")
    return report.unionByName(fk)


_N_SHARDS = 16


@query(
    "curation_shard_plan",
    f"""
    WITH t AS (SELECT doc_id,
                      len(string_split({_NORM_SQL}, ' ')) AS n_tokens,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                           % {_N_SHARDS} AS INT) AS shard
               FROM documents)
    SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
           ROUND(SUM(n_tokens) / (SELECT SUM(n_tokens) FROM t) * {_N_SHARDS}, 6)
               AS balance_factor
    FROM t GROUP BY shard
    """,
)
def shard_plan_q(spark, sf_dir):
    """Training-export shard plan: md5-hash assignment of documents to
    {n} shards with per-shard token totals and a balance factor
    (1.0 = perfectly even). Hash sharding is append-stable — a grown
    corpus never moves an existing doc between shards — and the
    balance report is the check that no shard becomes the slow reader
    at training time. One scan, one narrow agg, broadcast total."""
    t = load_tables(spark, sf_dir)
    n_tokens = _norm_tokens()
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _N_SHARDS
    ).cast("int")
    base = t["documents"].select(
        shard.alias("shard"), n_tokens.alias("n_tokens")
    )
    per = base.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("shard_tokens")
    )
    tot = per.agg(F.sum("shard_tokens").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "shard",
        "n_docs",
        "shard_tokens",
        F.round(
            F.col("shard_tokens") / F.col("total") * _N_SHARDS, 6
        ).alias("balance_factor"),
    )


def _zvalue_sql(a: str, b: str, bits: int = 8) -> str:
    terms = []
    for j in range(bits):
        terms.append(f"((({a} >> {j}) & 1) * {1 << (2 * j + 1)})")
        terms.append(f"((({b} >> {j}) & 1) * {1 << (2 * j)})")
    return " + ".join(terms)


@query(
    "layout_zorder_events",
    f"""
    WITH t AS (SELECT event_id,
                      user_id % 256 AS a,
                      CAST(EXTRACT(hour FROM ts) AS BIGINT) AS b
               FROM events WHERE user_id IS NOT NULL)
    SELECT CAST({_zvalue_sql('a', 'b')} AS BIGINT) // 4096 AS z_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(a) AS BIGINT) AS min_user_bucket,
           CAST(MAX(a) AS BIGINT) AS max_user_bucket,
           CAST(MIN(b) AS BIGINT) AS min_hour,
           CAST(MAX(b) AS BIGINT) AS max_hour
    FROM t GROUP BY 1
    """,
)
def zorder_events_q(spark, sf_dir):
    """Z-curve layout histogram: events bucketed by their Morton
    z-value over (user bucket, hour-of-day). The per-z-bucket min/max
    columns ARE the demonstration — every bucket's bounding box in
    (user, hour) space is tight, which is exactly why a z-ordered file
    layout lets parquet row-group stats prune on BOTH dimensions.
    Pure shift/mask integer arithmetic, identical in the oracle."""
    from data_pipeline_001_spark.operators.relational import zvalue

    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    a = (F.col("user_id") % 256).cast("long")
    b = F.hour("ts").cast("long")
    return (
        ev.select(
            (zvalue(a, b) / 4096).cast("long").alias("z_bucket"),
            a.alias("a"),
            b.alias("b"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_events"),
            F.min("a").alias("min_user_bucket"),
            F.max("a").alias("max_user_bucket"),
            F.min("b").alias("min_hour"),
            F.max("b").alias("max_hour"),
        )
    )


@query(
    "text_lm_perplexity",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    bg AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2
           FROM (SELECT doc_id, w, unnest(range(1, GREATEST(len(w) - 1, 0) + 1)) AS i
                 FROM t)),
    c2 AS (SELECT w1, w2, COUNT(*) AS n2 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, SUM(n2) AS n1 FROM c2 GROUP BY 1),
    v AS (SELECT COUNT(DISTINCT word) AS vocab
          FROM (SELECT unnest(w) AS word FROM t)),
    scored AS (
      SELECT bg.doc_id,
             -LN((c2.n2 + 1.0) / (c1.n1 + v.vocab)) AS nll
      FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(nll), 6) AS cross_entropy,
           ROUND(EXP(AVG(nll)), 4) AS perplexity
    FROM scored GROUP BY doc_id
    """,
)
def lm_perplexity_q(spark, sf_dir):
    """Corpus-LM perplexity per document (CCNet-style quality signal):
    an add-one-smoothed bigram model is trained on the corpus itself
    in two narrow aggregations, then every document is scored by the
    mean negative log-likelihood of its bigrams. Outlier-high
    perplexity = gibberish/boilerplate; outlier-low = repeated spam.

    Plan: ONE token explode feeds doc bigrams; the bigram and context
    count tables join back onto the corpus on their natural keys
    ((w1,w2) then w1) with NO explicit broadcast hint — at test scale
    AQE promotes them to broadcast from runtime stats, while on a
    100 TB corpus (distinct-bigram table in the tens of GB) the same
    plan stays a shuffle join instead of OOMing the driver. The
    per-doc score is a partial-agg groupBy. No UDFs anywhere — the LN
    arithmetic is IEEE-identical in the DuckDB oracle (AVG rounded to
    absorb summation order)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")), " "
    )
    words = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "w1")
    )
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        words.withColumn("w2", F.lead("w1").over(wdoc))
        .where(F.col("w2").isNotNull())
        .select("doc_id", "w1", "w2")
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n2"))
    c1 = c2.groupBy("w1").agg(F.sum("n2").alias("n1"))
    vocab = words.select("w1").distinct().count()  # scalar: one count job
    nll = -F.log(
        (F.col("n2") + F.lit(1.0)) / (F.col("n1") + F.lit(float(vocab)))
    )
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .select("doc_id", nll.alias("nll"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("cross_entropy"),
            F.round(F.exp(F.avg("nll")), 4).alias("perplexity"),
        )
    )


@query(
    "dedup_substring_coverage",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS s FROM documents),
    g AS (SELECT doc_id, i, substr(s, i, {_SUBSTR_K}) AS gram
          FROM (SELECT doc_id, s,
                       unnest(range(1, GREATEST(length(s) - {_SUBSTR_K - 1}, 0) + 1)) AS i
                FROM t)),
    d AS (SELECT gram FROM g GROUP BY gram
          HAVING MIN(doc_id) <> MAX(doc_id)),
    m AS (SELECT g.doc_id, g.i FROM g JOIN d USING (gram)),
    isl AS (SELECT doc_id, i,
                   i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS grp
            FROM m),
    spans AS (SELECT doc_id, MAX(i) - MIN(i) + {_SUBSTR_K} AS span_len
              FROM isl GROUP BY doc_id, grp),
    cov AS (SELECT doc_id, SUM(span_len) AS dup_chars
            FROM spans GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(LENGTH(t.s) AS BIGINT) AS n_chars,
           CAST(COALESCE(c.dup_chars, 0) AS BIGINT) AS dup_chars,
           ROUND(COALESCE(c.dup_chars, 0) / CAST(GREATEST(LENGTH(t.s), 1) AS DOUBLE), 6)
               AS dup_ratio,
           CAST(CASE WHEN COALESCE(c.dup_chars, 0)
                          / CAST(GREATEST(LENGTH(t.s), 1) AS DOUBLE) > 0.5
                     THEN 1 ELSE 0 END AS INT) AS drop_flag
    FROM t LEFT JOIN cov c ON t.doc_id = c.doc_id
    """,
)
def substring_coverage_q(spark, sf_dir):
    """The ExactSubstr DECISION layer: per-document duplicated-span
    coverage ratio and the standard drop rule (>50% of normalized
    chars inside spans shared verbatim with other docs). Composes
    duplicated_substring_spans with one per-doc rollup + a left join
    back to the corpus — maximal spans never overlap (islands are
    disjoint by construction), so summing span lengths IS the covered
    char count."""
    from data_pipeline_001_spark.operators.text_analysis import (
        duplicated_substring_spans,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    spans = duplicated_substring_spans(docs, k=_SUBSTR_K)
    cov = spans.groupBy("doc_id").agg(F.sum("span_len").alias("dup_chars"))
    n_chars = F.length(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    ).cast("long")
    base = docs.select("doc_id", n_chars.alias("n_chars"))
    dup = F.coalesce(F.col("dup_chars"), F.lit(0)).cast("long")
    ratio = dup / F.greatest(F.col("n_chars"), F.lit(1)).cast("double")
    return base.join(cov, "doc_id", "left").select(
        "doc_id",
        "n_chars",
        dup.alias("dup_chars"),
        F.round(ratio, 6).alias("dup_ratio"),
        F.when(ratio > 0.5, 1).otherwise(0).cast("int").alias("drop_flag"),
    )
