"""Third wave of training-data curation queries (SURVEY.md §2.13):
Gopher-style rule-based quality gating, per-source quota capping,
train/holdout contamination (split leakage), SCD1 merge-upsert,
fastText-style hashed linear classifier scoring, and a fuzzy
edit-distance self-join with deletion-neighborhood blocking.

Every query here has an exact DuckDB oracle: the rule arithmetic is
integer/IEEE-deterministic, the classifier uses integer hash-bucket
weights summed exactly before one float division, and the fuzzy join
is blocked-but-exact (the oracle may brute-force what the engine
blocks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.plans.queries_curation2 import _NORM_SQL
from data_pipeline_001_spark.session import load_tables


def _words():
    from data_pipeline_001_spark.functions.text import normalize_text

    return F.split(normalize_text(F.col("text")), " ")


# ---------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, appendix A1.1 — public)
# ---------------------------------------------------------------------

_MIN_WORDS, _MAX_WORDS = 25, 100_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MIN_STOP = 2
_MIN_ALPHA = 0.8
_STOPWORDS = ("the", "a", "of", "to", "and", "in")


@query(
    "quality_gopher_rules",
    f"""
    WITH t AS (SELECT doc_id,
                      string_split({_NORM_SQL}, ' ') AS w,
                      len(string_split({_NORM_SQL}, ' ')) AS n_words,
                      length({_NORM_SQL}) AS n_chars
               FROM documents),
    m AS (SELECT doc_id, n_words,
                 ROUND((n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE), 6)
                     AS mean_word_len,
                 CAST(len(list_filter(w, x -> x IN {_STOPWORDS!r})) AS BIGINT)
                     AS n_stop,
                 ROUND(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                       / CAST(n_words AS DOUBLE), 6) AS alpha_frac
          FROM t)
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
           n_stop, alpha_frac,
           CAST(CASE WHEN n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
                THEN 1 ELSE 0 END AS INT) AS f_words,
           CAST(CASE WHEN mean_word_len BETWEEN {_MIN_MWL} AND {_MAX_MWL}
                THEN 1 ELSE 0 END AS INT) AS f_mwl,
           CAST(CASE WHEN n_stop >= {_MIN_STOP} THEN 1 ELSE 0 END AS INT)
               AS f_stop,
           CAST(CASE WHEN alpha_frac >= {_MIN_ALPHA} THEN 1 ELSE 0 END AS INT)
               AS f_alpha,
           CAST(CASE WHEN n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
                      AND mean_word_len BETWEEN {_MIN_MWL} AND {_MAX_MWL}
                      AND n_stop >= {_MIN_STOP}
                      AND alpha_frac >= {_MIN_ALPHA}
                THEN 1 ELSE 0 END AS INT) AS passes
    FROM m
    """,
)
def gopher_rules_q(spark, sf_dir):
    """Rule-based quality gate per Gopher's document filters (word
    count bounds, mean word length bounds, stop-word presence,
    alphabetic-word fraction) with a per-rule flag and the conjunction.
    All JVM-side array/HOF expressions over one scan — the mean word
    length needs no per-word pass at all: on single-space-normalized
    text it is (chars - (words-1)) / words exactly."""
    t = load_tables(spark, sf_dir)
    w = _words()
    n_words = F.size(w).cast("long")
    from data_pipeline_001_spark.functions.text import normalize_text

    mwl = F.round(
        (F.length(normalize_text(F.col("text"))) - (n_words - 1))
        / n_words.cast("double"),
        6,
    )
    n_stop = F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS))).cast("long")
    alpha = F.round(
        F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n_words.cast("double"),
        6,
    )
    m = t["documents"].select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        n_stop.alias("n_stop"),
        alpha.alias("alpha_frac"),
    )
    f_words = F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
    f_mwl = F.col("mean_word_len").between(_MIN_MWL, _MAX_MWL)
    f_stop = F.col("n_stop") >= _MIN_STOP
    f_alpha = F.col("alpha_frac") >= _MIN_ALPHA
    as_int = lambda c: c.cast("int")  # noqa: E731
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "n_stop",
        "alpha_frac",
        as_int(f_words).alias("f_words"),
        as_int(f_mwl).alias("f_mwl"),
        as_int(f_stop).alias("f_stop"),
        as_int(f_alpha).alias("f_alpha"),
        as_int(f_words & f_mwl & f_stop & f_alpha).alias("passes"),
    )


# ---------------------------------------------------------------------
# Per-source quota capping
# ---------------------------------------------------------------------

_QUOTA = 50


@query(
    "curation_source_quota",
    f"""
    WITH r AS (SELECT doc_id, source,
                      ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY n_chars DESC, doc_id) AS rk
               FROM documents)
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {_QUOTA}
    """,
)
def source_quota_q(spark, sf_dir):
    """Per-source quota cap: keep the top-{quota} docs per source by
    length (ties broken by doc_id) — the anti-over-representation
    step a web-corpus mix applies per domain. One window shuffle on
    ``source``; for heavy-tailed domain distributions the salted
    two-phase top-k twin (operators/windows.py topk_per_key_salted)
    is the drop-in replacement, same contract."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        t["documents"]
        .select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _QUOTA)
        .select("doc_id", "source", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------
# Train/holdout split leakage (n-gram containment across the split)
# ---------------------------------------------------------------------

_LEAK_MOD = 10  # holdout = doc_id % 10 == 0
_LEAK_N = 8
_LEAK_THRESHOLD = 0.5


@query(
    "curation_split_leakage",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    g AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(w) >= {_LEAK_N}
                     THEN [array_to_string(w[i:i+{_LEAK_N - 1}], ' ')
                           for i in range(1, len(w) - {_LEAK_N} + 2)]
                     ELSE [] END) AS grams
          FROM t),
    hold AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
             FROM g WHERE doc_id % {_LEAK_MOD} = 0),
    train AS (SELECT DISTINCT unnest(grams) AS gram
              FROM g WHERE doc_id % {_LEAK_MOD} <> 0),
    hits AS (SELECT h.doc_id, COUNT(*) AS n_hit
             FROM hold h JOIN train t ON h.gram = t.gram
             GROUP BY h.doc_id)
    SELECT d.doc_id,
           CAST(len(d.grams) AS BIGINT) AS n_grams,
           CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
           ROUND(COALESCE(h.n_hit, 0)
                 / CAST(GREATEST(len(d.grams), 1) AS DOUBLE), 6)
               AS containment,
           CAST(CASE WHEN COALESCE(h.n_hit, 0)
                          >= {_LEAK_THRESHOLD} * len(d.grams)
                      AND len(d.grams) > 0
                THEN 1 ELSE 0 END AS INT) AS leaked
    FROM g d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % {_LEAK_MOD} = 0
    """,
)
def split_leakage_q(spark, sf_dir):
    """Split-leakage detector: for every HOLDOUT document, the
    fraction of its distinct word {n}-grams that also occur anywhere
    in the TRAIN split (containment), and a leaked flag at ≥ 50 % —
    the eval-hygiene check decontamination does for external
    benchmarks, applied to the pipeline's own split.

    Scale shape: the holdout side is the small one (here 10 %, in
    practice <1 %), so its distinct (doc, gram) set is the broadcast
    side; train grams stream map-side through the join with no
    corpus-side shuffle, and only matches shuffle into the per-doc
    count (count_distinct dedupes the train-side multiplicity)."""
    from data_pipeline_001_spark.operators.text_analysis import (
        exploded_word_ngrams,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    hold = docs.where(F.col("doc_id") % _LEAK_MOD == 0)
    train = docs.where(F.col("doc_id") % _LEAK_MOD != 0)

    hold_grams = exploded_word_ngrams(hold, n=_LEAK_N).distinct()
    # the train side contributes ONLY its gram column — after the join
    # the surviving doc_id is unambiguously the holdout one, and
    # count_distinct absorbs the train-side multiplicity
    hits = (
        exploded_word_ngrams(train, n=_LEAK_N)
        .select("gram")
        .join(F.broadcast(hold_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_hit"))
    )
    per_doc = (
        hold.select("doc_id")
        .join(
            hold_grams.groupBy("doc_id").agg(F.count("*").alias("n_grams")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        )
    )
    return (
        per_doc.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0))
                / F.greatest(F.col("n_grams"), F.lit(1)).cast("double"),
                6,
            ).alias("containment"),
            (
                (
                    F.coalesce(F.col("n_hit"), F.lit(0))
                    >= _LEAK_THRESHOLD * F.col("n_grams")
                )
                & (F.col("n_grams") > 0)
            )
            .cast("int")
            .alias("leaked"),
        )
    )


# ---------------------------------------------------------------------
# SCD1 merge upsert
# ---------------------------------------------------------------------


@query(
    "merge_scd1_upsert",
    """
    WITH src AS (
        SELECT c_custkey, c_acctbal + 100 AS c_acctbal, 'update' AS src
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey + 10000000, 0.0, 'insert'
        FROM customer WHERE c_custkey % 97 = 0),
    tgt AS (SELECT c_custkey, c_acctbal, 'target' AS src FROM customer),
    u AS (SELECT *, 0 AS pri FROM src
          UNION ALL SELECT *, 1 AS pri FROM tgt),
    r AS (SELECT c_custkey, c_acctbal, src,
                 ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY pri)
                     AS rn
          FROM u)
    SELECT c_custkey, c_acctbal, src FROM r WHERE rn = 1
    """,
)
def merge_upsert_q(spark, sf_dir):
    """SCD1 MERGE INTO: a deterministic update/insert batch (every
    7th key updated, every 97th key re-inserted under a new key)
    merged into the customer table; source wins on collision,
    everything else passes through. One hash shuffle on the merge key
    — see operators/relational.merge_upsert for the copy-on-write
    framing at table scale."""
    from data_pipeline_001_spark.operators.relational import merge_upsert

    t = load_tables(spark, sf_dir)
    cust = t["customer"]
    target = cust.select("c_custkey", "c_acctbal", F.lit("target").alias("src"))
    updates = (
        cust.where(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            (F.col("c_acctbal") + 100).alias("c_acctbal"),
            F.lit("update").alias("src"),
        )
    )
    inserts = (
        cust.where(F.col("c_custkey") % 97 == 0)
        .select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            F.lit(0.0).alias("c_acctbal"),
            F.lit("insert").alias("src"),
        )
    )
    return merge_upsert(target, updates.unionByName(inserts), ["c_custkey"])


# ---------------------------------------------------------------------
# fastText-style hashed linear classifier scoring
# ---------------------------------------------------------------------

_CLS_BUCKETS = 4096
_CLS_MIX = 2654435761  # Knuth multiplicative-hash constant (public)
_CLS_MOD = 1000003


@query(
    "text_classifier_score",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    s AS (SELECT doc_id, len(w) AS n,
                 CAST(list_sum(list_transform(w, x ->
                      CAST(('0x' || substr(md5(x), 1, 8))::UBIGINT
                           % {_CLS_BUCKETS} AS BIGINT)
                      * {_CLS_MIX} % {_CLS_MOD})) AS BIGINT) AS wsum
          FROM t)
    SELECT doc_id,
           ROUND(1.0 / (1.0 + exp(-4.0
               * (wsum / {_CLS_MOD}.0 / n - 0.5))), 6) AS score,
           CAST(CASE WHEN 1.0 / (1.0 + exp(-4.0
               * (wsum / {_CLS_MOD}.0 / n - 0.5))) >= 0.5
                THEN 1 ELSE 0 END AS INT) AS label
    FROM s WHERE n > 0
    """,
)
def classifier_score_q(spark, sf_dir):
    """fastText-style quality classifier scoring: each token hashes
    into one of {buckets} weight buckets (md5-prefix), the bucket's
    weight is a fixed multiplicative-hash pseudo-weight, and the doc
    score is a sigmoid over the mean token weight — the exact
    execution shape of a trained hashed linear model (CCNet / GPT-3
    quality filters), with deterministic weights standing in for
    learned ones so the oracle can check bit-for-bit.

    Integer weights are summed EXACTLY (one BIGINT aggregate per doc,
    order-free); the only float math is a single division + sigmoid,
    identical expression on both engines. JVM HOF transform/aggregate
    over one scan, no shuffle at all."""
    t = load_tables(spark, sf_dir)
    w = _words()
    bucket = lambda x: (  # noqa: E731
        F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long") % _CLS_BUCKETS
    )
    weights = F.transform(w, lambda x: bucket(x) * _CLS_MIX % _CLS_MOD)
    wsum = F.aggregate(
        weights, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    n = F.size(w)
    base = t["documents"].select(
        "doc_id", wsum.alias("wsum"), n.alias("n")
    ).where(F.col("n") > 0)
    margin = (
        F.col("wsum") / F.lit(float(_CLS_MOD)) / F.col("n") - 0.5
    ) * 4.0
    score = 1.0 / (1.0 + F.exp(-margin))
    return base.select(
        "doc_id",
        F.round(score, 6).alias("score"),
        (score >= 0.5).cast("int").alias("label"),
    )


# ---------------------------------------------------------------------
# Fuzzy edit-distance self-join (deletion-neighborhood blocking)
# ---------------------------------------------------------------------


@query(
    "join_fuzzy_editdist1",
    """
    SELECT a.c_name AS name_a, b.c_name AS name_b, CAST(1 AS INT) AS dist
    FROM customer a JOIN customer b
      ON a.c_name < b.c_name
     AND abs(length(a.c_name) - length(b.c_name)) <= 1
     AND levenshtein(a.c_name, b.c_name) = 1
    """,
)
def fuzzy_editdist_q(spark, sf_dir):
    """Fuzzy self-join: all customer-name pairs at Levenshtein
    distance exactly 1, found via deletion-neighborhood blocking
    (O(n·L) candidates, one equi-join) instead of the O(n²)
    levenshtein cross join the oracle brute-forces. Exact for k = 1
    by construction — see operators/fuzzy_join.py."""
    from data_pipeline_001_spark.operators.fuzzy_join import editdist1_pairs

    t = load_tables(spark, sf_dir)
    return editdist1_pairs(t["customer"], "c_name")


# ---------------------------------------------------------------------
# Winsorization (percentile outlier clipping)
# ---------------------------------------------------------------------


@query(
    "quality_winsorize_values",
    """
    WITH s AS (SELECT event_type,
                      quantile_cont(value, 0.01) AS p01,
                      quantile_cont(value, 0.99) AS p99
               FROM events WHERE value IS NOT NULL GROUP BY event_type)
    SELECT e.event_type,
           ROUND(s.p01, 6) AS p01,
           ROUND(s.p99, 6) AS p99,
           ROUND(AVG(e.value), 6) AS avg_raw,
           ROUND(AVG(LEAST(GREATEST(e.value, s.p01), s.p99)), 6)
               AS avg_clipped,
           CAST(SUM(CASE WHEN e.value < s.p01 OR e.value > s.p99
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped
    FROM events e JOIN s USING (event_type)
    WHERE e.value IS NOT NULL
    GROUP BY e.event_type, s.p01, s.p99
    """,
)
def winsorize_q(spark, sf_dir):
    """Winsorization: clip each event's value to its type's [p01, p99]
    band and report the mean shift + clip count — the numeric-feature
    outlier guard before training-statistics jobs. Exact percentiles
    here (same function the oracle uses); percentile_approx is the
    drop-in at 100 TB. The tiny per-type stats frame broadcasts back
    onto the fact scan, so the data side shuffles once (final agg)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("value").isNotNull())
    stats = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.01)").alias("p01"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type", "p01", "p99")
        .agg(
            F.round(F.avg("value"), 6).alias("avg_raw"),
            F.round(F.avg(clipped), 6).alias("avg_clipped"),
            F.sum(
                ((F.col("value") < F.col("p01")) | (F.col("value") > F.col("p99")))
                .cast("long")
            ).alias("n_clipped"),
        )
        .select(
            "event_type",
            F.round("p01", 6).alias("p01"),
            F.round("p99", 6).alias("p99"),
            "avg_raw",
            "avg_clipped",
            "n_clipped",
        )
    )


# ---------------------------------------------------------------------
# Composite filter decision (the full curation funnel, attributed)
# ---------------------------------------------------------------------


@query(
    "curation_filter_decision",
    f"""
    WITH base AS (SELECT doc_id,
                         md5({_NORM_SQL}) AS fp,
                         string_split({_NORM_SQL}, ' ') AS w,
                         len(string_split({_NORM_SQL}, ' ')) AS n_words,
                         length({_NORM_SQL}) AS n_chars
                  FROM documents),
    m AS (SELECT doc_id, n_words,
                 ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS fp_rn,
                 (n_chars - (n_words - 1)) / CAST(n_words AS DOUBLE)
                     AS mean_word_len,
                 len(list_filter(w, x -> x IN {_STOPWORDS!r})) AS n_stop,
                 len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                     / CAST(n_words AS DOUBLE) AS alpha_frac,
                 CAST(list_sum(list_transform(w, x ->
                      CAST(('0x' || substr(md5(x), 1, 8))::UBIGINT
                           % {_CLS_BUCKETS} AS BIGINT)
                      * {_CLS_MIX} % {_CLS_MOD})) AS BIGINT) AS wsum
          FROM base),
    d AS (SELECT doc_id,
                 CASE
                   WHEN fp_rn > 1 THEN 'duplicate'
                   WHEN NOT (n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
                             AND mean_word_len BETWEEN {_MIN_MWL} AND {_MAX_MWL}
                             AND n_stop >= {_MIN_STOP}
                             AND alpha_frac >= {_MIN_ALPHA})
                        THEN 'quality_rules'
                   WHEN 1.0 / (1.0 + exp(-4.0
                        * (wsum / {_CLS_MOD}.0 / n_words - 0.5))) < 0.5
                        THEN 'classifier'
                   ELSE 'ok'
                 END AS reason
          FROM m)
    SELECT doc_id, reason,
           CAST(CASE WHEN reason = 'ok' THEN 1 ELSE 0 END AS INT) AS keep
    FROM d
    """,
)
def filter_decision_q(spark, sf_dir):
    """The full curation funnel as ONE attributed decision per
    document — exact-dup check, Gopher rule conjunction, classifier
    threshold, applied in pipeline order with the FIRST failing stage
    recorded as the drop reason (the funnel-attrition accounting a
    FineWeb/RefinedWeb-style recipe reports). One scan + one
    fingerprint window shuffle; every rule expression is shared with
    its standalone query, so the stage oracles and this composite
    oracle cross-check each other."""
    from pyspark.sql import Window

    from data_pipeline_001_spark.functions.text import (
        fingerprint,
        normalize_text,
    )

    t = load_tables(spark, sf_dir)
    w = _words()
    n_words = F.size(w).cast("long")
    mwl = (
        F.length(normalize_text(F.col("text"))) - (n_words - 1)
    ) / n_words.cast("double")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*_STOPWORDS)))
    alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]"))) / n_words.cast(
        "double"
    )
    bucket = lambda x: (  # noqa: E731
        F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long") % _CLS_BUCKETS
    )
    wsum = F.aggregate(
        F.transform(w, lambda x: bucket(x) * _CLS_MIX % _CLS_MOD),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    base = t["documents"].select(
        "doc_id",
        fingerprint(F.col("text")).alias("fp"),
        n_words.alias("n_words"),
        mwl.alias("mean_word_len"),
        n_stop.alias("n_stop"),
        alpha.alias("alpha_frac"),
        wsum.alias("wsum"),
    )
    fp_rn = F.row_number().over(
        Window.partitionBy("fp").orderBy("doc_id")
    )
    gopher_ok = (
        F.col("n_words").between(_MIN_WORDS, _MAX_WORDS)
        & F.col("mean_word_len").between(_MIN_MWL, _MAX_MWL)
        & (F.col("n_stop") >= _MIN_STOP)
        & (F.col("alpha_frac") >= _MIN_ALPHA)
    )
    score = 1.0 / (
        1.0
        + F.exp(
            -(F.col("wsum") / F.lit(float(_CLS_MOD)) / F.col("n_words") - 0.5)
            * 4.0
        )
    )
    reason = (
        F.when(F.col("fp_rn") > 1, F.lit("duplicate"))
        .when(~gopher_ok, F.lit("quality_rules"))
        .when(score < 0.5, F.lit("classifier"))
        .otherwise(F.lit("ok"))
    )
    return (
        base.withColumn("fp_rn", fp_rn)
        .select("doc_id", reason.alias("reason"))
        .select(
            "doc_id",
            "reason",
            (F.col("reason") == "ok").cast("int").alias("keep"),
        )
    )


# ---------------------------------------------------------------------
# Corpus datasheet (one-pass summary report)
# ---------------------------------------------------------------------


@query(
    "curation_corpus_datasheet",
    f"""
    WITH base AS (SELECT doc_id, lang, source,
                         md5({_NORM_SQL}) AS fp,
                         len(string_split({_NORM_SQL}, ' ')) AS n_words,
                         length({_NORM_SQL}) AS n_chars
                  FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT)                     AS n_docs,
           CAST(SUM(n_words) AS BIGINT)                 AS total_words,
           CAST(SUM(n_chars) AS BIGINT)                 AS total_chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT)         AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT)       AS n_sources,
           CAST(COUNT(*) - COUNT(DISTINCT fp) AS BIGINT) AS n_exact_dups,
           ROUND(AVG(n_words), 6)                       AS avg_words,
           ROUND(quantile_cont(n_words, 0.5), 6)        AS p50_words,
           ROUND(quantile_cont(n_words, 0.95), 6)       AS p95_words,
           CAST(MIN(n_words) AS BIGINT)                 AS min_words,
           CAST(MAX(n_words) AS BIGINT)                 AS max_words
    FROM base
    """,
)
def corpus_datasheet_q(spark, sf_dir):
    """Corpus datasheet (Gebru et al. 2021, "Datasheets for
    Datasets"): the one-row release summary — volume, vocabulary of
    sources/languages, exact-dup count, length distribution — computed
    in ONE scan + one aggregate. The multi-DISTINCT columns share the
    single aggregation (Catalyst's expand handles them); nothing here
    re-reads the corpus, which is the difference between a datasheet
    that ships with every snapshot and one nobody regenerates at
    100 TB."""
    from data_pipeline_001_spark.functions.text import (
        fingerprint,
        normalize_text,
    )

    t = load_tables(spark, sf_dir)
    base = t["documents"].select(
        "lang",
        "source",
        fingerprint(F.col("text")).alias("fp"),
        F.size(F.split(normalize_text(F.col("text")), " ")).alias("n_words"),
        F.length(normalize_text(F.col("text"))).alias("n_chars"),
    )
    return base.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
        (F.count("*") - F.count_distinct("fp")).alias("n_exact_dups"),
        F.round(F.avg("n_words"), 6).alias("avg_words"),
        F.round(F.expr("percentile(n_words, 0.5)"), 6).alias("p50_words"),
        F.round(F.expr("percentile(n_words, 0.95)"), 6).alias("p95_words"),
        F.min("n_words").cast("long").alias("min_words"),
        F.max("n_words").cast("long").alias("max_words"),
    )


# ---------------------------------------------------------------------
# Global contiguous row index (two-phase, no single-partition sort)
# ---------------------------------------------------------------------


@query(
    "order_global_index",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS row_idx
    FROM documents
    """,
)
def global_index_q(spark, sf_dir):
    """Stable contiguous example ids for the whole corpus — computed
    with operators/relational.global_row_index's two-phase plan (B
    parallel bucket windows + a B-row driver prefix sum) instead of
    the oracle's single-partition ROW_NUMBER sort, which is exactly
    the plan that cannot survive 100 TB."""
    from data_pipeline_001_spark.operators.relational import global_row_index

    t = load_tables(spark, sf_dir)
    return global_row_index(
        t["documents"].select("doc_id"), "doc_id", bucket_width=100
    ).select("doc_id", F.col("row_idx").cast("long").alias("row_idx"))


# ---------------------------------------------------------------------
# Rolling-window anomaly detection (monitoring)
# ---------------------------------------------------------------------


@query(
    "time_rolling_anomaly",
    """
    WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
                           SUM(value) AS v
                    FROM events WHERE value IS NOT NULL
                    GROUP BY event_type, date_trunc('hour', ts)),
    r AS (SELECT event_type, h, v,
                 AVG(v) OVER w AS mu,
                 STDDEV_SAMP(v) OVER w AS sd,
                 COUNT(*) OVER w AS n_hist
          FROM hourly
          WINDOW w AS (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
    SELECT event_type, h, ROUND(v, 4) AS v,
           CAST(n_hist AS BIGINT) AS n_hist,
           CAST(CASE WHEN n_hist >= 12 AND sd > 0
                      AND abs(v - mu) > 3 * sd
                THEN 1 ELSE 0 END AS INT) AS anomaly
    FROM r
    """,
)
def rolling_anomaly_q(spark, sf_dir):
    """Rolling z-score anomaly flags on the hourly value series — the
    pipeline-health monitor that catches a collapsed or exploded load
    window (the reference eyeballs count drift per run; this scores
    every hour against its trailing day). The frame excludes the
    current row (a spike must not mask itself) and warms up for 12
    hours before flagging. One narrow agg then a per-type ordered
    window over hourly rows — bounded intermediate, like every other
    window in the engine. The z-threshold compare is done on raw
    doubles in BOTH engines; the rolling mean itself is NOT emitted —
    engines accumulate window averages in different orders, and the
    ULP-level drift flips 4-decimal rounding on ~2% of rows (measured)
    while the 3-sigma flag is insensitive to it."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    hourly = (
        t["events"]
        .where(F.col("value").isNotNull())
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.sum("value").alias("v"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    r = hourly.select(
        "event_type",
        "h",
        "v",
        F.avg("v").over(w).alias("mu"),
        F.stddev_samp("v").over(w).alias("sd"),
        F.count("*").over(w).alias("n_hist"),
    )
    return r.select(
        "event_type",
        "h",
        F.round("v", 4).alias("v"),
        F.col("n_hist").cast("long").alias("n_hist"),
        (
            (F.col("n_hist") >= 12)
            & (F.col("sd") > 0)
            & (F.abs(F.col("v") - F.col("mu")) > 3 * F.col("sd"))
        )
        .cast("int")
        .alias("anomaly"),
    )


# ---------------------------------------------------------------------
# Resample with linear interpolation (beyond forward-fill)
# ---------------------------------------------------------------------


@query(
    "time_resample_interpolate",
    """
    WITH obs AS (SELECT event_type, date_trunc('hour', ts) AS h,
                        CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS v
                 FROM events
                 WHERE value IS NOT NULL AND user_id % 20 = 0
                 GROUP BY event_type, date_trunc('hour', ts)),
    b AS (SELECT date_trunc('hour', MIN(ts)) AS h0,
                 date_trunc('hour', MAX(ts)) AS h1 FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (SELECT t.event_type,
                     unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS h
              FROM types t, b),
    j AS (SELECT s.event_type, s.h, o.v FROM spine s
          LEFT JOIN obs o USING (event_type, h)),
    f AS (SELECT event_type, h, v,
                 LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
                 LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                     OVER wp AS pt,
                 FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
                 FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                     OVER wn AS nt
          FROM j
          WINDOW wp AS (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 wn AS (PARTITION BY event_type ORDER BY h
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
    SELECT event_type, h,
           CAST(FLOOR(CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               pv + (nv - pv) * (epoch(h) - epoch(pt)) / (epoch(nt) - epoch(pt))
             WHEN pv IS NOT NULL THEN pv
             ELSE nv
           END * 1000000 + 0.5) AS BIGINT) AS filled_micro,
           CASE WHEN v IS NOT NULL THEN 'observed'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                WHEN pv IS NOT NULL THEN 'ffill'
                ELSE 'bfill' END AS fill_kind
    FROM f
    """,
)
def resample_interpolate_q(spark, sf_dir):
    """Dense-spine resample with LINEAR interpolation between the
    surrounding observations (forward/backward fill only at the series
    edges) — the gauge-densification step ffill can't serve when the
    metric trends between sparse readings. The sparse series here is a
    5%-of-users sample so the spine has real gaps to fill. Both fill
    directions are one ordered window per event type over HOURLY rows
    (bounded intermediate); at raw-event scale the same shape rides
    the bucketed as-of join like time_resample_ffill. The interpolation
    arithmetic is the identical IEEE expression on both engines."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    obs = (
        ev.where(F.col("value").isNotNull() & (F.col("user_id") % 20 == 0))
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("v"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    spine = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    j = spine.join(obs, ["event_type", "h"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("v").isNotNull(), F.col("h"))
    f = j.select(
        "event_type",
        "h",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_t, ignorenulls=True).over(wp).alias("pt"),
        F.first("v", ignorenulls=True).over(wn).alias("nv"),
        F.first(obs_t, ignorenulls=True).over(wn).alias("nt"),
    )
    frac = (F.unix_timestamp("h") - F.unix_timestamp("pt")) / (
        F.unix_timestamp("nt") - F.unix_timestamp("pt")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv") + (F.col("nv") - F.col("pv")) * frac,
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
    )
    kind = (
        F.when(F.col("v").isNotNull(), F.lit("observed"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), F.lit("interp")
        )
        .when(F.col("pv").isNotNull(), F.lit("ffill"))
        .otherwise(F.lit("bfill"))
    )
    # emit micro-units via floor(x*1e6 + 0.5): ROUND's half-case on
    # binary floats differs between engines (measured: one boundary row
    # per ~3600), floor of the identical IEEE expression cannot
    return f.select(
        "event_type",
        "h",
        F.floor(filled * 1_000_000 + 0.5).cast("long").alias("filled_micro"),
        kind.alias("fill_kind"),
    )


# ---------------------------------------------------------------------
# Governance: column masking + k-anonymity reporting
# ---------------------------------------------------------------------


@query(
    "governance_masked_events",
    """
    SELECT event_id,
           md5(CAST(user_id AS VARCHAR)) AS user_token,
           event_type,
           CASE WHEN event_type = 'purchase' THEN value ELSE NULL END
               AS value_restricted,
           date_trunc('day', ts) AS day_coarse
    FROM events WHERE user_id IS NOT NULL AND event_id < 3000
    """,
)
def masked_events_q(spark, sf_dir):
    """Policy-masked view of the events table — the Ranger/Unity-style
    governance projection as plain column expressions: identifiers
    pseudonymized (deterministic md5 token, so joins on the token
    still work across masked views), sensitive measures visible only
    for permitted categories, timestamps coarsened to day. A masked
    VIEW costs nothing at rest — the policy runs inside the same
    codegen projection as any other column."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("user_id").isNotNull() & (F.col("event_id") < 3000))
        .select(
            "event_id",
            F.md5(F.col("user_id").cast("string")).alias("user_token"),
            "event_type",
            F.when(F.col("event_type") == "purchase", F.col("value"))
            .otherwise(F.lit(None))
            .alias("value_restricted"),
            F.date_trunc("day", "ts").alias("day_coarse"),
        )
    )


_K_ANON = 5


@query(
    "governance_k_anonymity",
    f"""
    WITH g AS (SELECT event_type,
                      CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
                      user_id % 100 AS user_bucket,
                      COUNT(*) AS n
               FROM events WHERE user_id IS NOT NULL
               GROUP BY 1, 2, 3)
    SELECT event_type, hour_of_day, CAST(user_bucket AS BIGINT) AS user_bucket,
           CAST(n AS BIGINT) AS n,
           CAST(CASE WHEN n < {_K_ANON} THEN 1 ELSE 0 END AS INT)
               AS below_k
    FROM g
    """,
)
def k_anonymity_q(spark, sf_dir):
    """k-anonymity report over the quasi-identifier tuple
    (event_type, hour-of-day, user bucket): every combination's
    population and a flag for groups smaller than k={k} — the
    suppression-candidate list a privacy review starts from
    (Sweeney 2002, public). One narrow aggregate; at release time the
    below-k groups get suppressed or generalized, exactly like the
    curation quota/threshold gates this module already applies."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .groupBy(
            "event_type",
            F.hour("ts").cast("int").alias("hour_of_day"),
            (F.col("user_id") % 100).alias("user_bucket"),
        )
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "hour_of_day",
            F.col("user_bucket").cast("long").alias("user_bucket"),
            F.col("n").cast("long").alias("n"),
            (F.col("n") < _K_ANON).cast("int").alias("below_k"),
        )
    )


_DP_EPS = 0.5
_DP_SEED = 20240101


@query(
    "governance_dp_counts",
    f"""
    WITH c AS (SELECT event_type, COUNT(*) AS n
               FROM events GROUP BY event_type),
    u AS (SELECT event_type, n,
                 (('0x' || substr(md5(event_type || '|{_DP_SEED}'), 1, 13))
                     ::UBIGINT % 9007199254740992)
                     / 9007199254740992.0 AS unif
          FROM c)
    SELECT event_type,
           CAST(n + CAST(FLOOR(
               CASE WHEN unif < 0.5
                    THEN (1.0 / {_DP_EPS}) * ln(2.0 * unif)
                    ELSE -(1.0 / {_DP_EPS}) * ln(2.0 * (1.0 - unif))
               END + 0.5) AS BIGINT) AS BIGINT) AS noisy_n,
           CAST(CASE WHEN n >= 10 THEN 1 ELSE 0 END AS INT) AS releasable
    FROM u
    """,
)
def dp_counts_q(spark, sf_dir):
    """Differentially-private release mechanism plumbing: per-category
    counts perturbed with Laplace(1/ε) noise via inverse-CDF sampling,
    plus a minimum-population release gate. The uniform draw is
    DERIVED from a keyed hash so the oracle can verify the mechanism's
    arithmetic end-to-end — production DP swaps that one expression
    for a secure RNG (determinism here is a test seam, not a privacy
    claim; a seeded release would leak). Same hash→uniform machinery
    as the engine's weighted samplers."""
    t = load_tables(spark, sf_dir)
    c = t["events"].groupBy("event_type").agg(F.count("*").alias("n"))
    unif = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("event_type"), F.lit(str(_DP_SEED)))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(9007199254740992)
    ) / F.lit(9007199254740992.0)
    lap = F.when(
        unif < 0.5, (1.0 / _DP_EPS) * F.log(2.0 * unif)
    ).otherwise(-(1.0 / _DP_EPS) * F.log(2.0 * (1.0 - unif)))
    return c.select(
        "event_type",
        (F.col("n") + F.floor(lap + 0.5).cast("long")).cast("long").alias(
            "noisy_n"
        ),
        (F.col("n") >= 10).cast("int").alias("releasable"),
    )


# ---------------------------------------------------------------------
# Distribution diagnostics: Gini, Zipf slope, mixture entropy
# ---------------------------------------------------------------------


@query(
    "agg_gini_concentration",
    """
    WITH u AS (SELECT event_type, user_id, SUM(value) AS spend
               FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
               GROUP BY event_type, user_id),
    r AS (SELECT event_type, spend,
                 ROW_NUMBER() OVER (PARTITION BY event_type
                                    ORDER BY spend, user_id) AS i,
                 COUNT(*) OVER (PARTITION BY event_type) AS n,
                 SUM(spend) OVER (PARTITION BY event_type) AS tot
          FROM u)
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_users,
           ROUND(2.0 * SUM(i * spend) / (MAX(n) * MAX(tot))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini
    FROM r GROUP BY event_type
    """,
)
def gini_q(spark, sf_dir):
    """Gini coefficient of per-user spend within each event type —
    the concentration diagnostic that tells a mixture designer whether
    a source's volume comes from a broad base or a few heavy users
    (the same question the join-key skew profiler answers for keys,
    asked of mass). Rank window with user_id tiebreak so the weighted
    sum is deterministic; one window pass + one aggregate."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    u = (
        t["events"]
        .where(F.col("value").isNotNull() & F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.sum("value").alias("spend"))
    )
    wp = Window.partitionBy("event_type")
    r = u.select(
        "event_type",
        "spend",
        F.row_number()
        .over(wp.orderBy("spend", "user_id"))
        .alias("i"),
        F.count("*").over(wp).alias("n"),
        F.sum("spend").over(wp).alias("tot"),
    )
    return r.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n_users"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("spend"))
            / (F.max("n") * F.max("tot"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


@query(
    "text_zipf_fit",
    f"""
    WITH w AS (SELECT unnest(string_split({_NORM_SQL}, ' ')) AS word
               FROM documents),
    c AS (SELECT word, COUNT(*) AS freq FROM w GROUP BY word),
    r AS (SELECT word, freq,
                 ROW_NUMBER() OVER (ORDER BY freq DESC, word) AS rank
          FROM c)
    SELECT CAST(COUNT(*) AS BIGINT) AS vocab_size,
           ROUND(regr_slope(ln(CAST(freq AS DOUBLE)),
                            ln(CAST(rank AS DOUBLE))), 6) AS zipf_slope,
           ROUND(regr_r2(ln(CAST(freq AS DOUBLE)),
                         ln(CAST(rank AS DOUBLE))), 6) AS fit_r2
    FROM r
    """,
)
def zipf_fit_q(spark, sf_dir):
    """Zipf's-law fit of the corpus vocabulary: OLS slope of
    log-frequency against log-rank (natural text sits near −1; the
    synthetic corpus's flat vocabulary shows up immediately as a
    shallow slope with poor fit — which is itself the diagnostic). A
    frequency distribution far from Zipf flags template/generated
    text, complementing the repetition and perplexity signals. The
    rank window runs over the VOCABULARY (bounded), not the corpus."""
    from pyspark.sql import Window

    from data_pipeline_001_spark.operators.text_analysis import (
        exploded_word_ngrams,
    )

    t = load_tables(spark, sf_dir)
    words = exploded_word_ngrams(t["documents"], n=1).select(
        F.col("gram").alias("word")
    )
    c = words.groupBy("word").agg(F.count("*").alias("freq"))
    r = c.select(
        "freq",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), "word"))
        .alias("rank"),
    )
    lf = F.log(F.col("freq").cast("double"))
    lr = F.log(F.col("rank").cast("double"))
    return r.agg(
        F.count("*").cast("long").alias("vocab_size"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("fit_r2"),
    )


@query(
    "curation_source_entropy",
    """
    WITH s AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    t AS (SELECT source, n, SUM(n) OVER () AS tot FROM s)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
           ROUND(-SUM((n / CAST(tot AS DOUBLE))
                      * ln(n / CAST(tot AS DOUBLE))), 6) AS entropy_nats,
           ROUND(-SUM((n / CAST(tot AS DOUBLE))
                      * ln(n / CAST(tot AS DOUBLE)))
                 / ln(CAST(COUNT(*) AS DOUBLE)), 6) AS evenness
    FROM t
    """,
)
def source_entropy_q(spark, sf_dir):
    """Shannon entropy of the source mixture plus Pielou evenness
    (entropy / ln(k), 1.0 = perfectly balanced) — the one-number
    diversity summary of a data recipe, the scalar the
    domain-mixture rebalancer drives toward its target. Bounded
    per-source table; all float math is the same expression on both
    engines over exact integer counts."""
    t = load_tables(spark, sf_dir)
    s = t["documents"].groupBy("source").agg(F.count("*").alias("n"))
    from pyspark.sql import Window

    tt = s.select(
        "n", F.sum("n").over(Window.partitionBy()).alias("tot")
    )
    p = F.col("n") / F.col("tot").cast("double")
    return tt.agg(
        F.count("*").cast("long").alias("n_sources"),
        F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        F.round(
            -F.sum(p * F.log(p)) / F.log(F.count("*").cast("double")), 6
        ).alias("evenness"),
    )


@query(
    "quality_benford_digits",
    """
    WITH d AS (SELECT CAST(FLOOR(value / POWER(10, FLOOR(LOG10(value))))
                           AS INT) AS digit
               FROM events WHERE value IS NOT NULL AND value >= 1),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT digit, n, SUM(n) OVER () AS tot FROM c)
    SELECT digit,
           CAST(n AS BIGINT) AS n,
           ROUND(n / CAST(tot AS DOUBLE), 6) AS observed_p,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_p
    FROM t
    """,
)
def benford_q(spark, sf_dir):
    """Benford's-law first-digit distribution of the value column
    against the theoretical log10(1 + 1/d) frequencies — the
    fabricated-data smell test auditors run on financial feeds
    (uniform synthetic values diverge loudly, which is itself the
    demonstration). Digit extraction is pure floor/log arithmetic,
    identical on both engines; one narrow aggregate."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    digit = F.floor(
        F.col("value") / F.pow(F.lit(10.0), F.floor(F.log10("value")))
    ).cast("int")
    c = (
        t["events"]
        .where(F.col("value").isNotNull() & (F.col("value") >= 1))
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").alias("n"))
    )
    tt = c.select(
        "digit", "n", F.sum("n").over(Window.partitionBy()).alias("tot")
    )
    return tt.select(
        "digit",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("tot").cast("double"), 6).alias(
            "observed_p"
        ),
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_p"),
    )


@query(
    "window_activity_streaks",
    """
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
               FROM events WHERE user_id IS NOT NULL),
    g AS (SELECT user_id, day,
                 date_diff('day', DATE '1970-01-01', day)
                 - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                     AS grp
          FROM d),
    s AS (SELECT user_id, COUNT(*) AS streak_len, MIN(day) AS streak_start
          FROM g GROUP BY user_id, grp),
    best AS (SELECT user_id, streak_len, streak_start,
                    ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY streak_len DESC,
                                                streak_start) AS rk
             FROM s)
    SELECT user_id, CAST(streak_len AS BIGINT) AS streak_len, streak_start
    FROM best WHERE rk = 1 AND streak_len >= 3
    """,
)
def activity_streaks_q(spark, sf_dir):
    """Longest consecutive-day activity streak per user (reported for
    streaks ≥ 3) — the gaps-and-islands pattern (epoch-day minus rank
    is constant within a run) applied to engagement, the retention
    cousin of the window-continuity check W4. Distinct-day dedupe,
    one island window, one top-1 window — every window partitioned by
    user."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    d = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
    )
    wd = Window.partitionBy("user_id").orderBy("day")
    g = d.select(
        "user_id",
        "day",
        (
            F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
            - F.row_number().over(wd)
        ).alias("grp"),
    )
    s = g.groupBy("user_id", "grp").agg(
        F.count("*").alias("streak_len"), F.min("day").alias("streak_start")
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), "streak_start"
    )
    return (
        s.withColumn("rk", F.row_number().over(wb))
        .where((F.col("rk") == 1) & (F.col("streak_len") >= 3))
        .select(
            "user_id",
            F.col("streak_len").cast("long").alias("streak_len"),
            "streak_start",
        )
    )


@query(
    "window_pct_change_daily",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
                      COUNT(*) AS n
               FROM events GROUP BY event_type, CAST(ts AS DATE)),
    l AS (SELECT event_type, day, n,
                 LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                     AS prev_n
          FROM d)
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           CAST(prev_n AS BIGINT) AS prev_n,
           ROUND(CASE WHEN prev_n IS NULL THEN NULL
                      WHEN prev_n = 0 AND n = 0 THEN 0.0
                      WHEN prev_n = 0 THEN 100.0
                      ELSE (n - prev_n) * 100.0 / prev_n
                 END, 6) AS pct_change
    FROM l
    """,
)
def pct_change_daily_q(spark, sf_dir):
    """Day-over-day percent change of load per event type — the
    F13 guarded-percent-difference contract (0/0 → 0, x/0 → 100)
    applied along the time axis with LAG, the series the rolling
    anomaly monitor consumes. One narrow agg + a per-type ordered
    window over daily rows."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    d = t["events"].groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    l = d.withColumn("prev_n", F.lag("n").over(w))
    pct = (
        F.when(F.col("prev_n").isNull(), F.lit(None))
        .when((F.col("prev_n") == 0) & (F.col("n") == 0), F.lit(0.0))
        .when(F.col("prev_n") == 0, F.lit(100.0))
        .otherwise((F.col("n") - F.col("prev_n")) * 100.0 / F.col("prev_n"))
    )
    return l.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n"),
        F.col("prev_n").cast("long").alias("prev_n"),
        F.round(pct, 6).alias("pct_change"),
    )


_BUDGET_TOKENS = 1_000_000


@query(
    "curation_token_budget_plan",
    f"""
    WITH s AS (SELECT source,
                      SUM(len(string_split({_NORM_SQL}, ' '))) AS toks
               FROM documents GROUP BY source),
    q AS (SELECT source, toks,
                 {_BUDGET_TOKENS} * sqrt(CAST(toks AS DOUBLE))
                     / SUM(sqrt(CAST(toks AS DOUBLE))) OVER () AS quota
          FROM s),
    f AS (SELECT source, toks,
                 CAST(FLOOR(quota) AS BIGINT) AS base_alloc,
                 quota - FLOOR(quota) AS rem,
                 {_BUDGET_TOKENS} - SUM(CAST(FLOOR(quota) AS BIGINT)) OVER ()
                     AS leftover
          FROM q),
    r AS (SELECT source, toks, base_alloc, leftover,
                 ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
          FROM f)
    SELECT source, CAST(toks AS BIGINT) AS corpus_tokens,
           CAST(base_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS allocated_tokens
    FROM r
    """,
)
def token_budget_plan_q(spark, sf_dir):
    """Token-budget apportionment: a fixed training budget divided
    across sources under temperature-scaled weights (α = 0.5, the
    same q_i ∝ p_i^α rule as curation_temperature_mixture), made
    EXACTLY integral with the largest-remainder method — floors plus
    one extra token to the largest fractional remainders, so the
    allocations sum to the budget to the token (ties broken by source
    name). The apportionment arithmetic every mixture executor needs
    before sampling begins; bounded per-source table throughout."""
    from pyspark.sql import Window

    from data_pipeline_001_spark.plans.queries_curation2 import _norm_tokens

    t = load_tables(spark, sf_dir)
    s = t["documents"].groupBy("source").agg(
        F.sum(_norm_tokens()).alias("toks")
    )
    wall = Window.partitionBy()
    quota = (
        _BUDGET_TOKENS
        * F.sqrt(F.col("toks").cast("double"))
        / F.sum(F.sqrt(F.col("toks").cast("double"))).over(wall)
    )
    f = s.select(
        "source",
        "toks",
        F.floor(quota).cast("long").alias("base_alloc"),
        (quota - F.floor(quota)).alias("rem"),
    ).withColumn(
        "leftover",
        _BUDGET_TOKENS - F.sum("base_alloc").over(wall),
    )
    r = f.withColumn(
        "rk",
        F.row_number().over(Window.orderBy(F.col("rem").desc(), "source")),
    )
    return r.select(
        "source",
        F.col("toks").cast("long").alias("corpus_tokens"),
        (
            F.col("base_alloc")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("allocated_tokens"),
    )


@query(
    "curation_interleave_order",
    """
    WITH r AS (SELECT doc_id, source,
                      ROW_NUMBER() OVER (PARTITION BY source
                                         ORDER BY md5(CAST(doc_id AS VARCHAR)))
                          AS rk,
                      DENSE_RANK() OVER (ORDER BY source) AS src_idx,
                      COUNT(DISTINCT source) OVER () AS n_src
               FROM documents)
    SELECT doc_id, source,
           CAST((rk - 1) * n_src + src_idx AS BIGINT) AS train_position
    FROM r
    """,
)
def interleave_order_q(spark, sf_dir):
    """Deterministic source-interleaved training order: documents are
    hash-shuffled WITHIN their source, then sources are round-robined
    (position = within-source rank × source count + source index), so
    any contiguous slice of the training stream sees every source in
    proportion — the anti-curriculum guarantee a naive global sort by
    source destroys and the global hash shuffle only achieves in
    expectation. Pure rank arithmetic; per-source windows plus one
    bounded dense-rank over the source list."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    rk = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string"))
        )
    )
    src_idx = F.dense_rank().over(Window.orderBy("source"))
    # COUNT(DISTINCT) OVER is unsupported in Spark; the max dense_rank
    # IS the distinct source count
    r = d.select(
        "doc_id", "source", rk.alias("rk"), src_idx.alias("src_idx")
    ).withColumn("n_src", F.max("src_idx").over(Window.partitionBy()))
    return r.select(
        "doc_id",
        "source",
        ((F.col("rk") - 1) * F.col("n_src") + F.col("src_idx"))
        .cast("long")
        .alias("train_position"),
    )


@query(
    "agg_autocorr_daily_counts",
    """
    WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
               FROM events GROUP BY event_type, CAST(ts AS DATE)),
    l AS (SELECT event_type, n,
                 LAG(n) OVER (PARTITION BY event_type ORDER BY day)
                     AS prev_n
          FROM d)
    SELECT event_type,
           CAST(COUNT(prev_n) AS BIGINT) AS n_days,
           ROUND(corr(CAST(n AS DOUBLE), CAST(prev_n AS DOUBLE)), 6)
               AS autocorr_lag1
    FROM l WHERE prev_n IS NOT NULL
    GROUP BY event_type
    """,
)
def autocorr_daily_q(spark, sf_dir):
    """Lag-1 autocorrelation of the daily load series per event type —
    near zero says day-to-day volume is memoryless (alerts can use
    independent thresholds), high says momentum/seasonality (the
    rolling monitor's trailing window should widen). Daily agg, LAG
    pairing, one corr over the bounded series."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    d = t["events"].groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").alias("n"))
    l = d.withColumn(
        "prev_n",
        F.lag("n").over(Window.partitionBy("event_type").orderBy("day")),
    ).where(F.col("prev_n").isNotNull())
    return l.groupBy("event_type").agg(
        F.count("prev_n").cast("long").alias("n_days"),
        F.round(
            F.corr(F.col("n").cast("double"), F.col("prev_n").cast("double")),
            6,
        ).alias("autocorr_lag1"),
    )
