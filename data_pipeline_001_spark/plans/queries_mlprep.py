"""ML-serving preparation queries (round-4 additions): int8
quantization calibration over the embedding corpus and BPE
merge-pair statistics over the document corpus.

Both are thin registrations of operators (vector_stats /
text_analysis) with exact DuckDB oracles. This module imports after
``queries_textprep`` in ``__spark_entry__._registry`` — new registry
entries queue behind the pinned round-3 coverage backlog.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

_QUANT_ORACLE = """
WITH vals AS (
  SELECT CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
         ABS(CAST(unnest(embedding) AS DOUBLE)) AS a
  FROM embeddings
), stats AS (
  SELECT pos, COUNT(*) AS n_vals, MAX(a) AS absmax_raw,
         ROUND(quantile_cont(a, 0.999), 6) AS p_abs
  FROM vals GROUP BY pos
), clip AS (
  SELECT v.pos,
         ROUND(AVG(CASE WHEN v.a > s.p_abs THEN 1.0 ELSE 0.0 END), 6)
           AS clip_frac
  FROM vals v JOIN stats s USING (pos) GROUP BY v.pos
)
SELECT s.pos, s.n_vals,
       ROUND(s.absmax_raw, 6) AS absmax,
       ROUND(s.absmax_raw / 127.0, 6) AS scale_absmax,
       s.p_abs AS p_clip_abs,
       ROUND(s.p_abs / 127.0, 6) AS scale_clipped,
       c.clip_frac
FROM stats s JOIN clip c USING (pos)
"""


@query("embedding_quant_calibration", _QUANT_ORACLE)
def embedding_quant_calibration(spark, sf_dir):
    """Per-dimension int8 calibration sweep (absmax vs p99.9-clipped
    scale + clip rate) — the pre-serving quantization report for an
    embedding corpus. The clip threshold is rounded to 6 decimals on
    both engines before comparing, so interpolated-percentile ULP
    noise cannot flip a count."""
    from data_pipeline_001_spark.operators.vector_stats import (
        quantization_calibration,
    )

    t = load_tables(spark, sf_dir)
    return quantization_calibration(t["embeddings"])


_BPE_ORACLE = r"""
WITH words AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
  FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)),
                               i -> substring(w, CAST(i AS INT), 2))) AS pair
  FROM words WHERE length(w) >= 2
)
SELECT pair, COUNT(*) AS n
FROM pairs GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT 50
"""


@query("text_bpe_pair_stats", _BPE_ORACLE)
def text_bpe_pair_stats(spark, sf_dir):
    """Top-50 adjacent char pairs within words — the counting step of
    a BPE tokenizer-training merge iteration (the argmax pair is the
    next merge rule)."""
    from data_pipeline_001_spark.operators.text_analysis import bpe_pair_stats

    t = load_tables(spark, sf_dir)
    return bpe_pair_stats(t["documents"])


_THETA_ORACLE = """
SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                THEN user_id END) AS BIGINT) AS exact_a,
       CAST(COUNT(DISTINCT CASE WHEN event_type = 'error'
                                THEN user_id END) AS BIGINT) AS exact_b,
       CAST(COUNT(DISTINCT CASE WHEN event_type IN ('purchase', 'error')
                                THEN user_id END) AS BIGINT) AS exact_union,
       CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                AND user_id IN (SELECT user_id FROM events
                                                WHERE event_type = 'error')
                                THEN user_id END) AS BIGINT)
         AS exact_intersect,
       CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
                                AND user_id NOT IN
                                    (SELECT user_id FROM events
                                     WHERE event_type = 'error'
                                       AND user_id IS NOT NULL)
                                THEN user_id END) AS BIGINT) AS exact_diff,
       TRUE AS union_ok, TRUE AS intersect_ok, TRUE AS diff_ok
FROM events WHERE user_id IS NOT NULL
"""


@query("agg_theta_set_algebra", _THETA_ORACLE)
def theta_set_algebra(spark, sf_dir):
    """Distinct-set ALGEBRA on mergeable sketches (DataSketches Theta):
    audience overlap — purchasers ∩ erroring users, purchasers \\ erroring
    — from two per-segment sketches, no re-scan of raw events. This is
    the capability HLL lacks (HLL unions but cannot intersect); at
    100 TB the per-segment sketches are KB-sized daily partials and the
    set algebra runs on the driver in microseconds. At default lgK=12
    the sketch is in exact mode below 4096 distinct keys, so the
    estimates here equal the exact twins; the asserted contract bound
    (±5·rse, rse≈1/√4096) is what holds once sampling kicks in at
    corpus scale. The cross-engine gate checks exact twins + flags
    (sketch bytes are engine-specific)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("sk_a"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "error", F.col("user_id"))
        ).alias("sk_b"),
        F.count_distinct(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("exact_a"),
        F.count_distinct(
            F.when(F.col("event_type") == "error", F.col("user_id"))
        ).alias("exact_b"),
        F.count_distinct(
            F.when(
                F.col("event_type").isin("purchase", "error"),
                F.col("user_id"),
            )
        ).alias("exact_union"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select("user_id")
    err = ev.where(F.col("event_type") == "error").select(
        F.col("user_id").alias("eu")
    )
    inter_exact = (
        pur.join(err, pur.user_id == err.eu, "left_semi")
        .agg(F.count_distinct("user_id").alias("exact_intersect"))
    )
    diff_exact = (
        pur.join(err, pur.user_id == err.eu, "left_anti")
        .agg(F.count_distinct("user_id").alias("exact_diff"))
    )
    est = sk.crossJoin(F.broadcast(inter_exact)).crossJoin(
        F.broadcast(diff_exact)
    ).select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersect",
        "exact_diff",
        F.theta_sketch_estimate(
            F.theta_union(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_union"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_intersect"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_a"), F.col("sk_b"))
        ).alias("est_diff"),
    )
    rse5 = 5.0 / 4096.0 ** 0.5  # 5 relative standard errors at lgK=12

    def ok(est_c, exact_c):
        return F.abs(F.col(est_c) - F.col(exact_c)) <= F.greatest(
            F.col(exact_c) * F.lit(rse5), F.lit(1.0)
        )

    return est.select(
        "exact_a",
        "exact_b",
        "exact_union",
        "exact_intersect",
        "exact_diff",
        ok("est_union", "exact_union").alias("union_ok"),
        ok("est_intersect", "exact_intersect").alias("intersect_ok"),
        ok("est_diff", "exact_diff").alias("diff_ok"),
    )


_TOPK_ORACLE = """
SELECT event_type AS item, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
ORDER BY n DESC, item ASC LIMIT 5
"""


@query("agg_approx_topk_merge", _TOPK_ORACLE)
def approx_topk_merge(spark, sf_dir):
    """MERGEABLE frequent-items sketches (``approx_top_k_accumulate``
    → ``combine`` → ``estimate``): per-day heavy-hitter states roll up
    without re-scanning raw events — the dashboard pattern for 100 TB
    logs (daily states are KB-sized; the combine is driver-cheap).
    With maxItemsTracked=10 ≥ the 5 distinct event types every item is
    tracked exactly, so the merged estimates equal exact counts; the
    re-sort after explode pins a deterministic (n DESC, item ASC)
    order because the sketch's own tie order is unspecified."""
    t = load_tables(spark, sf_dir)
    daily = t["events"].groupBy(F.to_date("ts").alias("day")).agg(
        F.expr("approx_top_k_accumulate(event_type, 10)").alias("state")
    )
    merged = daily.agg(
        F.expr("approx_top_k_estimate(approx_top_k_combine(state, 10), 5)")
        .alias("top")
    )
    return (
        merged.select(F.explode("top").alias("e"))
        .select(
            F.col("e.item").alias("item"),
            F.col("e.count").cast("long").alias("n"),
        )
        .orderBy(F.col("n").desc(), F.col("item").asc())
    )


_BLOOM_ORACLE = """
SELECT b.doc_id, b.lang
FROM documents b
WHERE b.doc_id % 10 = 0
  AND NOT EXISTS (
    SELECT 1 FROM documents c
    WHERE c.doc_id % 10 <> 0 AND md5(c.text) = md5(b.text))
"""


@query("dedup_bloom_incremental", _BLOOM_ORACLE)
def dedup_bloom_incremental(spark, sf_dir):
    """Incremental batch admission against the corpus via a broadcast
    Bloom filter (operators/bloom): bloom-negative rows admit with
    zero joins; bloom-positive candidate fingerprints broadcast into a
    corpus semi-join for exact verification — the corpus is scanned
    but NEVER shuffled, and false positives cost broadcast rows, never
    correctness. The result is exactly batch ∖ corpus (DuckDB
    anti-join oracle). Batch = every 10th doc, corpus = the rest;
    fingerprints are md5(text)."""
    from data_pipeline_001_spark.operators.bloom import (
        dedup_incremental_bloom,
    )

    docs = load_tables(spark, sf_dir)["documents"].withColumn(
        "_fp", F.md5(F.col("text"))
    )
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    out = dedup_incremental_bloom(corpus, batch, "_fp", m_bits=1 << 20)
    return out.select("doc_id", "lang")


# fixed demo merge table (ordered!) — common English BPE merges. Both
# engines apply the SAME literal rules, so the oracle is exact.
_BPE_MERGES = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("an", "d"),
)


def _bpe_sql_chain(expr: str) -> str:
    """Chained delimited pair replaces — one replace() per merge rule,
    identical semantics in Spark SQL and DuckDB. The char sequence is
    wrapped in sentinel spaces and each rule matches the
    space-delimited pair (' a b ' -> ' ab '), so a merge can never
    consume the tail of a longer token ('the r' no longer
    substring-matches rule (e,r)). Residual approximation vs
    token-exact merge-all BPE (operators/text_analysis._merge_tokens):
    immediately-adjacent repeat sites share a delimiter, so a single
    non-overlapping pass can take one fewer merge on e.g. 'erer';
    both engines share these exact semantics, so the oracle is still
    an equality check."""
    expr = f"concat(' ', {expr}, ' ')"
    for a, b in _BPE_MERGES:
        expr = f"replace({expr}, ' {a} {b} ', ' {a}{b} ')"
    return expr


_DUCK_SEQ = _bpe_sql_chain(
    "rtrim(regexp_replace(w, '(.)', '\\1 ', 'g'))"
)

_BPE_ENCODE_ORACLE = f"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), toks AS (
  SELECT doc_id, length(w) AS n_chars,
         length({_DUCK_SEQ})
           - length(replace({_DUCK_SEQ}, ' ', ''))
           - 1 AS n_tok
  FROM words
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_chars) AS BIGINT) AS n_tokens_char,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens_bpe,
       ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_tok), 6) AS compression
FROM toks GROUP BY doc_id
"""


@query("text_bpe_encode", _BPE_ENCODE_ORACLE)
def text_bpe_encode(spark, sf_dir):
    """APPLY a learned BPE merge table (the consumption side of
    ``text_bpe_pair_stats``): each word becomes a char-spaced sequence
    and the ordered merge rules collapse pairs via chained
    space-delimited ``replace`` on a sentinel-wrapped sequence —
    merges never cross token boundaries ("o the r" + rule (e,r) stays
    3 tokens), and the one residual divergence from token-exact
    merge-all BPE (adjacent repeat sites, see ``_bpe_sql_chain``) is
    shared bit-for-bit by both engines, so the oracle is an equality
    check, not a contract. The
    whole pipeline is codegen string ops inside one projection — per
    doc: word count, char-token count, BPE-token count, compression.
    At a production vocab (30k+ merges) the chain becomes an
    Arrow-batched UDF with a trie; the plan shape (no shuffle until
    the per-doc agg) is the same."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    seq = "rtrim(regexp_replace(w, '(.)', '$1 '))"
    chain = _bpe_sql_chain(seq)
    n_tok = f"length({chain}) - length(replace({chain}, ' ', '')) - 1"
    words = docs.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w"),
    )
    return (
        words.select(
            "doc_id",
            F.length("w").alias("n_chars"),
            F.expr(n_tok).alias("n_tok"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_chars").alias("n_tokens_char"),
            F.sum("n_tok").alias("n_tokens_bpe"),
            F.round(
                F.sum("n_chars").cast("double") / F.sum("n_tok"), 6
            ).alias("compression"),
        )
    )


_ASSEMBLY_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(new_session) OVER
           (PARTITION BY user_id ORDER BY ts, event_id
            ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM gaps
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS seq,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS dur_s
FROM sess GROUP BY user_id, session_seq
"""


@query("curation_session_assembly", _ASSEMBLY_ORACLE)
def curation_session_assembly(spark, sf_dir):
    """Assemble per-session ORDERED interaction sequences — the step
    that turns an event log into training examples (chat turns, user
    journeys): sessionize on 30-min gaps, then emit each session's
    event-type sequence in (ts, event_id) order. The ordered assembly
    is ``array_sort(collect_list(struct(ts, event_id, event_type)))``
    — sort happens inside the aggregation buffer per session, no extra
    shuffle beyond the sessionization window's, and the (ts, event_id)
    tiebreak makes the string deterministic on both engines."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .withColumn(
            "new_session",
            F.when(
                F.col("ts") - F.lag("ts").over(w)
                > F.expr("interval 30 minutes"),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return sess.groupBy(
        "user_id", F.col("session_seq").cast("long").alias("session_seq")
    ).agg(
        F.count("*").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("seq"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("dur_s"),
    )


_REACH_SQL = """
WITH RECURSIVE hops (src, dst, k) AS (
  SELECT src, dst, 1 AS k FROM {edges}
  UNION ALL
  SELECT h.src, e.dst, h.k + 1
  FROM hops h JOIN {edges} e ON h.dst = e.src
  WHERE h.k < 4
)
SELECT src, dst, CAST(MIN(k) AS BIGINT) AS min_hops
FROM hops GROUP BY src, dst
"""

_EDGES_SQL = """
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LEAD(event_type) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events WHERE user_id IS NOT NULL
), counted AS (
  SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
  FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
), ranked AS (
  SELECT src, dst,
         ROW_NUMBER() OVER
           (PARTITION BY src ORDER BY n DESC, dst ASC) AS rk
  FROM counted
)
SELECT src, dst FROM ranked WHERE rk = 1
"""


# one combined CTE list: WITH RECURSIVE introduces both the edge
# derivation and the bounded BFS (a second WITH would be a syntax error)
_REACH_ORACLE = (
    "WITH RECURSIVE edges AS ({edges}),\n"
    + _REACH_SQL.format(edges="edges").split("AS (", 1)[0].replace(
        "WITH RECURSIVE ", ""
    )
    + "AS ("
    + _REACH_SQL.format(edges="edges").split("AS (", 1)[1]
).format(edges=_EDGES_SQL)


@query("graph_event_reachability", _REACH_ORACLE)
def graph_event_reachability(spark, sf_dir):
    """Multi-hop reachability (BFS min-hops, ≤4) over the DOMINANT
    event-transition graph — each event type's single most frequent
    successor (deterministic (count DESC, dst ASC) tiebreak), walked
    with Spark 4's native ``WITH RECURSIVE``. The recursion is the
    engine's iterative-plan surface: each level is one bounded
    self-join on the (≤ #event-types)-row edge table, so depth, not
    data volume, drives cost; the same SQL text runs on DuckDB as the
    oracle. Cycle-safe via the hop bound."""
    load_tables(spark, sf_dir)  # registers the 'events' temp view
    edges = spark.sql(_EDGES_SQL)
    edges.createOrReplaceTempView("_reach_edges")
    return spark.sql(_REACH_SQL.format(edges="_reach_edges"))


_EWMA_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS DOUBLE) AS x
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), seq AS (
  SELECT event_type, day, x,
         ROW_NUMBER() OVER
           (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
), scaled AS (
  SELECT event_type, day, x, t,
         SUM(x * power(1.25, t)) OVER
           (PARTITION BY event_type ORDER BY day
            ROWS UNBOUNDED PRECEDING) AS s,
         FIRST_VALUE(x) OVER
           (PARTITION BY event_type ORDER BY day) AS x1
  FROM seq
)
SELECT event_type, day, CAST(x AS BIGINT) AS n,
       ROUND(0.2 * power(0.8, t) * (s - x1 * 1.25)
             + power(0.8, t - 1) * x1, 6) AS ewma
FROM scaled
"""


@query("time_ewma_daily", _EWMA_ORACLE)
def time_ewma_daily(spark, sf_dir):
    """Exponentially-weighted moving average of the daily event count
    per type (α=0.2, ewma₁=x₁) — the recursive smoother expressed as
    ONE closed-form windowed cumulative sum (xᵢ scaled by r⁻ⁱ, result
    rescaled by rᵗ), so it runs as a plain window aggregate instead of
    a sequential loop: per-key parallel, single exchange, no UDF. The
    r⁻ⁱ growth bounds the usable series length (~300 days in float64
    at r=0.8) — beyond that, chunk the series and seed each chunk with
    the prior chunk's EWMA. Identical arithmetic on DuckDB; both
    engines round to 6 (FP error budget ~1e-9, analyzed in the round-4
    notes)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    daily = t["events"].groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.count("*").cast("double").alias("x"))
    seq = daily.withColumn("t", F.row_number().over(w))
    scaled = seq.withColumn(
        "s",
        F.sum(F.col("x") * F.pow(F.lit(1.25), F.col("t"))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("x1", F.first("x").over(w))
    return scaled.select(
        "event_type",
        "day",
        F.col("x").cast("long").alias("n"),
        F.round(
            F.lit(0.2)
            * F.pow(F.lit(0.8), F.col("t"))
            * (F.col("s") - F.col("x1") * F.lit(1.25))
            + F.pow(F.lit(0.8), F.col("t") - 1) * F.col("x1"),
            6,
        ).alias("ewma"),
    )


def _bpe_train_oracle_sql(n_merges: int = 8) -> str:
    """Generate the EXACT DuckDB oracle for ``bpe_train``: a chained
    CTE per merge step. Step k counts adjacent pairs over the step-k-1
    token sequences, takes the same deterministic argmax
    (count DESC, left ASC, right ASC), and applies the same
    leftmost-greedy non-overlapping merge — DuckDB's ``list_reduce``
    lacks list-typed accumulators (1.0), so the accumulator is the
    space-joined token STRING (tokens are ``[a-z]+`` so space-free),
    with the last token read/rewritten via an end-anchored regex.
    This is the identical fold `_merge_tokens` runs in Spark
    (``operators/text_analysis.py``): merging never creates a token
    that can re-merge in the same pass (l||r != l), so the
    accumulator fold IS leftmost-greedy."""
    parts = ["""
cur0 AS (
  SELECT array_to_string(regexp_extract_all(w, '.'), ' ') AS s FROM (
    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
    FROM documents) WHERE length(w) >= 2
)"""]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(f"""
pc{k} AS (
  SELECT toks[i] AS l, toks[i+1] AS r, COUNT(*) AS n
  FROM (SELECT string_split(s, ' ') AS toks FROM cur{p}),
       UNNEST(range(1, len(toks))) AS u(i)
  GROUP BY 1, 2
),
top{k} AS (
  SELECT {k} AS step, l, r, n FROM pc{k}
  ORDER BY n DESC, l ASC, r ASC LIMIT 1
),
cur{k} AS (
  SELECT list_reduce(string_split(c.s, ' '),
    (acc, t) -> CASE WHEN regexp_extract(acc, '[a-z]+$') = tk.l AND t = tk.r
                THEN regexp_replace(acc, '[a-z]+$', tk.lr)
                ELSE acc || ' ' || t END) AS s
  FROM cur{p} c, (SELECT l, r, l || r AS lr FROM top{k}) tk
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST(step AS INT) AS step, l AS left, r AS right,"
        f" CAST(n AS BIGINT) AS pair_count FROM top{k}"
        for k in range(1, n_merges + 1)
    )
    return "WITH " + ",".join(parts) + "\n" + union


@query("text_bpe_train", _bpe_train_oracle_sql(8))
def text_bpe_train(spark, sf_dir):
    """LEARN a BPE merge table over the document corpus (8 iterations
    of pair-count → deterministic argmax → corpus-wide leftmost-greedy
    merge; operators/text_analysis.bpe_train). Iterative by nature —
    each step's counts depend on the previous merge — so not
    SINGLE-SQL-expressible; graduated from rows-only to an EXACT
    oracle by generating one chained CTE per step
    (`_bpe_train_oracle_sql`): both engines run the identical
    count→argmax→greedy-merge fold, so the full 8-row merge table
    (step, left, right, pair_count) hash-matches. The algorithm is
    additionally pinned by a pure-Python reference-parity test."""
    from data_pipeline_001_spark.operators.text_analysis import bpe_train

    t = load_tables(spark, sf_dir)
    return bpe_train(t["documents"], n_merges=8)


_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) t
"""


@query("sql_lateral_topn", _LATERAL_SQL)
def sql_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery — top-2 account balances per nation
    as a per-row dependent subplan, the SQL-standard form users write
    instead of a rank window. Spark decorrelates it into a ranked
    join under the hood (DomainJoin rewrite), so it scales like the
    window twin rather than N point queries. The SAME SQL text runs on
    DuckDB as the oracle; deterministic via the (acctbal DESC, custkey
    ASC) tiebreak."""
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "sql_parameterized_exec",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders WHERE o_totalprice >= 150000.0
    GROUP BY o_orderpriority
    """,
)
def sql_parameterized_exec(spark, sf_dir):
    """Parameterized SQL via EXECUTE IMMEDIATE ... USING — the
    bind-variable surface of the reference's generic SQL client
    (pipeline_logic's cursor binds), executed natively instead of
    string interpolation (no injection surface, plan cache friendly).
    The oracle inlines the same literal."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
                  ROUND(SUM(o_totalprice), 2) AS revenue
           FROM orders WHERE o_totalprice >= ?
           GROUP BY o_orderpriority'
        USING 150000.0
        """
    )


_TAG_KEYWORDS = (
    "data", "model", "science", "market", "price",
    "research", "system", "energy", "health", "network",
)

_TAGS_ORACLE = """
WITH tagged AS (
  SELECT doc_id,
         list_filter({kw_list},
                     k -> regexp_matches(lower(text),
                                         '\\b' || k || '\\b')) AS tags
  FROM documents
)
SELECT doc_id,
       COALESCE(array_to_string(tags, ','), '') AS tags,
       CAST(length(tags) AS BIGINT) AS n_tags
FROM tagged
""".format(
    kw_list="[" + ", ".join(f"'{k}'" for k in _TAG_KEYWORDS) + "]"
)


@query("curation_keyword_tags", _TAGS_ORACLE)
def curation_keyword_tags(spark, sf_dir):
    """Dictionary-based topic tagging: match a (broadcast-literal)
    keyword list against each document with word-boundary regexes —
    the domain-labeling pass of a curation pipeline. The keyword array
    is a literal and the per-element match is a codegen ``filter`` HOF
    with ``regexp_like`` (one scan × |dict|; at a 10k-term dictionary
    this becomes one combined alternation regex or an Aho-Corasick
    pandas UDF — same output contract). Both engines use
    RE2-compatible ``\\b`` word boundaries; match order follows the
    dictionary, so the joined string is deterministic."""
    t = load_tables(spark, sf_dir)
    kw = F.array(*[F.lit(k) for k in _TAG_KEYWORDS])
    tags = F.filter(
        kw,
        lambda k: F.regexp_like(
            F.lower(F.col("text")),
            F.concat(F.lit("\\b"), k, F.lit("\\b")),
        ),
    )
    return t["documents"].select(
        "doc_id",
        F.array_join(tags, ",").alias("tags"),
        F.size(tags).cast("long").alias("n_tags"),
    )


# planted texts with zlib-level-6 ratios computed once and pinned as
# oracle literals (zlib is deterministic for a fixed level — the same
# closed-form-predicted-oracle pattern as the multimodal decoders):
# 'ab'*500 -> 18/1000, a 126-char prose sentence -> 103/126, four
# distinct sha256 hexdigests -> 158/256 (dyadic, rounds up at 6)
_ZLIB_PLANTED = (
    (-1, "ab" * 500, 0.018),
    (-2, "The quick brown fox jumps over the lazy dog while the "
         "cautious hound watches from the shade of an old oak tree "
         "near the river.", 0.81746),
    (-3, "".join(
        __import__("hashlib").sha256(f"spark-graft-{i}".encode()).hexdigest()
        for i in range(4)
    ), 0.617188),
)

_COMPRESS_ORACLE = """
SELECT doc_id,
       length(text) >= 200 AS len_ok,
       CASE WHEN length(text) >= 200 THEN TRUE END AS doubling_improves,
       CASE WHEN length(text) >= 50 THEN TRUE END AS ratio_in_range,
       CAST(NULL AS DOUBLE) AS ratio
FROM documents
UNION ALL
SELECT * FROM (VALUES
  (CAST(-1 AS BIGINT), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
   CAST(NULL AS BOOLEAN), 0.018),
  (CAST(-2 AS BIGINT), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
   CAST(NULL AS BOOLEAN), 0.81746),
  (CAST(-3 AS BIGINT), CAST(NULL AS BOOLEAN), CAST(NULL AS BOOLEAN),
   CAST(NULL AS BOOLEAN), 0.617188)
) v(doc_id, len_ok, doubling_improves, ratio_in_range, ratio)
"""


@query("text_compressibility", _COMPRESS_ORACLE)
def text_compressibility(spark, sf_dir):
    """Per-doc zlib compressibility (the Gopher-style repetitive-text
    quality signal), graduated from rows-only to a CONTRACT oracle:
    the raw ratio is zlib-level-specific so the corpus values are not
    SQL-expressible, but three things about them are checkable —

    * planted texts (fixed literals, doc_id −1/−2/−3) have exact
      pinned ratios: zlib level 6 is deterministic, so repetitive
      'ab'×500 → 0.018, a prose sentence → 0.81746, concatenated
      sha256 hexdigests → 0.617188 (repetitive ≪ the others);
    * ``doubling_improves`` — for every corpus doc ≥ 200 chars,
      ratio(text‖text) < ratio(text): the second copy back-references
      the first inside zlib's 32 KB window, so doubling redundancy
      must improve compressibility;
    * ``ratio_in_range`` — for docs ≥ 50 chars the ratio sits in
      (0, 1.3] (zlib's worst-case expansion bound).

    The per-doc ratio itself stays available through
    ``functions.udfs.zlib_compress_ratio`` (planted-ordering tests in
    tests/test_llm_operators.py)."""
    from data_pipeline_001_spark.functions.udfs import zlib_compress_ratio

    t = load_tables(spark, sf_dir)
    r1 = zlib_compress_ratio(F.col("text"))
    r2 = zlib_compress_ratio(F.concat(F.col("text"), F.col("text")))
    nb = F.lit(None).cast("boolean")
    corpus = t["documents"].select(
        "doc_id",
        (F.length("text") >= 200).alias("len_ok"),
        F.when(F.length("text") >= 200, r2 < r1).alias(
            "doubling_improves"
        ),
        F.when(F.length("text") >= 50, (r1 > 0) & (r1 <= 1.3)).alias(
            "ratio_in_range"
        ),
        F.lit(None).cast("double").alias("ratio"),
    )
    planted = spark.createDataFrame(
        [(i, s) for i, s, _ in _ZLIB_PLANTED], "doc_id long, text string"
    ).select(
        "doc_id",
        nb.alias("len_ok"),
        nb.alias("doubling_improves"),
        nb.alias("ratio_in_range"),
        F.round(zlib_compress_ratio(F.col("text")), 6).alias("ratio"),
    )
    return corpus.unionByName(planted)


_JSON_PROFILE_ORACLE = """
SELECT 'event_id' AS key, CAST(COUNT(*) AS BIGINT) AS n_present,
       CAST(COUNT(*) AS BIGINT) AS n_numeric FROM events
UNION ALL
SELECT 'event_type', CAST(COUNT(event_type) AS BIGINT),
       CAST(0 AS BIGINT) FROM events
UNION ALL
SELECT 'user_id', CAST(COUNT(user_id) AS BIGINT),
       CAST(COUNT(user_id) AS BIGINT) FROM events
UNION ALL
SELECT 'value', CAST(COUNT(value) AS BIGINT),
       CAST(COUNT(value) AS BIGINT) FROM events
"""


@query("json_schema_profile", _JSON_PROFILE_ORACLE)
def json_schema_profile(spark, sf_dir):
    """Schema-drift profile of a semi-structured export: serialize
    each event to JSON (``to_json`` drops NULL fields — the exact
    mechanism that makes downstream consumers see 'missing keys'),
    then profile the ACTUAL keys: presence count and how many values
    parse as numbers. One scan, dynamic keys via
    ``from_json(map<string,string>)`` + map explode — no per-key
    code, so the same query profiles any JSON column. The oracle
    states the closed-form expectation per field."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        F.to_json(
            F.struct("event_id", "event_type", "user_id", "value")
        ).alias("j")
    )
    kv = ev.select(
        F.explode(F.from_json("j", "map<string,string>")).alias("key", "v")
    )
    return kv.groupBy("key").agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.when(
                F.expr("try_cast(v AS double) IS NOT NULL"), 1
            ).otherwise(0)
        ).alias("n_numeric"),
    )


_SENT_ORACLE = r"""
WITH sents AS (
  SELECT doc_id,
         unnest(string_split(
           regexp_replace(text, '([.!?])\s+', '\1' || chr(1), 'g'),
           chr(1))) AS s
  FROM documents WHERE text IS NOT NULL
), clean AS (
  SELECT doc_id, trim(s) AS s FROM sents WHERE trim(s) <> ''
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_sentences,
       ROUND(AVG(CAST(length(s) AS DOUBLE)), 6) AS avg_sentence_chars,
       CAST(MAX(length(s)) AS BIGINT) AS max_sentence_chars
FROM clean GROUP BY doc_id
"""


@query("text_sentence_stats", _SENT_ORACLE)
def text_sentence_stats(spark, sf_dir):
    """Sentence segmentation + per-doc sentence statistics — the unit
    most chunkers/quality gates actually operate on. Segmentation is a
    marker rewrite (terminal punctuation + whitespace → punctuation +
    \x01) followed by a plain split — lookbehind-free so the SAME
    pattern runs on RE2 (DuckDB) and java.util.regex (Spark); the
    split stays one codegen projection, the only shuffle is the
    per-doc count agg."""
    t = load_tables(spark, sf_dir)
    marked = F.regexp_replace(
        F.col("text"), r"([.!?])\s+", "$1\u0001"
    )
    sents = t["documents"].where(F.col("text").isNotNull()).select(
        "doc_id",
        F.explode(F.split(marked, "\u0001")).alias("s"),
    ).select("doc_id", F.trim("s").alias("s")).where(F.col("s") != "")
    return sents.groupBy("doc_id").agg(
        F.count("*").alias("n_sentences"),
        F.round(F.avg(F.length("s").cast("double")), 6).alias(
            "avg_sentence_chars"
        ),
        F.max(F.length("s")).cast("long").alias("max_sentence_chars"),
    )


_FUNNEL_ORACLE = """
WITH a AS (
  SELECT user_id, MIN(ts) AS t_signup FROM events
  WHERE event_type = 'signup' AND user_id IS NOT NULL GROUP BY user_id
), b AS (
  SELECT e.user_id, MIN(e.ts) AS t_view
  FROM events e JOIN a USING (user_id)
  WHERE e.event_type = 'view' AND e.ts > a.t_signup GROUP BY e.user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN b USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > b.t_view GROUP BY e.user_id
)
SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS n_signup,
       CAST((SELECT COUNT(*) FROM b) AS BIGINT) AS n_then_view,
       CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_then_purchase,
       ROUND((SELECT COUNT(*) FROM b) * 1.0
             / NULLIF((SELECT COUNT(*) FROM a), 0), 6) AS conv_view,
       ROUND((SELECT COUNT(*) FROM c) * 1.0
             / NULLIF((SELECT COUNT(*) FROM b), 0), 6) AS conv_purchase
"""


@query("window_funnel_conversion", _FUNNEL_ORACLE)
def window_funnel_conversion(spark, sf_dir):
    """STRICTLY-ORDERED funnel (signup → later view → later purchase):
    stage k counts users whose earliest stage-k event follows their
    earliest completion of stage k-1 — the product-analytics funnel
    that window_user_paths (adjacent pairs) cannot express. One scan:
    conditional min-timestamp aggregation per user, then the stage
    chain is evaluated on the per-user row (no joins, no re-scan) and
    collapsed to one global summary row."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        *[
            F.sort_array(
                F.collect_list(
                    F.when(F.col("event_type") == step, F.col("ts"))
                )
            ).alias(f"ts_{step}")
            for step in ("view", "purchase")
        ],
    )
    # earliest view AFTER signup: first element of the sorted view
    # timestamps greater than t_signup (codegen filter + element_at)
    # try_element_at: an empty filtered array (no qualifying view)
    # yields NULL instead of ANSI's out-of-bounds error
    t_view = F.try_element_at(
        F.filter(
            F.col("ts_view"), lambda x: x > F.col("t_signup")
        ),
        F.lit(1),
    )
    per_user = per_user.withColumn("t_view", t_view)
    t_purchase = F.try_element_at(
        F.filter(
            F.col("ts_purchase"), lambda x: x > F.col("t_view")
        ),
        F.lit(1),
    )
    per_user = per_user.withColumn("t_purchase", t_purchase)
    return per_user.agg(
        F.count("t_signup").alias("n_signup"),
        F.count(
            F.when(F.col("t_signup").isNotNull(), F.col("t_view"))
        ).alias("n_then_view"),
        F.count(
            F.when(
                F.col("t_signup").isNotNull()
                & F.col("t_view").isNotNull(),
                F.col("t_purchase"),
            )
        ).alias("n_then_purchase"),
    ).select(
        "n_signup",
        "n_then_view",
        "n_then_purchase",
        F.round(
            F.col("n_then_view")
            / F.nullif(F.col("n_signup"), F.lit(0)),
            6,
        ).alias("conv_view"),
        F.round(
            F.col("n_then_purchase")
            / F.nullif(F.col("n_then_view"), F.lit(0)),
            6,
        ).alias("conv_purchase"),
    )


_RETENTION_ORACLE = """
WITH firsts AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), cohorts AS (
  SELECT user_id,
         CAST(date_trunc('week', first_day) AS DATE) AS cohort_week
  FROM firsts
), activity AS (
  SELECT DISTINCT e.user_id, c.cohort_week,
         CAST(floor(date_diff('day', c.cohort_week,
                              CAST(e.ts AS DATE)) / 7.0) AS BIGINT)
           AS age_week
  FROM events e JOIN cohorts c USING (user_id)
  WHERE e.user_id IS NOT NULL
), sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_users FROM cohorts
  GROUP BY cohort_week
)
SELECT a.cohort_week, a.age_week,
       CAST(COUNT(*) AS BIGINT) AS active_users,
       CAST(s.cohort_users AS BIGINT) AS cohort_users,
       ROUND(COUNT(*) * 1.0 / s.cohort_users, 6) AS retention
FROM activity a JOIN sizes s USING (cohort_week)
GROUP BY a.cohort_week, a.age_week, s.cohort_users
"""


@query("agg_retention_cohorts", _RETENTION_ORACLE)
def agg_retention_cohorts(spark, sf_dir):
    """Weekly retention-cohort matrix: users grouped by first-seen
    week, retention = share active in each subsequent age week — the
    classic growth-analytics triangle. Plan: one scan derives
    first-seen days (agg), cohort assignment broadcasts back onto the
    event scan, distinct (user, cohort, age) collapses map-side, and
    cohort sizes broadcast into the final ratio — the fact table
    shuffles once, on user_id."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    cohorts = firsts.select(
        "user_id",
        F.date_trunc("week", "first_day").cast("date").alias("cohort_week"),
    )
    activity = (
        ev.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_week"))
                / 7.0
            )
            .cast("long")
            .alias("age_week"),
        )
        .distinct()
    )
    sizes = cohorts.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_users")
    )
    return (
        activity.groupBy("cohort_week", "age_week")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "age_week",
            "active_users",
            F.col("cohort_users").cast("long").alias("cohort_users"),
            F.round(
                F.col("active_users") / F.col("cohort_users"), 6
            ).alias("retention"),
        )
    )


_RFM_ORACLE = """
WITH anchor AS (
  SELECT MAX(CAST(ts AS DATE)) AS max_day FROM events
), per_user AS (
  SELECT e.user_id,
         date_diff('day', MAX(CAST(e.ts AS DATE)), a.max_day)
           AS recency_days,
         COUNT(*) AS frequency,
         ROUND(SUM(CASE WHEN e.event_type = 'purchase'
                        THEN COALESCE(e.value, 0) ELSE 0 END), 2)
           AS monetary
  FROM events e CROSS JOIN anchor a
  WHERE e.user_id IS NOT NULL
  GROUP BY e.user_id, a.max_day
), scored AS (
  SELECT user_id, recency_days, frequency, monetary,
         NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS r_q,
         NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
         NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
  FROM per_user
)
SELECT r_q, f_q, m_q,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(AVG(CAST(recency_days AS DOUBLE)), 6) AS avg_recency,
       ROUND(AVG(CAST(frequency AS DOUBLE)), 6) AS avg_frequency,
       ROUND(AVG(monetary), 6) AS avg_monetary
FROM scored GROUP BY r_q, f_q, m_q
"""


@query("agg_rfm_segmentation", _RFM_ORACLE)
def agg_rfm_segmentation(spark, sf_dir):
    """RFM (recency/frequency/monetary) quartile segmentation — the
    classic customer-value matrix. One fact shuffle (per-user agg);
    the three NTILE windows run over the per-USER table (orders of
    magnitude smaller than events), with user_id tiebreaks so quartile
    boundaries are engine-deterministic; the max-day anchor broadcasts
    as a scalar. Segment-level output (≤64 rows) keeps the result
    bounded. The exact NTILE is a global sort — fine while the user
    table fits one task's sort budget; past ~10⁸ users swap the exact
    quartiles for approx_percentile cut points exactly as
    ``agg_equidepth_bins_approx`` does (documented scale twin)."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("max_day"))
    per_user = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy("user_id", "max_day")
        .agg(
            F.datediff(
                F.col("max_day"), F.max(F.col("ts").cast("date"))
            ).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.round(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.coalesce("value", F.lit(0.0)),
                    ).otherwise(0.0)
                ),
                2,
            ).alias("monetary"),
        )
    )
    scored = per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("user_id")))
        .alias("r_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("user_id")))
        .alias("f_q"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary"), F.asc("user_id")))
        .alias("m_q"),
    )
    return scored.groupBy("r_q", "f_q", "m_q").agg(
        F.count("*").alias("n_users"),
        F.round(F.avg(F.col("recency_days").cast("double")), 6).alias(
            "avg_recency"
        ),
        F.round(F.avg(F.col("frequency").cast("double")), 6).alias(
            "avg_frequency"
        ),
        F.round(F.avg("monetary"), 6).alias("avg_monetary"),
    )


_ARRIVAL_ORACLE = """
WITH seq AS (
  SELECT event_type,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
)
SELECT event_type,
       CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(gap_s, 0.5), 6) AS p50_gap_s,
       ROUND(quantile_cont(gap_s, 0.95), 6) AS p95_gap_s,
       ROUND(AVG(CAST(gap_s AS DOUBLE)), 6) AS mean_gap_s
FROM seq WHERE gap_s IS NOT NULL GROUP BY event_type
"""


@query("time_interarrival_stats", _ARRIVAL_ORACLE)
def time_interarrival_stats(spark, sf_dir):
    """Inter-arrival-time distribution per event type (LAG gap +
    exact percentiles) — the load-model input for capacity planning
    and anomaly thresholds. One window shuffle on event_type, then a
    per-type exact-percentile aggregate over the (bounded-cardinality)
    groups; (ts, event_id) tiebreak pins the gap sequence."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    gaps = t["events"].select(
        "event_type",
        (
            F.unix_timestamp(F.col("ts"))
            - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(
            F.expr("percentile(gap_s, 0.5)"), 6
        ).alias("p50_gap_s"),
        F.round(
            F.expr("percentile(gap_s, 0.95)"), 6
        ).alias("p95_gap_s"),
        F.round(F.avg(F.col("gap_s").cast("double")), 6).alias(
            "mean_gap_s"
        ),
    )


_SEASONALITY_ORACLE = """
SELECT CAST(isodow(ts) AS BIGINT) AS dow,
       CAST(hour(ts) AS BIGINT) AS hod,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(AVG(COALESCE(value, 0)), 6) AS avg_value
FROM events GROUP BY isodow(ts), hour(ts)
"""


@query("time_seasonality_matrix", _SEASONALITY_ORACLE)
def time_seasonality_matrix(spark, sf_dir):
    """Day-of-week × hour-of-day load matrix (the ops heatmap):
    counts, distinct users, average value per cell. One map-side-
    combined aggregate; 168 output cells regardless of corpus size.
    Week numbering is the cross-engine trap: Spark dayofweek is
    1=Sunday, DuckDB's is 0=Sunday — both sides use ISO weekday
    (Monday=1) instead: Spark weekday()+1 == DuckDB isodow()."""
    t = load_tables(spark, sf_dir)
    return t["events"].groupBy(
        (F.weekday("ts") + 1).cast("long").alias("dow"),
        F.hour("ts").cast("long").alias("hod"),
    ).agg(
        F.count("*").alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(F.avg(F.coalesce("value", F.lit(0.0))), 6).alias(
            "avg_value"
        ),
    )


_TEMPORAL_ORACLE = """
WITH ordered AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         LAG(o_orderdate) OVER w AS prev_ts,
         LAG(o_orderpriority) OVER w AS prev_attr
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
versions AS (
  SELECT o_custkey, o_orderpriority, o_orderdate FROM ordered
  WHERE prev_ts IS NULL OR prev_attr IS DISTINCT FROM o_orderpriority),
dim AS (
  SELECT o_custkey, o_orderpriority,
         o_orderdate AS valid_from,
         LEAD(o_orderdate) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate) AS valid_to
  FROM versions)
SELECT d.o_orderpriority AS priority_at_ship,
       o.o_orderpriority AS priority_at_order,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN dim d ON d.o_custkey = o.o_custkey
          AND d.valid_from <= l.l_shipdate
          AND (d.valid_to IS NULL OR l.l_shipdate < d.valid_to)
GROUP BY d.o_orderpriority, o.o_orderpriority
"""


@query("join_temporal_dimension", _TEMPORAL_ORACLE)
def join_temporal_dimension(spark, sf_dir):
    """POINT-IN-TIME dimension join: each lineitem is enriched with
    the customer's priority version valid AT SHIP TIME ([valid_from,
    valid_to) interval from the SCD2 dimension) and compared with the
    priority at order time — the feature-store lookup that prevents
    training-data leakage (joining 'current' attributes backfills the
    future into history). Plan: the SCD2 build shuffles once on
    custkey; the temporal join is an EQUI-join on custkey with the
    interval as a post-join filter (never a cross product — asserted
    shape class in test_plan_shape); the summary collapses to ≤25
    rows."""
    from data_pipeline_001_spark.operators.relational import (
        scd2_from_changelog,
    )

    t = load_tables(spark, sf_dir)
    dim = scd2_from_changelog(
        t["orders"].select(
            "o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority"
        ),
        key_cols=("o_custkey",),
        ts_col="o_orderdate",
        attr_cols=("o_orderpriority",),
        seq_col="o_orderkey",
    ).select(
        F.col("o_custkey").alias("d_custkey"),
        F.col("o_orderpriority").alias("priority_at_ship"),
        "valid_from",
        "valid_to",
    )
    li = t["lineitem"].select(
        "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = t["orders"].select("o_orderkey", "o_custkey", "o_orderpriority")
    enriched = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(
            dim,
            (F.col("d_custkey") == F.col("o_custkey"))
            & (F.col("valid_from") <= F.col("l_shipdate"))
            & (
                F.col("valid_to").isNull()
                | (F.col("l_shipdate") < F.col("valid_to"))
            ),
        )
    )
    return enriched.groupBy(
        "priority_at_ship",
        F.col("o_orderpriority").alias("priority_at_order"),
    ).agg(
        F.count("*").alias("n_lineitems"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
    )


_AB_ORACLE = """
WITH assigned AS (
  SELECT user_id,
         CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), arms AS (
  SELECT arm, COUNT(*) AS n_users, SUM(converted) AS n_converted,
         AVG(CAST(converted AS DOUBLE)) AS rate
  FROM assigned GROUP BY arm
)
SELECT a.n_users AS n_a, b.n_users AS n_b,
       CAST(a.n_converted AS BIGINT) AS conv_a,
       CAST(b.n_converted AS BIGINT) AS conv_b,
       ROUND(a.rate, 6) AS rate_a, ROUND(b.rate, 6) AS rate_b,
       ROUND(b.rate / NULLIF(a.rate, 0) - 1, 6) AS lift,
       ROUND((b.rate - a.rate)
             / NULLIF(sqrt(
                 ((a.n_converted + b.n_converted) * 1.0
                  / (a.n_users + b.n_users))
                 * (1 - (a.n_converted + b.n_converted) * 1.0
                        / (a.n_users + b.n_users))
                 * (1.0 / a.n_users + 1.0 / b.n_users)), 0),
             6) AS z_score
FROM (SELECT * FROM arms WHERE arm = 'A') a
CROSS JOIN (SELECT * FROM arms WHERE arm = 'B') b
"""


@query("agg_ab_experiment_lift", _AB_ORACLE)
def agg_ab_experiment_lift(spark, sf_dir):
    """Deterministic A/B analysis: hash-stable arm assignment (md5 of
    the user id — the same append-stable trick as the train/holdout
    split, so re-runs and late data never flip arms), per-arm purchase
    conversion, lift, and the two-proportion z-score. One scan + one
    per-user agg; the two 1-row arm summaries broadcast into the final
    comparison row."""
    t = load_tables(spark, sf_dir)
    ev = t["events"].where(F.col("user_id").isNotNull())
    assigned = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        F.when(
            F.ascii(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 1)
            )
            % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("arm"),
        "converted",
    )
    arms = assigned.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("converted").alias("n_converted"),
        F.avg(F.col("converted").cast("double")).alias("rate"),
    )
    a = arms.where(F.col("arm") == "A").select(
        F.col("n_users").alias("n_a"),
        F.col("n_converted").alias("conv_a"),
        F.col("rate").alias("rate_a"),
    )
    b = arms.where(F.col("arm") == "B").select(
        F.col("n_users").alias("n_b"),
        F.col("n_converted").alias("conv_b"),
        F.col("rate").alias("rate_b"),
    )
    pooled = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        F.col("conv_a").cast("long").alias("conv_a"),
        F.col("conv_b").cast("long").alias("conv_b"),
        F.round("rate_a", 6).alias("rate_a"),
        F.round("rate_b", 6).alias("rate_b"),
        F.round(
            F.col("rate_b") / F.nullif(F.col("rate_a"), F.lit(0.0)) - 1, 6
        ).alias("lift"),
        F.round(
            (F.col("rate_b") - F.col("rate_a"))
            / F.nullif(
                F.sqrt(
                    pooled
                    * (1 - pooled)
                    * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
                ),
                F.lit(0.0),
            ),
            6,
        ).alias("z_score"),
    )


_TTC_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
), converted AS (
  SELECT date_diff('second', t_signup, t_purchase) AS ttc_s
  FROM per_user
  WHERE t_signup IS NOT NULL AND t_purchase IS NOT NULL
    AND t_purchase >= t_signup
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       ROUND(quantile_cont(ttc_s, 0.5), 6) AS p50_ttc_s,
       ROUND(quantile_cont(ttc_s, 0.9), 6) AS p90_ttc_s,
       ROUND(AVG(CAST(ttc_s AS DOUBLE)), 6) AS mean_ttc_s
FROM converted
"""


@query("time_to_convert_stats", _TTC_ORACLE)
def time_to_convert_stats(spark, sf_dir):
    """Time-to-convert distribution (first signup → first purchase):
    the latency companion to the ordered funnel — exact p50/p90/mean
    over converting users. One per-user conditional-min aggregate,
    then one exact-percentile pass over the (bounded) converted set."""
    t = load_tables(spark, sf_dir)
    per_user = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("t_signup"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_purchase"),
        )
    )
    conv = per_user.where(
        F.col("t_signup").isNotNull()
        & F.col("t_purchase").isNotNull()
        & (F.col("t_purchase") >= F.col("t_signup"))
    ).select(
        (
            F.unix_timestamp("t_purchase") - F.unix_timestamp("t_signup")
        ).alias("ttc_s")
    )
    return conv.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(ttc_s, 0.5)"), 6).alias("p50_ttc_s"),
        F.round(F.expr("percentile(ttc_s, 0.9)"), 6).alias("p90_ttc_s"),
        F.round(F.avg(F.col("ttc_s").cast("double")), 6).alias(
            "mean_ttc_s"
        ),
    )


# ---------------------------------------------------------------------
# Statistical profiling batch (round-4 continuation): correlation
# matrix, robust outlier detection, market-basket pairs, mutual
# information, and PMI bigrams. Reference parity: these extend the
# reference's count/histogram reconciliation surface
# (pipeline_logic/*) with the column-statistics layer a training-data
# pipeline needs before trusting a 100 TB corpus.
# ---------------------------------------------------------------------

_CORR_COLS = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]

_CORR_ORACLE = """
WITH s AS (
  SELECT {exprs}
  FROM lineitem
)
{unions}
"""


def _corr_oracle() -> str:
    pairs = [
        (x, y)
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    ]
    exprs = ",\n         ".join(
        f"ROUND(corr({x}, {y}), 6) AS c_{i}" for i, (x, y) in enumerate(pairs)
    )
    unions = "\nUNION ALL\n".join(
        f"SELECT '{x}' AS x_col, '{y}' AS y_col, c_{i} AS corr_r FROM s"
        for i, (x, y) in enumerate(pairs)
    )
    return _CORR_ORACLE.format(exprs=exprs, unions=unions)


@query("stats_corr_matrix", _corr_oracle())
def stats_corr_matrix(spark, sf_dir):
    """Pearson correlation matrix (upper triangle, long form) over the
    lineitem numeric measures. One full scan computes all six
    coefficients as map-side-combinable aggregates (corr is
    algebraic: sums of x, y, x2, y2, xy), then a 1-row ``stack``
    unpivots to long form — no per-pair rescans, no shuffle beyond
    the single scalar aggregation."""
    t = load_tables(spark, sf_dir)
    pairs = [
        (x, y)
        for i, x in enumerate(_CORR_COLS)
        for y in _CORR_COLS[i + 1 :]
    ]
    one = t["lineitem"].agg(
        *[
            F.round(F.corr(x, y), 6).alias(f"c_{i}")
            for i, (x, y) in enumerate(pairs)
        ]
    )
    stack = ", ".join(
        f"'{x}', '{y}', c_{i}" for i, (x, y) in enumerate(pairs)
    )
    return one.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (x_col, y_col, corr_r)"
    )


_MAD_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, ROUND(SUM(value), 6) AS rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
), med AS (
  SELECT ROUND(quantile_cont(rev, 0.5), 6) AS med_rev FROM daily
), dev AS (
  SELECT ROUND(ABS(d.rev - m.med_rev), 6) AS adev, m.med_rev
  FROM daily d CROSS JOIN med m
), mad AS (
  SELECT ROUND(quantile_cont(adev, 0.5), 6) AS mad_rev FROM dev
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       MIN(d.med_rev) AS med_rev,
       MIN(a.mad_rev) AS mad_rev,
       CAST(SUM(CASE WHEN d.adev > ROUND(3.5 * a.mad_rev / 0.6745, 6)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier_days
FROM dev d CROSS JOIN mad a
"""


@query("stats_mad_outliers", _MAD_ORACLE)
def stats_mad_outliers(spark, sf_dir):
    """Robust outlier detection on daily purchase revenue via median
    absolute deviation (modified z-score, Iglewicz-Hoaglin 3.5
    cutoff). The daily series is bounded by the calendar (one row per
    day regardless of event volume), so the two scalar passes
    (median, then MAD) broadcast 1-row aggregates back over it —
    the only full-data scan is the first groupBy day."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.round(F.sum("value"), 6).alias("rev"))
    )
    med = daily.agg(
        F.round(F.expr("percentile(rev, 0.5)"), 6).alias("med_rev")
    )
    dev = daily.crossJoin(F.broadcast(med)).select(
        F.round(F.abs(F.col("rev") - F.col("med_rev")), 6).alias("adev"),
        "med_rev",
    )
    mad = dev.agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad_rev")
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .agg(
            F.count("*").alias("n_days"),
            F.min("med_rev").alias("med_rev"),
            F.min("mad_rev").alias("mad_rev"),
            F.sum(
                F.when(
                    F.col("adev")
                    > F.round(F.col("mad_rev") * 3.5 / 0.6745, 6),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_outlier_days"),
        )
    )


_PAIR_ORACLE = """
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
  FROM basket
), item AS (
  SELECT l_partkey, COUNT(*) AS item_cnt FROM basket GROUP BY 1
), pair AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(COUNT(*) AS BIGINT) AS pair_cnt
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.p1, p.p2, p.pair_cnt,
       ROUND(p.pair_cnt / n.n_orders, 6) AS support,
       ROUND(p.pair_cnt * n.n_orders / (i1.item_cnt * i2.item_cnt), 6)
         AS lift
FROM pair p
JOIN item i1 ON i1.l_partkey = p.p1
JOIN item i2 ON i2.l_partkey = p.p2
CROSS JOIN n
ORDER BY p.pair_cnt DESC, p.p1, p.p2
LIMIT 20
"""


@query("itemset_part_pairs", _PAIR_ORACLE)
def itemset_part_pairs(spark, sf_dir):
    """Market-basket pair mining: top co-occurring part pairs within
    an order, with support and lift. The self-join is keyed on
    l_orderkey, so candidate pairs are bounded by per-order basket
    size (≤7 lines in TPC-H shape — never O(n²) in rows); item
    frequencies and the order count broadcast back onto the bounded
    pair table."""
    t = load_tables(spark, sf_dir)
    basket = t["lineitem"].select("l_orderkey", "l_partkey").distinct()
    n = basket.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_orders")
    )
    item = basket.groupBy("l_partkey").agg(F.count("*").alias("item_cnt"))
    a = basket.alias("a")
    b = basket.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"),
            F.col("b.l_partkey").alias("p2"),
        )
        .agg(F.count("*").alias("pair_cnt"))
    )
    out = (
        pair.join(
            F.broadcast(item.withColumnRenamed("item_cnt", "c1")),
            pair.p1 == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .join(
            F.broadcast(item.withColumnRenamed("item_cnt", "c2")),
            F.col("p2") == F.col("l_partkey"),
        )
        .drop("l_partkey")
        .crossJoin(F.broadcast(n))
        .select(
            "p1",
            "p2",
            "pair_cnt",
            F.round(F.col("pair_cnt") / F.col("n_orders"), 6).alias(
                "support"
            ),
            F.round(
                F.col("pair_cnt")
                * F.col("n_orders")
                / (F.col("c1") * F.col("c2")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.desc("pair_cnt"), F.asc("p1"), F.asc("p2")
    ).limit(20)


_MI_ORACLE = """
WITH cell AS (
  SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS c
  FROM documents GROUP BY 1, 2
), m AS (
  SELECT lang, source, c,
         SUM(c) OVER (PARTITION BY lang)   AS cl,
         SUM(c) OVER (PARTITION BY source) AS cs,
         SUM(c) OVER ()                    AS n
  FROM cell
)
SELECT CAST(MIN(n) AS BIGINT) AS n_docs,
       ROUND(SUM((c / n) * LN(c * n / (cl * cs))), 6) AS mi_nats,
       ROUND(-SUM((c / n) * LN(cl / n)), 6) AS h_lang,
       ROUND(-SUM((c / n) * LN(cs / n)), 6) AS h_source
FROM m
"""


@query("stats_mutual_information", _MI_ORACLE)
def stats_mutual_information(spark, sf_dir):
    """Mutual information (nats) between the lang and source columns
    of the document corpus, plus the marginal entropies — the
    standard check that a sampling or split strategy didn't couple
    two supposedly-independent facets. One groupBy builds the
    contingency cells; margins come from window sums over the
    bounded cell table (|langs|×|sources| rows), never a rescan."""
    t = load_tables(spark, sf_dir)
    cell = (
        t["documents"]
        .groupBy("lang", "source")
        .agg(F.count("*").cast("double").alias("c"))
    )
    m = cell.select(
        "c",
        F.sum("c").over(Window.partitionBy("lang")).alias("cl"),
        F.sum("c").over(Window.partitionBy("source")).alias("cs"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    return m.agg(
        F.min("n").cast("bigint").alias("n_docs"),
        F.round(
            F.sum(
                (F.col("c") / F.col("n"))
                * F.log(F.col("c") * F.col("n") / (F.col("cl") * F.col("cs")))
            ),
            6,
        ).alias("mi_nats"),
        F.round(
            -F.sum((F.col("c") / F.col("n")) * F.log(F.col("cl") / F.col("n"))),
            6,
        ).alias("h_lang"),
        F.round(
            -F.sum((F.col("c") / F.col("n")) * F.log(F.col("cs") / F.col("n"))),
            6,
        ).alias("h_source"),
    )


_PMI_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(tk, 1) AS INT) AS pos,
         unnest(tk) AS tok
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '[a-z]+') AS tk
        FROM documents)
), bi AS (
  SELECT tok AS w1,
         LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
), bic AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2
), uni AS (
  SELECT tok, CAST(COUNT(*) AS DOUBLE) AS c FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c_xy) AS DOUBLE) AS n_bi FROM bic
), utot AS (
  SELECT SUM(c) AS n_uni FROM uni
)
SELECT b.w1, b.w2, b.c_xy,
       ROUND(LN((b.c_xy / t.n_bi)
                / ((u1.c / u.n_uni) * (u2.c / u.n_uni))), 6) AS pmi
FROM bic b
JOIN uni u1 ON u1.tok = b.w1
JOIN uni u2 ON u2.tok = b.w2
CROSS JOIN tot t CROSS JOIN utot u
ORDER BY b.c_xy DESC, b.w1, b.w2
LIMIT 15
"""


@query("text_pmi_bigrams", _PMI_ORACLE)
def text_pmi_bigrams(spark, sf_dir):
    """Pointwise mutual information of adjacent word bigrams over the
    document corpus — the collocation statistic used to decide
    tokenizer merges and phrase vocabularies. Bigrams come from a
    LEAD window per document (no self-join); unigram counts
    broadcast back onto the bounded bigram-count table. Tokenization
    (`regexp_extract_all(lower(text), '[a-z]+')`) matches the BPE
    and word-count queries byte-for-byte across both engines."""
    t = load_tables(spark, sf_dir)
    toks = (
        t["documents"]
        .select(
            "doc_id",
            F.posexplode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("pos", "tok"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = toks.select(
        F.col("tok").alias("w1"), F.lead("tok").over(w).alias("w2")
    ).where(F.col("w2").isNotNull())
    bic = bi.groupBy("w1", "w2").agg(F.count("*").alias("c_xy"))
    uni = toks.groupBy("tok").agg(F.count("*").cast("double").alias("c"))
    tot = bic.agg(F.sum("c_xy").cast("double").alias("n_bi"))
    utot = uni.agg(F.sum("c").alias("n_uni"))
    out = (
        bic.join(
            F.broadcast(uni.withColumnRenamed("c", "c1")),
            bic.w1 == F.col("tok"),
        )
        .drop("tok")
        .join(
            F.broadcast(uni.withColumnRenamed("c", "c2")),
            F.col("w2") == F.col("tok"),
        )
        .drop("tok")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(utot))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy") / F.col("n_bi"))
                    / (
                        (F.col("c1") / F.col("n_uni"))
                        * (F.col("c2") / F.col("n_uni"))
                    )
                ),
                6,
            ).alias("pmi"),
        )
    )
    return out.orderBy(
        F.desc("c_xy"), F.asc("w1"), F.asc("w2")
    ).limit(15)


# ---------------------------------------------------------------------
# Behavioral / corpus-health batch: bounce rate, chi-squared
# independence, Pareto concentration, hapax vocabulary stats.
# ---------------------------------------------------------------------

_BOUNCE_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE user_id IS NOT NULL
), flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                OR epoch(ts) - epoch(prev_ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM ordered
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), per_sess AS (
  SELECT user_id, sid,
         CAST(MIN(ts) AS DATE) AS d,
         COUNT(*) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT d,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bounces,
       ROUND(AVG(CASE WHEN n_events = 1 THEN 1.0 ELSE 0.0 END), 6)
         AS bounce_rate
FROM per_sess GROUP BY 1 ORDER BY 1
"""


@query("events_bounce_rate", _BOUNCE_ORACLE)
def events_bounce_rate(spark, sf_dir):
    """Daily bounce rate over 30-minute-gap sessions: the engagement
    health metric on top of the sessionizer. One shuffle by user_id
    drives both windows (lag for the gap flag, running sum for the
    session id); the per-session rollup reuses the same partitioning
    — at 100 TB this is a single user-keyed exchange, and the daily
    output is calendar-bounded."""
    t = load_tables(spark, sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            F.when(
                F.lag("ts").over(w_ord).isNull()
                | (
                    F.col("ts").cast("double")
                    - F.lag("ts").over(w_ord).cast("double")
                    > 1800
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("new_s"),
        )
        .select(
            "user_id", "ts", F.sum("new_s").over(w_run).alias("sid")
        )
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        F.min("ts").cast("date").alias("d"),
        F.count("*").alias("n_events"),
    )
    return (
        per_sess.groupBy("d")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum(
                F.when(F.col("n_events") == 1, 1).otherwise(0)
            ).alias("n_bounces"),
            F.round(
                F.avg(
                    F.when(F.col("n_events") == 1, 1.0).otherwise(0.0)
                ),
                6,
            ).alias("bounce_rate"),
        )
        .orderBy("d")
    )


_CHI2_ORACLE = """
WITH cell AS (
  SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS o
  FROM documents GROUP BY 1, 2
), m AS (
  SELECT o,
         SUM(o) OVER (PARTITION BY lang)   AS rl,
         SUM(o) OVER (PARTITION BY source) AS cs,
         SUM(o) OVER ()                    AS n
  FROM cell
), dims AS (
  SELECT COUNT(DISTINCT lang) AS r, COUNT(DISTINCT source) AS c
  FROM documents
)
SELECT CAST(MIN(m.n) AS BIGINT) AS n_docs,
       ROUND(SUM((m.o - m.rl * m.cs / m.n)
                 * (m.o - m.rl * m.cs / m.n)
                 / (m.rl * m.cs / m.n))
             + (MIN(m.n) - SUM(m.rl * m.cs / m.n)), 6) AS chi2,
       CAST((d.r - 1) * (d.c - 1) AS BIGINT) AS dof,
       ROUND(SQRT((SUM((m.o - m.rl * m.cs / m.n)
                       * (m.o - m.rl * m.cs / m.n)
                       / (m.rl * m.cs / m.n))
                   + (MIN(m.n) - SUM(m.rl * m.cs / m.n)))
                  / (MIN(m.n) * LEAST(d.r - 1, d.c - 1))), 6)
         AS cramers_v
FROM m CROSS JOIN dims d
GROUP BY d.r, d.c
"""


@query("stats_chi_squared", _CHI2_ORACLE)
def stats_chi_squared(spark, sf_dir):
    """Chi-squared independence statistic and Cramér's V for the
    lang × source contingency — the categorical-coupling companion
    to stats_mutual_information (observed-vs-expected form rather
    than information form). Same bounded-cell window-margin plan:
    expected counts never require a second corpus scan.

    Note: a chi-squared cell with zero observed count contributes
    E(cell) to the statistic; groupBy drops empty cells, so the
    missing-cell mass is added via the closed form
    Σ_cells_obs (O-E)²/E + (N - Σ_cells_obs E), since Σ_all E = N.
    Both engines compute over observed cells and add the correction
    identically."""
    t = load_tables(spark, sf_dir)
    cell = (
        t["documents"]
        .groupBy("lang", "source")
        .agg(F.count("*").cast("double").alias("o"))
    )
    m = cell.select(
        "o",
        F.sum("o").over(Window.partitionBy("lang")).alias("rl"),
        F.sum("o").over(Window.partitionBy("source")).alias("cs"),
        F.sum("o").over(Window.partitionBy()).alias("n"),
    )
    dims = t["documents"].agg(
        F.countDistinct("lang").alias("r"),
        F.countDistinct("source").alias("c"),
    )
    e = F.col("rl") * F.col("cs") / F.col("n")
    # observed-cell sum plus the closed-form mass of groupBy-dropped
    # empty cells: Σ_missing E = N - Σ_obs E
    chi_obs = F.sum((F.col("o") - e) * (F.col("o") - e) / e) + (
        F.min("n") - F.sum(e)
    )
    return (
        m.crossJoin(F.broadcast(dims))
        .groupBy("r", "c")
        .agg(
            F.min("n").cast("bigint").alias("n_docs"),
            F.round(chi_obs, 6).alias("chi2"),
            ((F.col("r") - 1) * (F.col("c") - 1))
            .cast("bigint")
            .alias("dof"),
            F.round(
                F.sqrt(
                    chi_obs
                    / (
                        F.min("n")
                        * F.least(F.col("r") - 1, F.col("c") - 1)
                    )
                ),
                6,
            ).alias("cramers_v"),
        )
        .drop("r", "c")
    )


_PARETO_ORACLE = """
WITH cust AS (
  SELECT o_custkey, ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY 1
), ranked AS (
  SELECT rev,
         ROW_NUMBER() OVER (ORDER BY rev DESC, o_custkey) AS rn,
         SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                        ROWS UNBOUNDED PRECEDING) AS cum_rev,
         COUNT(*) OVER () AS n,
         SUM(rev) OVER () AS total
  FROM cust
)
SELECT CAST(MIN(n) AS BIGINT) AS n_customers,
       ROUND(MAX(CASE WHEN rn <= CEIL(0.01 * n) THEN cum_rev END)
             / MIN(total), 6) AS share_top1,
       ROUND(MAX(CASE WHEN rn <= CEIL(0.10 * n) THEN cum_rev END)
             / MIN(total), 6) AS share_top10,
       ROUND(MAX(CASE WHEN rn <= CEIL(0.20 * n) THEN cum_rev END)
             / MIN(total), 6) AS share_top20
FROM ranked
"""


@query("agg_pareto_share", _PARETO_ORACLE)
def agg_pareto_share(spark, sf_dir):
    """Pareto revenue concentration: the share of total order revenue
    contributed by the top 1/10/20 % of customers — the
    concentration diagnostic next to agg_gini_concentration. The
    global rank is one exchange over the per-customer rollup (one
    row per customer, already ≪ the fact table); ties broken by
    custkey for cross-engine determinism."""
    t = load_tables(spark, sf_dir)
    cust = t["orders"].groupBy("o_custkey").agg(
        F.round(F.sum("o_totalprice"), 6).alias("rev")
    )
    w = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
    ranked = cust.select(
        "rev",
        F.row_number().over(w).alias("rn"),
        F.sum("rev")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_rev"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        F.sum("rev").over(Window.partitionBy()).alias("total"),
    )

    def share(frac):
        return F.round(
            F.max(
                F.when(
                    F.col("rn") <= F.ceil(F.lit(frac) * F.col("n")),
                    F.col("cum_rev"),
                )
            )
            / F.min("total"),
            6,
        )

    return ranked.agg(
        F.min("n").cast("bigint").alias("n_customers"),
        share(0.01).alias("share_top1"),
        share(0.10).alias("share_top10"),
        share(0.20).alias("share_top20"),
    )


_HAPAX_ORACLE = """
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS tok
  FROM documents
), wc AS (
  SELECT lang, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2
)
SELECT lang,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       ROUND(SUM(CASE WHEN c = 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 6)
         AS hapax_ratio,
       ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS type_token_ratio
FROM wc GROUP BY 1 ORDER BY 1
"""


@query("text_hapax_ratio", _HAPAX_ORACLE)
def text_hapax_ratio(spark, sf_dir):
    """Per-language vocabulary health: token count, vocabulary size,
    hapax legomena (words seen once), hapax ratio, and type-token
    ratio — the canonical corpus-diversity signals that catch both
    boilerplate floods (TTR collapses) and OCR noise (hapax ratio
    explodes). One explode + one (lang, token) groupBy with map-side
    combine; the per-language rollup is bounded by vocabulary."""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("tok"),
    )
    wc = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    return (
        wc.groupBy("lang")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("vocab"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("hapax"),
            F.round(
                F.sum(
                    F.when(F.col("c") == 1, 1.0).otherwise(0.0)
                )
                / F.count("*"),
                6,
            ).alias("hapax_ratio"),
            F.round(
                F.count("*") / F.sum("c").cast("double"), 6
            ).alias("type_token_ratio"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# Distribution-comparison batch: KS test, monthly growth, trigram
# coverage.
# ---------------------------------------------------------------------

_KS_ORACLE = """
WITH s AS (
  SELECT value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1,
         CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END AS g2
  FROM events
  WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL
), pv AS (
  SELECT value, SUM(g1) AS c1, SUM(g2) AS c2
  FROM s GROUP BY 1
), cdf AS (
  SELECT SUM(c1) OVER (ORDER BY value
                       ROWS UNBOUNDED PRECEDING) AS cum1,
         SUM(c2) OVER (ORDER BY value
                       ROWS UNBOUNDED PRECEDING) AS cum2,
         SUM(c1) OVER () AS n1,
         SUM(c2) OVER () AS n2
  FROM pv
)
SELECT CAST(MIN(n1) AS BIGINT) AS n_purchase,
       CAST(MIN(n2) AS BIGINT) AS n_click,
       ROUND(MAX(ABS(CAST(cum1 AS DOUBLE) / n1
                     - CAST(cum2 AS DOUBLE) / n2)), 6) AS ks_d
FROM cdf
"""


@query("stats_ks_test", _KS_ORACLE)
def stats_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the value
    distributions of purchase and click events: D = max |F1 - F2|
    over the pooled support. Both empirical CDFs come from ONE
    pass — conditional counts per distinct value, then one ordered
    running sum over the distinct-value table. Scale note: exact KS
    is inherently sort-based; with a continuous value column the
    distinct-value table approaches row count and the final window
    is a global sort. This exact form is the documented oracle
    twin — at 100 TB, pre-quantize the value (fixed-width bins give
    a D within bin-width of exact) or compare KLL sketch quantiles
    (agg_kll_quantile_sketch)."""
    t = load_tables(spark, sf_dir)
    s = (
        t["events"]
        .where(
            F.col("event_type").isin("purchase", "click")
            & F.col("value").isNotNull()
        )
        .select(
            "value",
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("g1"),
            F.when(F.col("event_type") == "click", 1)
            .otherwise(0)
            .alias("g2"),
        )
    )
    pv = s.groupBy("value").agg(
        F.sum("g1").alias("c1"), F.sum("g2").alias("c2")
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cdf = pv.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
        F.sum("c1").over(Window.partitionBy()).alias("n1"),
        F.sum("c2").over(Window.partitionBy()).alias("n2"),
    )
    return cdf.agg(
        F.min("n1").cast("bigint").alias("n_purchase"),
        F.min("n2").cast("bigint").alias("n_click"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum1").cast("double") / F.col("n1")
                    - F.col("cum2").cast("double") / F.col("n2")
                )
            ),
            6,
        ).alias("ks_d"),
    )


_GROWTH_ORACLE = """
WITH monthly AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS m,
         ROUND(SUM(o_totalprice), 6) AS rev
  FROM orders GROUP BY 1
)
SELECT CAST(m AS DATE) AS month_start,
       rev,
       ROUND(CASE WHEN LAG(rev) OVER (ORDER BY m) IS NULL THEN NULL
                  ELSE 100.0 * (rev - LAG(rev) OVER (ORDER BY m))
                        / LAG(rev) OVER (ORDER BY m) END, 6)
         AS mom_growth_pct,
       ROUND(AVG(rev) OVER (ORDER BY m
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             6) AS ma3
FROM monthly ORDER BY month_start
"""


@query("time_monthly_growth", _GROWTH_ORACLE)
def time_monthly_growth(spark, sf_dir):
    """Month-over-month revenue growth with a trailing 3-month moving
    average — the standard trend report. The heavy scan reduces to
    one calendar-bounded row per month before any window runs, so
    the unpartitioned windows are free at any corpus size."""
    t = load_tables(spark, sf_dir)
    monthly = t["orders"].groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(F.round(F.sum("o_totalprice"), 6).alias("rev"))
    w = Window.orderBy("m")
    return (
        monthly.select(
            F.col("m").cast("date").alias("month_start"),
            "rev",
            F.round(
                F.when(
                    F.lag("rev").over(w).isNull(), F.lit(None)
                ).otherwise(
                    100.0
                    * (F.col("rev") - F.lag("rev").over(w))
                    / F.lag("rev").over(w)
                ),
                6,
            ).alias("mom_growth_pct"),
            F.round(
                F.avg("rev").over(w.rowsBetween(-2, 0)), 6
            ).alias("ma3"),
        )
        .orderBy("month_start")
    )


_TRIGRAM_ORACLE = """
WITH tri AS (
  SELECT lang,
         unnest(list_transform(
           range(1, GREATEST(length(lower(text)) - 1, 1)),
           i -> substr(lower(text), CAST(i AS INT), 3))) AS tg
  FROM documents
  WHERE length(text) >= 3
), tc AS (
  SELECT lang, tg, CAST(COUNT(*) AS BIGINT) AS c
  FROM tri GROUP BY 1, 2
), ranked AS (
  SELECT lang, c,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY c DESC, tg) AS rn,
         SUM(c) OVER (PARTITION BY lang) AS total,
         COUNT(*) OVER (PARTITION BY lang) AS n_distinct
  FROM tc
)
SELECT lang,
       CAST(MIN(total) AS BIGINT) AS n_trigrams,
       CAST(MIN(n_distinct) AS BIGINT) AS distinct_trigrams,
       ROUND(SUM(CASE WHEN rn <= 100 THEN CAST(c AS DOUBLE)
                      ELSE 0 END) / MIN(total), 6)
         AS top100_coverage
FROM ranked GROUP BY 1 ORDER BY 1
"""


@query("text_trigram_coverage", _TRIGRAM_ORACLE)
def text_trigram_coverage(spark, sf_dir):
    """Character-trigram concentration per language: what fraction of
    all trigram occurrences the top-100 trigrams cover. Natural text
    has high trigram concentration per language (the signal n-gram
    language-ID exploits); a flat profile flags mixed or corrupt
    shards. Trigram extraction is a codegen transform+explode (no
    UDF); the rank/coverage windows run on the bounded per-language
    trigram-count table.

    lower(text) is hoisted into its own projection BEFORE the
    transform lambda: inlined it is re-evaluated per trigram —
    O(len²) per document, measured 40.7 s vs 17.9 s for the explode
    at sf1. The hoist survives CollapseProject because the non-cheap
    ``low`` is referenced twice (sequence bound + lambda body).

    Round-11: the explode (one 3-char STRING row per character into
    the hash aggregate) is replaced by `char_ngram_group_counts` —
    trigrams pack bijectively into int64 and are pre-counted per
    Arrow batch, so the exchange carries partial counts over the
    bounded distinct-trigram space instead of ~13M rows at sf1.
    Packing preserves equal-length string order, so the rn tie-break
    (c DESC, tg ASC) ranks identically — and the output aggregates
    are tie-order-invariant anyway (tied c contribute the same sum
    whichever side of rank 100 they land). Oracle hash unchanged."""
    from data_pipeline_001_spark.operators.text_analysis import (
        char_ngram_group_counts,
    )

    t = load_tables(spark, sf_dir)
    tc = char_ngram_group_counts(
        t["documents"], text_col="text", group_col="lang", n=3
    ).select(F.col("g").alias("lang"), "tg", "c")
    wl = Window.partitionBy("lang")
    ranked = tc.select(
        "lang",
        "c",
        F.row_number()
        .over(wl.orderBy(F.desc("c"), F.asc("tg")))
        .alias("rn"),
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
                    F.when(
                        F.col("rn") <= 100, F.col("c").cast("double")
                    ).otherwise(F.lit(0.0))
                )
                / F.min("total"),
                6,
            ).alias("top100_coverage"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------
# Estimation-quality batch: jackknife standard error, readability,
# new-vs-returning decomposition.
# ---------------------------------------------------------------------

_JACK_ORACLE = """
WITH g AS (
  SELECT ascii(substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1)) % 10
           AS grp,
         o_totalprice AS x
  FROM orders
), per AS (
  SELECT grp, SUM(x) AS s, COUNT(*) AS n FROM g GROUP BY 1
), tot AS (
  SELECT SUM(s) AS st, SUM(n) AS nt, COUNT(*) AS ng FROM per
), loo AS (
  SELECT (t.st - p.s) / (t.nt - p.n) AS m_i, t.ng
  FROM per p CROSS JOIN tot t
), jb AS (
  SELECT AVG(m_i) AS m_bar, MIN(ng) AS ng FROM loo
)
SELECT CAST(t.nt AS BIGINT) AS n_rows,
       CAST(j.ng AS BIGINT) AS n_groups,
       ROUND(t.st / t.nt, 6) AS mean_price,
       ROUND(SQRT((j.ng - 1.0) / j.ng
                  * (SELECT SUM((m_i - j.m_bar) * (m_i - j.m_bar))
                     FROM loo)), 6) AS jackknife_se
FROM tot t CROSS JOIN jb j
"""


@query("stats_jackknife_se", _JACK_ORACLE)
def stats_jackknife_se(spark, sf_dir):
    """Delete-one-group jackknife standard error for the mean order
    price over 10 hash-stable buckets (ascii-of-md5 assignment, the
    same append-stable trick as the A/B arms — re-runs and late
    data never reshuffle groups, unlike RNG resampling). One scan
    produces 10 per-group partials; every downstream step runs on
    that 10-row table, so the estimator costs the same as the mean
    itself at any corpus size."""
    t = load_tables(spark, sf_dir)
    g = t["orders"].select(
        (
            F.ascii(
                F.substring(
                    F.md5(F.col("o_orderkey").cast("string")), 1, 1
                )
            )
            % 10
        ).alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    per = g.groupBy("grp").agg(
        F.sum("x").alias("s"), F.count("*").alias("n")
    )
    tot = per.agg(
        F.sum("s").alias("st"),
        F.sum("n").alias("nt"),
        F.count("*").alias("ng"),
    )
    loo = per.crossJoin(F.broadcast(tot)).select(
        ((F.col("st") - F.col("s")) / (F.col("nt") - F.col("n"))).alias(
            "m_i"
        ),
        "st",
        "nt",
        "ng",
    )
    jb = loo.agg(F.avg("m_i").alias("m_bar"))
    return (
        loo.crossJoin(F.broadcast(jb))
        .agg(
            F.min("nt").cast("bigint").alias("n_rows"),
            F.min("ng").cast("bigint").alias("n_groups"),
            F.round(F.min("st") / F.min("nt"), 6).alias("mean_price"),
            F.round(
                F.sqrt(
                    (F.min("ng") - 1.0)
                    / F.min("ng")
                    * F.sum(
                        (F.col("m_i") - F.col("m_bar"))
                        * (F.col("m_i") - F.col("m_bar"))
                    )
                ),
                6,
            ).alias("jackknife_se"),
        )
    )


_READ_ORACLE = """
WITH d AS (
  SELECT lang,
         len(regexp_extract_all(lower(text), '[a-z]+'))       AS words,
         GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS sents,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))    AS sylls
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(CAST(words AS DOUBLE) / sents), 6) AS avg_words_per_sent,
       ROUND(AVG(CAST(sylls AS DOUBLE) / words), 6) AS avg_sylls_per_word,
       ROUND(AVG(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                 - 84.6 * (CAST(sylls AS DOUBLE) / words)), 6)
         AS flesch_ease
FROM d WHERE words > 0
GROUP BY 1 ORDER BY 1
"""


@query("text_readability", _READ_ORACLE)
def text_readability(spark, sf_dir):
    """Per-language Flesch reading ease with vowel-group syllable
    approximation — the readability axis of quality scoring
    (documents that score far outside prose range are tables, code,
    or OCR noise). All three counts are codegen regexp_extract_all
    sizes in the same scan; zero-word docs are excluded before the
    division."""
    t = load_tables(spark, sf_dir)
    d = t["documents"].select(
        "lang",
        F.size(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")),
            F.lit(1),
        ).alias("sents"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).alias("sylls"),
    ).where(F.col("words") > 0)
    wps = F.col("words").cast("double") / F.col("sents")
    spw = F.col("sylls").cast("double") / F.col("words")
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(wps), 6).alias("avg_words_per_sent"),
            F.round(F.avg(spw), 6).alias("avg_sylls_per_word"),
            F.round(
                F.avg(206.835 - 1.015 * wps - 84.6 * spw), 6
            ).alias("flesch_ease"),
        )
        .orderBy("lang")
    )


_NEWRET_ORACLE = """
WITH du AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
  FROM events WHERE user_id IS NOT NULL
), firsts AS (
  SELECT user_id, d,
         MIN(d) OVER (PARTITION BY user_id) AS first_d
  FROM du
)
SELECT d,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN d = first_d THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN d <> first_d THEN 1 ELSE 0 END) AS BIGINT)
         AS n_returning,
       ROUND(AVG(CASE WHEN d = first_d THEN 1.0 ELSE 0.0 END), 6)
         AS pct_new
FROM firsts GROUP BY 1 ORDER BY 1
"""


@query("events_new_vs_returning", _NEWRET_ORACLE)
def events_new_vs_returning(spark, sf_dir):
    """Daily active users decomposed into new (first-ever-seen that
    day) vs returning — the growth-accounting report. The first-seen
    date is a window min over the deduplicated (user, day) table, so
    the user-keyed shuffle from the distinct is reused by the window
    (no self-join against a firsts table) and the output is
    calendar-bounded."""
    t = load_tables(spark, sf_dir)
    du = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    firsts = du.select(
        "d",
        F.min("d").over(Window.partitionBy("user_id")).alias("first_d"),
    )
    return (
        firsts.groupBy("d")
        .agg(
            F.count("*").alias("n_active"),
            F.sum(
                F.when(F.col("d") == F.col("first_d"), 1).otherwise(0)
            ).alias("n_new"),
            F.sum(
                F.when(F.col("d") != F.col("first_d"), 1).otherwise(0)
            ).alias("n_returning"),
            F.round(
                F.avg(
                    F.when(F.col("d") == F.col("first_d"), 1.0).otherwise(
                        0.0
                    )
                ),
                6,
            ).alias("pct_new"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------
# Comparative-statistics batch: Welch's t, Herfindahl concentration,
# session durations.
# ---------------------------------------------------------------------

_WELCH_ORACLE = """
WITH assigned AS (
  SELECT CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                   % 2 = 0
              THEN 'A' ELSE 'B' END AS arm,
         value
  FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
    AND value IS NOT NULL
), s AS (
  SELECT arm, COUNT(*) AS n, AVG(value) AS m, VAR_SAMP(value) AS v
  FROM assigned GROUP BY 1
), ab AS (
  SELECT
    MAX(CASE WHEN arm = 'A' THEN n END) AS n1,
    MAX(CASE WHEN arm = 'A' THEN m END) AS m1,
    MAX(CASE WHEN arm = 'A' THEN v END) AS v1,
    MAX(CASE WHEN arm = 'B' THEN n END) AS n2,
    MAX(CASE WHEN arm = 'B' THEN m END) AS m2,
    MAX(CASE WHEN arm = 'B' THEN v END) AS v2
  FROM s
)
SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
       ROUND(m1, 6) AS mean_a, ROUND(m2, 6) AS mean_b,
       ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS welch_t,
       ROUND(POW(v1 / n1 + v2 / n2, 2)
             / (POW(v1 / n1, 2) / (n1 - 1)
                + POW(v2 / n2, 2) / (n2 - 1)), 6) AS welch_dof
FROM ab
"""


@query("stats_welch_ttest", _WELCH_ORACLE)
def stats_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t statistic (with Welch–Satterthwaite
    degrees of freedom) comparing purchase value between the two
    hash-stable arms — the continuous-metric companion to the
    conversion z-test in agg_ab_experiment_lift. One scan computes
    both arms' count/mean/variance as algebraic aggregates; the
    statistic is 1-row arithmetic via a conditional pivot."""
    t = load_tables(spark, sf_dir)
    assigned = (
        t["events"]
        .where(
            (F.col("event_type") == "purchase")
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            F.when(
                F.ascii(
                    F.substring(
                        F.md5(F.col("user_id").cast("string")), 1, 1
                    )
                )
                % 2
                == 0,
                "A",
            )
            .otherwise("B")
            .alias("arm"),
            "value",
        )
    )
    s = assigned.groupBy("arm").agg(
        F.count("*").alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )

    def pick(col, arm):
        return F.max(F.when(F.col("arm") == arm, F.col(col)))

    ab = s.agg(
        pick("n", "A").alias("n1"),
        pick("m", "A").alias("m1"),
        pick("v", "A").alias("v1"),
        pick("n", "B").alias("n2"),
        pick("m", "B").alias("m2"),
        pick("v", "B").alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return ab.select(
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n2").cast("bigint").alias("n_b"),
        F.round("m1", 6).alias("mean_a"),
        F.round("m2", 6).alias("mean_b"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias(
            "welch_t"
        ),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            6,
        ).alias("welch_dof"),
    )


_HHI_ORACLE = """
WITH supp_rev AS (
  SELECT s.s_nationkey, l.l_suppkey,
         SUM(l.l_extendedprice * (1 - l.l_discount)) AS rev
  FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
), shares AS (
  SELECT s_nationkey, rev,
         SUM(rev) OVER (PARTITION BY s_nationkey) AS nat_rev,
         COUNT(*) OVER (PARTITION BY s_nationkey) AS n_suppliers
  FROM supp_rev
)
SELECT n.n_name AS nation,
       CAST(MIN(sh.n_suppliers) AS BIGINT) AS n_suppliers,
       ROUND(SUM((sh.rev / sh.nat_rev) * (sh.rev / sh.nat_rev)), 6)
         AS hhi
FROM shares sh JOIN nation n ON sh.s_nationkey = n.n_nationkey
GROUP BY 1 ORDER BY 1
"""


@query("agg_hhi_concentration", _HHI_ORACLE)
def agg_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman supplier-concentration index per nation:
    Σ share² of discounted supply revenue — the antitrust-style
    companion to agg_gini_concentration (HHI weights the head,
    Gini the whole curve). The fact scan reduces to one row per
    (nation, supplier) before the share windows run; supplier and
    nation dims broadcast."""
    t = load_tables(spark, sf_dir)
    supp_rev = (
        t["lineitem"]
        .join(
            t["supplier"].select("s_suppkey", "s_nationkey"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("rev")
        )
    )
    wn = Window.partitionBy("s_nationkey")
    shares = supp_rev.select(
        "s_nationkey",
        "rev",
        F.sum("rev").over(wn).alias("nat_rev"),
        F.count("*").over(wn).alias("n_suppliers"),
    )
    share = F.col("rev") / F.col("nat_rev")
    return (
        shares.join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.min("n_suppliers").cast("bigint").alias("n_suppliers"),
            F.round(F.sum(share * share), 6).alias("hhi"),
        )
        .orderBy("nation")
    )


_SESSDUR_ORACLE = """
WITH ordered AS (
  SELECT user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events WHERE user_id IS NOT NULL
), flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                OR epoch(ts) - epoch(prev_ts) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM ordered
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id
                          ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
), per_sess AS (
  SELECT user_id, sid,
         epoch(MAX(ts)) - epoch(MIN(ts)) AS dur_s,
         COUNT(*) AS n_events
  FROM sess GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
       ROUND(quantile_cont(CAST(dur_s AS DOUBLE), 0.5), 6)
         AS p50_duration_s,
       ROUND(quantile_cont(CAST(dur_s AS DOUBLE), 0.9), 6)
         AS p90_duration_s,
       ROUND(AVG(CAST(n_events AS DOUBLE)), 6) AS avg_events,
       ROUND(MAX(CAST(dur_s AS DOUBLE)), 6) AS max_duration_s
FROM per_sess
"""


@query("events_session_duration", _SESSDUR_ORACLE)
def events_session_duration(spark, sf_dir):
    """Session-duration distribution over the same 30-minute-gap
    sessions as events_bounce_rate: exact p50/p90/max duration and
    mean events per session. Shares the single user-keyed exchange
    of the sessionizer; the percentile pass runs over one row per
    session."""
    t = load_tables(spark, sf_dir)
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sess = (
        t["events"]
        .where(F.col("user_id").isNotNull())
        .select(
            "user_id",
            "ts",
            F.when(
                F.lag("ts").over(w_ord).isNull()
                | (
                    F.col("ts").cast("double")
                    - F.lag("ts").over(w_ord).cast("double")
                    > 1800
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("new_s"),
        )
        .select(
            "user_id", "ts", F.sum("new_s").over(w_run).alias("sid")
        )
    )
    per_sess = sess.groupBy("user_id", "sid").agg(
        (
            F.max(F.col("ts").cast("double"))
            - F.min(F.col("ts").cast("double"))
        ).alias("dur_s"),
        F.count("*").alias("n_events"),
    )
    return per_sess.agg(
        F.count("*").alias("n_sessions"),
        F.round(
            F.expr("percentile(CAST(dur_s AS DOUBLE), 0.5)"), 6
        ).alias("p50_duration_s"),
        F.round(
            F.expr("percentile(CAST(dur_s AS DOUBLE), 0.9)"), 6
        ).alias("p90_duration_s"),
        F.round(F.avg(F.col("n_events").cast("double")), 6).alias(
            "avg_events"
        ),
        F.round(F.max(F.col("dur_s").cast("double")), 6).alias(
            "max_duration_s"
        ),
    )


_ANOVA_ORACLE = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         ISODOW(CAST(ts AS DATE)) AS dow,
         ROUND(SUM(value), 6) AS rev
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1, 2
), g AS (
  SELECT dow, COUNT(*) AS n_g, AVG(rev) AS m_g,
         SUM(rev * rev) AS ss_g, SUM(rev) AS s_g
  FROM daily GROUP BY 1
), tot AS (
  SELECT SUM(n_g) AS n, SUM(s_g) / SUM(n_g) AS m,
         COUNT(*) AS k FROM g
)
SELECT CAST(t.n AS BIGINT) AS n_days,
       CAST(t.k AS BIGINT) AS k_groups,
       ROUND(SUM(g.n_g * (g.m_g - t.m) * (g.m_g - t.m)) / (t.k - 1)
             / (SUM(g.ss_g - g.n_g * g.m_g * g.m_g) / (t.n - t.k)),
             6) AS f_stat
FROM g CROSS JOIN tot t
GROUP BY t.n, t.k
"""


@query("stats_anova_weekday", _ANOVA_ORACLE)
def stats_anova_weekday(spark, sf_dir):
    """One-way ANOVA F statistic for daily purchase revenue grouped
    by day of week (``F.dayofweek`` numbering: 1=Sunday … 7=Saturday,
    NOT ISO) — does day-of-week explain revenue variance? The F
    statistic itself is labeling-invariant (any 7-way day partition
    is the same partition), but per-group rows added later must use
    this numbering.
    Completes the test-statistic family (z: A/B lift, t: Welch,
    chi²: independence, KS: distribution, F: variance decomposition).
    Between/within sums of squares come from algebraic per-group
    partials over the calendar-bounded daily table; the F ratio is
    7-row arithmetic."""
    t = load_tables(spark, sf_dir)
    daily = (
        t["events"]
        .where(F.col("event_type") == "purchase")
        .groupBy(
            F.col("ts").cast("date").alias("d"),
            F.dayofweek(F.col("ts").cast("date")).alias("dow_raw"),
        )
        .agg(F.round(F.sum("value"), 6).alias("rev"))
    )
    g = daily.groupBy("dow_raw").agg(
        F.count("*").alias("n_g"),
        F.avg("rev").alias("m_g"),
        F.sum(F.col("rev") * F.col("rev")).alias("ss_g"),
        F.sum("rev").alias("s_g"),
    )
    tot = g.agg(
        F.sum("n_g").alias("n"),
        (F.sum("s_g") / F.sum("n_g")).alias("m"),
        F.count("*").alias("k"),
    )
    ssb = F.sum(
        F.col("n_g") * (F.col("m_g") - F.col("m")) * (F.col("m_g") - F.col("m"))
    )
    ssw = F.sum(
        F.col("ss_g") - F.col("n_g") * F.col("m_g") * F.col("m_g")
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .groupBy("n", "k")
        .agg(
            F.min("n").cast("bigint").alias("n_days"),
            F.min("k").cast("bigint").alias("k_groups"),
            F.round(
                (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k"))),
                6,
            ).alias("f_stat"),
        )
        .drop("n", "k")
    )


_LOAD_ORACLE = """
WITH hourly AS (
  SELECT DATE_TRUNC('hour', ts) AS h, CAST(COUNT(*) AS DOUBLE) AS c
  FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(AVG(c), 6) AS mean_per_hour,
       ROUND(STDDEV_SAMP(c) / AVG(c), 6) AS cv,
       ROUND(MAX(c) / AVG(c), 6) AS peak_to_mean,
       ROUND(MAX(c) / MIN(c), 6) AS peak_to_trough
FROM hourly
"""


@query("events_load_imbalance", _LOAD_ORACLE)
def events_load_imbalance(spark, sf_dir):
    """Hourly ingest-load imbalance profile: coefficient of variation
    and peak-to-mean / peak-to-trough ratios of events per hour —
    the capacity-planning numbers behind the reference's window-size
    scaling curves (scalar_duration_curves picks window granularity;
    this measures the burstiness that forces it). One scan reduces
    to calendar-bounded hourly counts; all ratios are algebraic
    aggregates over that."""
    t = load_tables(spark, sf_dir)
    hourly = t["events"].groupBy(
        F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").cast("double").alias("c"))
    return hourly.agg(
        F.count("*").alias("n_hours"),
        F.round(F.avg("c"), 6).alias("mean_per_hour"),
        F.round(F.stddev_samp("c") / F.avg("c"), 6).alias("cv"),
        F.round(F.max("c") / F.avg("c"), 6).alias("peak_to_mean"),
        F.round(F.max("c") / F.min("c"), 6).alias("peak_to_trough"),
    )


_AGING_ORACLE = """
WITH mx AS (
  SELECT MAX(o_orderdate) AS max_d FROM orders
), aged AS (
  SELECT o.o_orderstatus AS status,
         CASE
           WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(m.max_d AS DATE)) <= 30  THEN '0-30'
           WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(m.max_d AS DATE)) <= 90  THEN '31-90'
           WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                          CAST(m.max_d AS DATE)) <= 365 THEN '91-365'
           ELSE '365+'
         END AS age_bucket,
         o.o_totalprice
  FROM orders o CROSS JOIN mx m
)
SELECT status, age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(o_totalprice), 6) AS total_value
FROM aged GROUP BY 1, 2 ORDER BY 1, 2
"""


@query("orders_status_aging", _AGING_ORACLE)
def orders_status_aging(spark, sf_dir):
    """Order-backlog aging matrix: status × age bucket (days relative
    to the newest order date, so the report is re-run-stable on a
    frozen snapshot) with counts and value. The max-date scalar
    broadcasts; the bucketing is a codegen CASE and the rollup is
    one map-side-combinable groupBy."""
    t = load_tables(spark, sf_dir)
    mx = t["orders"].agg(F.max("o_orderdate").alias("max_d"))
    aged = t["orders"].crossJoin(F.broadcast(mx)).select(
        F.col("o_orderstatus").alias("status"),
        F.when(
            F.datediff(
                F.col("max_d").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            <= 30,
            "0-30",
        )
        .when(
            F.datediff(
                F.col("max_d").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            <= 90,
            "31-90",
        )
        .when(
            F.datediff(
                F.col("max_d").cast("date"),
                F.col("o_orderdate").cast("date"),
            )
            <= 365,
            "91-365",
        )
        .otherwise("365+")
        .alias("age_bucket"),
        "o_totalprice",
    )
    return (
        aged.groupBy("status", "age_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 6).alias("total_value"),
        )
        .orderBy("status", "age_bucket")
    )


# -- round-10: production-dictionary tokenizer apply paths ------------
#
# Both scale twins register the SAME oracle as their literal forms:
# identical rows, different execution strategy — the twin pattern
# (COVERAGE.md §2.13). The literal forms stay in the registry as the
# demo-size baselines; these are the plans a 100 TB pass would run
# (cost independent of dictionary size: rank-heap BPE, one-pass
# Aho-Corasick), so the hash gate proves the scale path exact.


@query("text_bpe_encode_udf", _BPE_ENCODE_ORACLE)
def text_bpe_encode_udf(spark, sf_dir):
    """The 30k-vocab BPE APPLY path (round-9 verdict: documented but
    unbuilt): the chained-replace twin spends one plan node + one
    string scan per merge rule — at a production merge table Catalyst
    analysis alone explodes. This form extracts words JVM-side
    (identical lower+regexp to the twin) and encodes through ONE
    Arrow-batched MapInPandas running the rank-heap encoder
    (operators/text_analysis.bpe_encode_ranked): only ranks of pairs
    PRESENT in each word are visited, LRU-cached across the Zipf word
    stream. Zero shuffles; same oracle as text_bpe_encode —
    hash-equality proves the heap path reproduces chained-replace
    semantics exactly (delimiter sharing included)."""
    from data_pipeline_001_spark.operators.text_analysis import (
        bpe_encode_ranked,
    )

    t = load_tables(spark, sf_dir)
    return bpe_encode_ranked(t["documents"], _BPE_MERGES)


@query("curation_keyword_tags_ac", _TAGS_ORACLE)
def curation_keyword_tags_ac(spark, sf_dir):
    """The 10k-term dictionary-tagging path (round-9 verdict: the
    literal filter-HOF twin scans the text once PER TERM): one
    Aho-Corasick automaton pass per document, built once per executor
    from the term tuple, with RE2-compatible word-boundary checks at
    each hit (operators/text_analysis.keyword_tags_aho_corasick).
    Same oracle as curation_keyword_tags — identical tags in
    dictionary order, matching cost now O(len) regardless of
    dictionary size."""
    from data_pipeline_001_spark.operators.text_analysis import (
        keyword_tags_aho_corasick,
    )

    t = load_tables(spark, sf_dir)
    return keyword_tags_aho_corasick(t["documents"], _TAG_KEYWORDS)


# Greedy longest-match vocabulary (WordPiece-style apply): all 26
# letters (guaranteed progress — shared precondition with the oracle)
# plus common English subwords. Both engines tokenize against the
# SAME literal list, so the oracle is exact.
_SUBWORD_VOCAB = tuple("abcdefghijklmnopqrstuvwxyz") + (
    "the", "and", "ing", "ion", "tion", "ent", "ed", "er", "es", "re",
    "in", "on", "at", "en", "an", "or", "ti", "st", "ar", "te", "ng",
    "al", "it", "as", "is", "ha", "et", "se", "ou", "of", "to", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic",
)

_VOCAB_TOKENIZE_ORACLE = """
WITH RECURSIVE vocab(tok) AS (
  SELECT unnest([{toks}])
), words AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
  FROM documents
), step AS (
  SELECT doc_id, w, 1 AS pos, 0 AS n_tok FROM words
  UNION ALL
  SELECT doc_id, w,
         pos + (SELECT MAX(length(v.tok)) FROM vocab v
                WHERE v.tok = substr(w, pos, length(v.tok))),
         n_tok + 1
  FROM step WHERE pos <= length(w)
), done AS (
  SELECT doc_id, n_tok FROM step WHERE pos = length(w) + 1
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(n_tok) AS DOUBLE) / COUNT(*), 6) AS tokens_per_word
FROM done GROUP BY doc_id
""".format(toks=", ".join(f"'{t}'" for t in _SUBWORD_VOCAB))


@query("text_vocab_tokenize", _VOCAB_TOKENIZE_ORACLE)
def text_vocab_tokenize(spark, sf_dir):
    """Greedy longest-match subword tokenization against a fixed
    vocabulary (the WordPiece-style APPLY walk; the third member of
    the tokenizer family after BPE train/encode): one trie walk per
    word via Arrow-batched MapInPandas
    (operators/text_analysis.vocab_tokenize_greedy), cost independent
    of vocabulary size. The DuckDB oracle implements the IDENTICAL
    greedy semantics as a recursive CTE (advance each word position by
    the longest matching vocab entry; single letters guarantee
    progress), so the hash gate is an exact equality check of the
    greedy walk itself."""
    from data_pipeline_001_spark.operators.text_analysis import (
        vocab_tokenize_greedy,
    )

    t = load_tables(spark, sf_dir)
    return vocab_tokenize_greedy(t["documents"], _SUBWORD_VOCAB)
