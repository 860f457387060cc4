"""Round-6 wave 5: rule mining, record-linkage scoring, keyword
extraction, and video frame sampling.

Four surfaces (SURVEY.md §2.13 scope):

* ``itemset_association_rules`` — directional association rules
  (confidence + lift) over the co-purchase baskets, completing the
  pair-support mining of ``itemset_part_pairs``.
* ``er_fellegi_sunter`` — Fellegi-Sunter record-linkage field weights
  (m/u probabilities and agreement/disagreement log-odds) estimated
  from planted duplicate pairs vs adjacent-key non-match pairs —
  the probabilistic layer over the blocking/closure ER pipeline.
* ``text_keyword_rake`` — RAKE keyword extraction (Rose et al. 2010,
  public): stopword-delimited candidate phrases scored by member-word
  degree/frequency ratios, with integer-scaled scores so the ranking
  is engine-exact.
* ``multimodal_video_framesample`` — stride sampling over a
  multi-frame binary video container, per-frame decode to channel
  means with a closed-form oracle (the established planted-BMP
  pattern, now with a per-frame exposure ramp).

NOTE: this module must stay LAST in ``__spark_entry__._registry``'s
import order — new registry entries queue behind the pinned coverage
backlog so the driver's prefix sample converges.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

# ---------------------------------------------------------------------
# Association rules over co-purchase baskets
# ---------------------------------------------------------------------

_MIN_PAIR_SUPPORT = 2


@query(
    "itemset_association_rules",
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS item FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM items),
    single AS (SELECT item, COUNT(*) AS cnt FROM items GROUP BY 1),
    pair AS (
      SELECT a.item AS x, b.item AS y, COUNT(*) AS xy
      FROM items a JOIN items b ON a.ok = b.ok AND a.item < b.item
      GROUP BY 1, 2 HAVING COUNT(*) >= {_MIN_PAIR_SUPPORT}
    ),
    rules AS (
      SELECT p.x AS antecedent, p.y AS consequent, p.xy,
             sx.cnt AS ac, sy.cnt AS cc
      FROM pair p
      JOIN single sx ON sx.item = p.x JOIN single sy ON sy.item = p.y
      UNION ALL
      SELECT p.y, p.x, p.xy, sy.cnt, sx.cnt
      FROM pair p
      JOIN single sx ON sx.item = p.x JOIN single sy ON sy.item = p.y
    )
    SELECT CAST(antecedent AS BIGINT) AS antecedent,
           CAST(consequent AS BIGINT) AS consequent,
           CAST(xy AS BIGINT) AS support_cnt,
           ROUND(xy / CAST(ac AS DOUBLE), 6) AS confidence,
           ROUND(xy * n_orders / (ac * CAST(cc AS DOUBLE)), 6) AS lift
    FROM rules, n
    ORDER BY xy * n_orders / (ac * CAST(cc AS DOUBLE)) DESC,
             antecedent, consequent
    LIMIT 50
    """,
)
def itemset_association_rules(spark, sf_dir):
    """Directional association rules a→b over co-purchase baskets:
    support count, confidence = supp(ab)/supp(a), lift =
    supp(ab)·N/(supp(a)·supp(b)); top-50 by lift. The pair join is
    the per-order bounded edge builder (never O(n²) in rows); single
    supports broadcast back onto the bounded surviving-pair table.
    Ordering is deterministic: lift is one integer-product division
    (exact in float64 range both engines), ties break on the exact
    item ids."""
    t = load_tables(spark, sf_dir)
    items = t["lineitem"].select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("item")
    ).distinct()
    n = items.agg(F.countDistinct("ok").alias("n_orders"))
    single = items.groupBy("item").agg(F.count("*").alias("cnt"))
    a, b = items.alias("a"), items.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.ok") == F.col("b.ok"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("x"), F.col("b.item").alias("y"))
        .agg(F.count("*").alias("xy"))
        .where(F.col("xy") >= _MIN_PAIR_SUPPORT)
    )
    sx = single.select(
        F.col("item").alias("x"), F.col("cnt").alias("ac")
    )
    sy = single.select(
        F.col("item").alias("y"), F.col("cnt").alias("cc")
    )
    joined = pair.join(sx, "x").join(sy, "y")
    fwd = joined.select(
        F.col("x").alias("antecedent"),
        F.col("y").alias("consequent"),
        "xy",
        "ac",
        "cc",
    )
    rev = joined.select(
        F.col("y").alias("antecedent"),
        F.col("x").alias("consequent"),
        "xy",
        F.col("cc").alias("ac"),
        F.col("ac").alias("cc"),
    )
    rules = fwd.unionAll(rev).crossJoin(F.broadcast(n))
    lift = F.col("xy") * F.col("n_orders") / (
        F.col("ac") * F.col("cc").cast("double")
    )
    return (
        rules.orderBy(
            lift.desc(), F.col("antecedent"), F.col("consequent")
        )
        .limit(50)
        .select(
            F.col("antecedent").cast("long").alias("antecedent"),
            F.col("consequent").cast("long").alias("consequent"),
            F.col("xy").cast("long").alias("support_cnt"),
            F.round(F.col("xy") / F.col("ac").cast("double"), 6).alias(
                "confidence"
            ),
            F.round(lift, 6).alias("lift"),
        )
    )


# ---------------------------------------------------------------------
# Fellegi-Sunter record-linkage field weights
# ---------------------------------------------------------------------

#: planted-duplicate id offset — far above any c_custkey (150k * SF)
_FS_OFF = 5_000_000_000_000

# Planted corruption schedule: every 29th customer gets a duplicate;
# every 2nd duplicate corrupts the name, every 3rd the segment, and
# the +$500 balance shift moves the $1000 bucket about half the time.
# The schedule is shared between the Spark plan and the oracle, so
# m/u are estimated from the identical pair sets.
_FS_RECS = """
base AS (
  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
         c_mktsegment AS seg,
         CAST(FLOOR(ROUND(c_acctbal * 100) / 100000.0) AS BIGINT) AS balb
  FROM customer
),
dup AS (
  SELECT id + {off} AS id,
         CASE WHEN id % 58 = 0 THEN 'VAR-' || name ELSE name END AS name,
         nat,
         CASE WHEN id % 87 = 0 THEN 'OTHER' ELSE seg END AS seg,
         CAST(FLOOR((ROUND(b.bal * 100) + 50000) / 100000.0) AS BIGINT)
           AS balb
  FROM (SELECT base.*, c.c_acctbal AS bal
        FROM base JOIN customer c ON c.c_custkey = base.id) b
  WHERE id % 29 = 0
)
"""


def _fs_oracle() -> str:
    recs = _FS_RECS.format(off=_FS_OFF)
    return f"""
    WITH {recs.strip()},
    matches AS (
      SELECT CASE WHEN o.name = d.name THEN 1 ELSE 0 END AS f_name,
             CASE WHEN o.nat = d.nat THEN 1 ELSE 0 END AS f_nat,
             CASE WHEN o.seg = d.seg THEN 1 ELSE 0 END AS f_seg,
             CASE WHEN o.balb = d.balb THEN 1 ELSE 0 END AS f_bal
      FROM base o JOIN dup d ON d.id = o.id + {_FS_OFF}
    ),
    nonmatches AS (
      SELECT CASE WHEN a.name = b.name THEN 1 ELSE 0 END AS f_name,
             CASE WHEN a.nat = b.nat THEN 1 ELSE 0 END AS f_nat,
             CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS f_seg,
             CASE WHEN a.balb = b.balb THEN 1 ELSE 0 END AS f_bal
      FROM base a JOIN base b ON b.id = a.id + 1
    ),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(f_name) AS s_name, SUM(f_nat) AS s_nat,
             SUM(f_seg) AS s_seg, SUM(f_bal) AS s_bal
      FROM matches
    ),
    u AS (
      SELECT COUNT(*) AS n,
             SUM(f_name) AS s_name, SUM(f_nat) AS s_nat,
             SUM(f_seg) AS s_seg, SUM(f_bal) AS s_bal
      FROM nonmatches
    ),
    fields AS (
      SELECT 'acctbal_bucket' AS field, m.n AS nm, u.n AS nu,
             m.s_bal AS sm, u.s_bal AS su FROM m, u
      UNION ALL
      SELECT 'mktsegment', m.n, u.n, m.s_seg, u.s_seg FROM m, u
      UNION ALL
      SELECT 'name', m.n, u.n, m.s_name, u.s_name FROM m, u
      UNION ALL
      SELECT 'nationkey', m.n, u.n, m.s_nat, u.s_nat FROM m, u
    )
    SELECT field,
           CAST(nm AS BIGINT) AS n_match_pairs,
           CAST(nu AS BIGINT) AS n_nonmatch_pairs,
           ROUND(sm / CAST(nm AS DOUBLE), 6) AS m_prob,
           ROUND(su / CAST(nu AS DOUBLE), 6) AS u_prob,
           ROUND(LOG2(LEAST(GREATEST(sm / CAST(nm AS DOUBLE),
                                     0.5 / nm), 1 - 0.5 / nm)
                      / LEAST(GREATEST(su / CAST(nu AS DOUBLE),
                                       0.5 / nu), 1 - 0.5 / nu)), 4)
             AS w_agree,
           ROUND(LOG2((1 - LEAST(GREATEST(sm / CAST(nm AS DOUBLE),
                                          0.5 / nm), 1 - 0.5 / nm))
                      / (1 - LEAST(GREATEST(su / CAST(nu AS DOUBLE),
                                            0.5 / nu), 1 - 0.5 / nu))), 4)
             AS w_disagree
    FROM fields ORDER BY field
    """


@query("er_fellegi_sunter", _fs_oracle())
def er_fellegi_sunter(spark, sf_dir):
    """Fellegi-Sunter field weights for record linkage: per-field
    agreement probability among known matches (m) and among
    non-matches (u), and the log2 agreement/disagreement weights a
    linkage score sums (Fellegi & Sunter 1969, public). Matches are
    the planted duplicates (known by construction — the supervised
    estimate; EM would be the unsupervised path); non-matches are
    adjacent-key pairs, whose TPC-H attributes are independent.
    Probabilities are clamped to [0.5/n, 1-0.5/n] before the log so a
    perfectly-agreeing field (nationkey, m=1) gets a finite weight —
    the standard continuity correction. Everything is exact counts
    until the final division+log2; both pair sets are equi-joins on
    the key, never quadratic."""
    t = load_tables(spark, sf_dir)
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    base = t["customer"].select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.floor(cents / 100000.0).cast("long").alias("balb"),
    )
    dup = (
        t["customer"]
        .where(F.col("c_custkey") % 29 == 0)
        .select(
            (F.col("c_custkey") + _FS_OFF).alias("id"),
            F.when(
                F.col("c_custkey") % 58 == 0,
                F.concat(F.lit("VAR-"), F.col("c_name")),
            )
            .otherwise(F.col("c_name"))
            .alias("name"),
            F.col("c_nationkey").alias("nat"),
            F.when(F.col("c_custkey") % 87 == 0, F.lit("OTHER"))
            .otherwise(F.col("c_mktsegment"))
            .alias("seg"),
            F.floor((cents + 50000) / 100000.0).cast("long").alias("balb"),
        )
    )
    o, d = base.alias("o"), dup.alias("d")
    matches = o.join(d, F.col("d.id") == F.col("o.id") + _FS_OFF).select(
        (F.col("o.name") == F.col("d.name")).cast("int").alias("f_name"),
        (F.col("o.nat") == F.col("d.nat")).cast("int").alias("f_nat"),
        (F.col("o.seg") == F.col("d.seg")).cast("int").alias("f_seg"),
        (F.col("o.balb") == F.col("d.balb")).cast("int").alias("f_bal"),
    )
    a, b = base.alias("a"), base.alias("b")
    nonmatches = a.join(b, F.col("b.id") == F.col("a.id") + 1).select(
        (F.col("a.name") == F.col("b.name")).cast("int").alias("f_name"),
        (F.col("a.nat") == F.col("b.nat")).cast("int").alias("f_nat"),
        (F.col("a.seg") == F.col("b.seg")).cast("int").alias("f_seg"),
        (F.col("a.balb") == F.col("b.balb")).cast("int").alias("f_bal"),
    )

    def _sums(df):
        return df.agg(
            F.count("*").alias("n"),
            F.sum("f_name").alias("s_name"),
            F.sum("f_nat").alias("s_nat"),
            F.sum("f_seg").alias("s_seg"),
            F.sum("f_bal").alias("s_bal"),
        )

    m = _sums(matches).select(
        F.col("n").alias("nm"),
        F.col("s_name").alias("m_name"),
        F.col("s_nat").alias("m_nat"),
        F.col("s_seg").alias("m_seg"),
        F.col("s_bal").alias("m_bal"),
    )
    u = _sums(nonmatches).select(
        F.col("n").alias("nu"),
        F.col("s_name").alias("u_name"),
        F.col("s_nat").alias("u_nat"),
        F.col("s_seg").alias("u_seg"),
        F.col("s_bal").alias("u_bal"),
    )
    both = m.crossJoin(F.broadcast(u))
    fields = both.select(
        F.expr(
            "stack(4, "
            "'acctbal_bucket', m_bal, u_bal, "
            "'mktsegment', m_seg, u_seg, "
            "'name', m_name, u_name, "
            "'nationkey', m_nat, u_nat"
            ") AS (field, sm, su)"
        ),
        "nm",
        "nu",
    )
    mp = F.col("sm") / F.col("nm").cast("double")
    up = F.col("su") / F.col("nu").cast("double")
    mc = F.least(
        F.greatest(mp, 0.5 / F.col("nm")), 1 - 0.5 / F.col("nm")
    )
    uc = F.least(
        F.greatest(up, 0.5 / F.col("nu")), 1 - 0.5 / F.col("nu")
    )
    return fields.select(
        "field",
        F.col("nm").cast("long").alias("n_match_pairs"),
        F.col("nu").cast("long").alias("n_nonmatch_pairs"),
        F.round(mp, 6).alias("m_prob"),
        F.round(up, 6).alias("u_prob"),
        F.round(F.log2(mc / uc), 4).alias("w_agree"),
        F.round(F.log2((1 - mc) / (1 - uc)), 4).alias("w_disagree"),
    ).orderBy("field")


# ---------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------

#: shared stopword list (both plans derive their predicate from this
#: single tuple — the engines cannot disagree on a boundary word)
_RAKE_STOPS = (
    "the", "of", "and", "a", "an", "in", "to", "is", "are", "was",
    "were", "for", "on", "with", "as", "by", "at", "it", "its",
    "from", "that", "this", "be", "or", "not",
)

_RAKE_MAX_PHRASE = 4
_RAKE_TOPK = 20


def _rake_oracle() -> str:
    stops = ", ".join(f"'{w}'" for w in _RAKE_STOPS)
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
      FROM documents
    ),
    words AS (
      SELECT doc_id, CAST(u.i AS INT) AS i, ws[u.i] AS w
      FROM toks, UNNEST(range(1, len(ws) + 1)) AS u(i)
    ),
    nonstop AS (
      SELECT doc_id, i, w,
             i - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i)
               AS grp
      FROM words WHERE w NOT IN ({stops})
    ),
    phrases AS (
      SELECT doc_id, grp,
             STRING_AGG(w, ' ' ORDER BY i) AS phrase,
             COUNT(*) AS plen
      FROM nonstop GROUP BY doc_id, grp
      HAVING COUNT(*) <= {_RAKE_MAX_PHRASE}
    ),
    wstats AS (
      SELECT n.w,
             CAST(ROUND(1000000.0 * SUM(p.plen) / COUNT(*)) AS BIGINT)
               AS s
      FROM nonstop n
      JOIN phrases p ON p.doc_id = n.doc_id AND p.grp = n.grp
      GROUP BY n.w
    ),
    occ AS (
      SELECT n.doc_id, n.grp, p.phrase, SUM(ws.s) AS sc
      FROM nonstop n
      JOIN phrases p ON p.doc_id = n.doc_id AND p.grp = n.grp
      JOIN wstats ws ON ws.w = n.w
      GROUP BY n.doc_id, n.grp, p.phrase
    )
    SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           ROUND(MIN(sc) / 1000000.0, 6) AS score
    FROM occ GROUP BY phrase
    ORDER BY MIN(sc) DESC, phrase
    LIMIT {_RAKE_TOPK}
    """


@query("text_keyword_rake", _rake_oracle())
def text_keyword_rake(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases
    are maximal stopword-free word runs (gaps-and-islands over word
    positions, phrases capped at {n} words), each word scores
    degree/frequency over the phrase corpus, a phrase scores the sum
    of its words. Determinism: the per-word ratio is rounded to an
    integer micro-score BEFORE the phrase sum, so phrase scores are
    exact BIGINTs — no float summation order can perturb the top-{k}
    cut (ties break on the phrase text). Everything is explode +
    window + join on word/phrase keys — no UDF, no quadratic."""
    t = load_tables(spark, sf_dir)
    toks = t["documents"].select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)").alias("ws"),
    )
    words = toks.select(
        "doc_id", F.posexplode("ws").alias("i0", "w")
    ).select("doc_id", (F.col("i0") + 1).alias("i"), "w")
    nonstop = words.where(~F.col("w").isin(*_RAKE_STOPS)).withColumn(
        "grp",
        F.col("i")
        - F.row_number().over(Window.partitionBy("doc_id").orderBy("i")),
    )
    phrases = (
        nonstop.groupBy("doc_id", "grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "w"))),
                    lambda s: s.w,
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
        .where(F.col("plen") <= _RAKE_MAX_PHRASE)
    )
    members = nonstop.join(phrases, ["doc_id", "grp"])
    wstats = members.groupBy("w").agg(
        F.round(F.lit(1000000.0) * F.sum("plen") / F.count("*"))
        .cast("long")
        .alias("s")
    )
    occ = (
        members.join(wstats, "w")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("s").alias("sc"))
    )
    return (
        occ.groupBy("phrase")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.min("sc").alias("msc"),
        )
        .orderBy(F.col("msc").desc(), F.col("phrase"))
        .limit(_RAKE_TOPK)
        .select(
            "phrase",
            "n_occurrences",
            F.round(F.col("msc") / 1000000.0, 6).alias("score"),
        )
    )


text_keyword_rake.__doc__ = text_keyword_rake.__doc__.format(
    n=_RAKE_MAX_PHRASE, k=_RAKE_TOPK
)


# ---------------------------------------------------------------------
# Video frame sampling
# ---------------------------------------------------------------------


@query(
    "multimodal_video_framesample",
    """
    WITH frames AS (
      SELECT doc_id,
             CAST(6 + doc_id % 5 AS INT) AS n_frames,
             CAST(u.f AS INT) AS frame_idx
      FROM documents, UNNEST(range(0, 6 + doc_id % 5, 3)) AS u(f)
    )
    SELECT CAST(doc_id AS BIGINT) AS media_id, n_frames, frame_idx,
           CAST(4 + doc_id % 5 AS INT) AS width,
           CAST(3 + doc_id % 3 AS INT) AS height,
           (doc_id % 100 + (frame_idx * 11) % 50)
             + (4 + doc_id % 5 - 1) / 2.0
             + (3 + doc_id % 3 - 1) / 2.0 AS mean_r,
           ((2 * doc_id) % 100 + (frame_idx * 11) % 50)
             + (4 + doc_id % 5 - 1) / 2.0 AS mean_g,
           ((3 * doc_id) % 100 + (frame_idx * 11) % 50)
             + (3 + doc_id % 3 - 1) / 2.0 AS mean_b
    FROM frames
    """,
)
def multimodal_video_framesample(spark, sf_dir):
    """FRAME-SAMPLE over a multi-frame binary video container: every
    3rd frame of the deterministic MBMP fixture is container-parsed
    and BMP-decoded to channel means inside ``mapInPandas`` Arrow
    batches (payloads never shuffle; output rows scale with sampled
    frames). The planted exposure ramp makes every sampled frame's
    means a closed form of (doc_id, frame_idx) — the oracle predicts
    them without touching a byte, the same contract the BMP/PNG/WAV
    decode queries use. Real video codecs stay documented raises
    (``decode_stub``); the container walk, stride sampling, schema,
    and batch shape are the real, tested plumbing."""
    from data_pipeline_001_spark.operators.multimodal import (
        video_frame_features,
    )

    t = load_tables(spark, sf_dir)
    return video_frame_features(t["documents"], stride=3)


# ---------------------------------------------------------------------
# Mahalanobis outlier detection over the embedding corpus
# ---------------------------------------------------------------------

#: planted-outlier id offset (the established 1e6 embedding offset)
_MAHA_OFF = 1_000_000
_MAHA_SHIFT = 5.0


@query(
    "embedding_mahalanobis_outliers",
    f"""
    WITH nat AS (SELECT COUNT(*) AS n FROM embeddings),
    pl AS (SELECT COUNT(*) AS np FROM embeddings WHERE vec_id % 97 = 0)
    SELECT CAST(nat.n + pl.np AS BIGINT) AS n_vecs,
           CAST(pl.np AS BIGINT) AS n_planted,
           TRUE AS all_planted_outrank,
           TRUE AS topk_all_planted
    FROM nat, pl
    """,
)
def embedding_mahalanobis_outliers(spark, sf_dir):
    """Mahalanobis-distance outlier detection: fit (μ, Σ) on the
    natural corpus, score natural + planted vectors, and verify the
    contract that every planted outlier (every 97th vector shifted by
    +{_MAHA_SHIFT} in ALL dimensions, id-offset by {_MAHA_OFF})
    outranks every natural vector. The shift adds ≈ shift²·d to the
    squared distance of a χ²(d)-distributed natural score — orders of
    magnitude beyond the natural extreme tail, so the contract is a
    statistical theorem at any corpus size, the graduated-oracle
    pattern of the LSH/ANN family. Fit cost is bounded by embedding
    dim (tree-aggregated Gram partials + a driver-side d×d
    inverse/Cholesky); scoring is one NumPy matmul per Arrow batch,
    no shuffle."""
    from data_pipeline_001_spark.operators.vector_stats import (
        mahalanobis_distances,
    )
    from data_pipeline_001_spark.plans.queries_llm import (
        _assert_planted_bound,
    )

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    _assert_planted_bound(e, "vec_id", _MAHA_OFF)
    planted = e.where(F.col("vec_id") % 97 == 0).select(
        (F.col("vec_id") + _MAHA_OFF).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.lit(_MAHA_SHIFT).cast("float")
        ).alias("embedding"),
        "label",
    )
    corpus = e.unionByName(planted)
    # ONE aggregation pass over the scored frame (round-8): the two
    # contract checks are the same theorem — "the top n_planted rows
    # by d2 are exactly the planted set" holds iff
    # min(planted d2) > max(natural d2) (strict: a boundary tie makes
    # limit-based top-k nondeterministic, so it must read as failure).
    # Computing both columns from that one expression removes the
    # previous persist() (whose cached blocks leaked across sweep
    # sessions — a lazily-returned plan can never know when to
    # unpersist) and the eager driver-side count() that made plan-only
    # tools (the plan gate explains every registry query) execute a
    # real job during what should be pure plan construction.
    d2 = mahalanobis_distances(corpus, fit_df=e)
    flagged = d2.select(
        "d2", (F.col("vec_id") >= _MAHA_OFF).alias("is_planted")
    )
    sep_expr = F.min(
        F.when(F.col("is_planted"), F.col("d2"))
    ) > F.max(F.when(~F.col("is_planted"), F.col("d2")))
    return flagged.agg(
        F.count("*").alias("n_vecs"),
        F.sum(F.col("is_planted").cast("long")).alias("n_planted"),
        sep_expr.alias("all_planted_outrank"),
        sep_expr.alias("topk_all_planted"),
    ).select(
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.col("n_planted").cast("long").alias("n_planted"),
        "all_planted_outrank",
        "topk_all_planted",
    )
