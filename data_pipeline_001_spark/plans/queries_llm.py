"""LLM training-data pipeline query surface (SURVEY.md §2.13):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search (brute-force + LSH), text analysis, multimodal plumbing.
Registers into the shared REGISTRY in ``plans.queries``.

Oracle notes: the fingerprint/statistics/Jaccard/cosine queries have
exact DuckDB oracles; the murmur3-based sketches (MinHash, SimHash)
are deterministic but engine-specific (Spark's F.hash), so the driver
records rows-only checks for those.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

# whitespace class spelled explicitly: RE2's \s omits U+000B while the
# Spark side's Java \s includes it — the same cross-engine divergence
# TOKEN_PATTERN/_BPE_PATTERN fixed (keeps planted dedup-oracle row sets
# in sync with normalize_text on any input)
_NORM_SQL = "trim(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"


def _assert_planted_bound(corpus, id_col: str, offset: int) -> None:
    """Planted-copy contracts re-insert rows at ``id + offset`` and
    recover pairs via ``id_b - id_a == offset`` / ``id % offset``.
    Once real corpus ids reach the offset that arithmetic silently
    aliases real rows with planted copies, corrupting pair accounting;
    this one bounded scalar collect (column-pruned max over the id)
    makes scale growth fail loudly instead."""
    hi = corpus.agg(F.max(id_col)).first()[0]
    if hi is not None and hi >= offset:
        raise ValueError(
            f"planted-copy offset {offset} must exceed max({id_col})={hi}; "
            "raise the offset for this corpus scale"
        )


@query(
    "dedup_exact_fingerprint",
    f"""
    SELECT md5({_NORM_SQL}) AS fp,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def dedup_exact_q(spark, sf_dir):
    """Exact dedup: one shuffle on the text fingerprint; min-id survivor."""
    from data_pipeline_001_spark.operators.dedup import exact_duplicates

    t = load_tables(spark, sf_dir)
    return exact_duplicates(t["documents"])


@query(
    "text_stats_by_lang",
    """
    SELECT lang, COUNT(*) AS n_docs,
           ROUND(AVG(LENGTH(text)), 6) AS avg_chars,
           ROUND(AVG(len(string_split_regex(trim(text), '\\s+'))), 6) AS avg_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]'))) AS BIGINT)
               AS total_regex_tokens,
           ROUND(AVG((LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')))
                     / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0)), 6) AS avg_punct_ratio
    FROM documents GROUP BY lang
    """,
)
def text_stats(spark, sf_dir):
    """Text analysis rollup: chars / tokens / regex tokens / punct.

    The regex token count goes through the Arrow/RE2 path
    (functions.udfs.arrow_regex_count): profiled at sf10, the JVM
    ``regexp_count`` was 5.0 s of this query's 5.7 s — RE2 counts the
    same pattern 2.3× faster and the results are bit-identical (parity
    test in test_text_ops)."""
    from data_pipeline_001_spark.functions import text as TX

    t = load_tables(spark, sf_dir)
    tc = F.col("text")
    return t["documents"].groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(TX.char_len(tc)), 6).alias("avg_chars"),
        F.round(F.avg(TX.token_count(tc)), 6).alias("avg_tokens"),
        F.sum(TX.regex_token_count_arrow(tc)).alias("total_regex_tokens"),
        F.round(F.avg(TX.punct_ratio(tc)), 6).alias("avg_punct_ratio"),
    )


_STOP = {
    "de": "('der','die','das','und','ist','ein','zu','den')",
    "en": "('the','and','of','to','in','is','a','that')",
    "es": "('el','la','de','que','y','en','un','es')",
    "fr": "('le','la','de','et','un','une','est','que')",
}
_RATIO = {
    lang: (
        f"ROUND(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'), "
        f"t -> t IN {words})) AS DOUBLE) / GREATEST(len(string_split_regex(trim(lower(text)), "
        f"'\\s+')), 1), 6)"
    )
    for lang, words in _STOP.items()
}


@query(
    "text_language_id",
    f"""
    WITH r AS (
      SELECT doc_id,
             {_RATIO['de']} AS r_de, {_RATIO['en']} AS r_en,
             {_RATIO['es']} AS r_es, {_RATIO['fr']} AS r_fr
      FROM documents)
    SELECT doc_id,
           CASE WHEN GREATEST(r_de, r_en, r_es, r_fr) = 0 THEN 'und'
                WHEN r_fr >= r_es AND r_fr >= r_en AND r_fr >= r_de THEN 'fr'
                WHEN r_es >= r_en AND r_es >= r_de THEN 'es'
                WHEN r_en >= r_de THEN 'en'
                ELSE 'de' END AS predicted_lang,
           GREATEST(r_de, r_en, r_es, r_fr) AS lang_score
    FROM r
    """,
)
def text_langid(spark, sf_dir):
    """Heuristic language ID: argmax stopword-hit ratio (ties resolve
    to the alphabetically-last language in both engines)."""
    from data_pipeline_001_spark.operators.text_analysis import language_id

    t = load_tables(spark, sf_dir)
    return language_id(t["documents"])


# DuckDB twin of functions.text.quality_score — shared by the per-doc
# quality query and the end-to-end curation oracle (queries_curation).
QUALITY_SQL = """
    ROUND(GREATEST(LEAST(
             0.5 * LEAST(CAST(LENGTH(text) AS DOUBLE) / 500.0, 1.0)
             + 0.5 * (CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                       t -> t IN ('the','and','of','to','in','is','a','that'))) AS DOUBLE)
                      / GREATEST(len(string_split_regex(trim(lower(text)), '\\s+')), 1))
             - ((LENGTH(text) - LENGTH(regexp_replace(text, '[.,!?;:]', '', 'g')))
                / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0))
             - ((LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')))
                / GREATEST(CAST(LENGTH(text) AS DOUBLE), 1.0)),
           1.0), 0.0), 6)
"""


@query(
    "text_quality_scores",
    f"""
    SELECT doc_id, lang, {QUALITY_SQL} AS quality
    FROM documents
    """,
)
def text_quality(spark, sf_dir):
    """Corpus quality scoring (C4/Gopher-style length+stopword-punct
    heuristic) as a pure column expression."""
    from data_pipeline_001_spark.operators.text_analysis import quality_scores

    t = load_tables(spark, sf_dir)
    return quality_scores(t["documents"])


@query(
    "ngram_jaccard_pairs",
    f"""
    WITH g AS (
      SELECT doc_id, lang,
             list_distinct([substr(t, i, 3) for i in range(1, GREATEST(LENGTH(t) - 2, 1) + 1)]) AS grams
      FROM (SELECT doc_id, lang, {_NORM_SQL} AS t FROM documents)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
    FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.62
    """,
)
def ngram_jaccard_q(spark, sf_dir):
    """Character-3-gram Jaccard near-dup pairs, blocked by lang.

    The lang block bounds the self-join; the LSH variants below are
    the unblocked-scale path."""
    from data_pipeline_001_spark.operators.dedup import ngram_jaccard_pairs

    t = load_tables(spark, sf_dir)
    return ngram_jaccard_pairs(
        t["documents"], n=3, threshold=0.62, block_col="lang"
    )


_WINNOW_POWERS = [pow(257, 7 - j, (1 << 31) - 1) for j in range(8)]
_WINNOW_HASH = " + ".join(
    f"CAST(ascii(substr(s, i+{j}, 1)) AS BIGINT) * {p}"
    for j, p in enumerate(_WINNOW_POWERS)
)


@query(
    "text_winnowing_fingerprints",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS s FROM documents),
    h AS (SELECT doc_id,
                 [({_WINNOW_HASH}) % 2147483647
                  for i in range(1, GREATEST(LENGTH(s) - 8, 0) + 2)] AS hs
          FROM t WHERE LENGTH(s) >= 8),
    w AS (SELECT doc_id,
                 list_distinct([list_min(hs[i:i+3])
                                for i in range(1, len(hs) - 4 + 2)]) AS fps
          FROM h WHERE len(hs) >= 4)
    SELECT doc_id AS id, CAST(unnest(fps) AS BIGINT) AS fp FROM w
    """,
)
def text_winnowing(spark, sf_dir):
    """Rolling-hash winnowing fingerprints (SIGMOD'03) — the §2.13
    'document fingerprinting (rolling hash)' operator, with an exact
    arithmetic oracle (Rabin-Karp polynomial hash, base 257 mod
    2^31-1, k=8 grams, window 4)."""
    from data_pipeline_001_spark.operators.text_analysis import (
        winnowing_fingerprints,
    )

    t = load_tables(spark, sf_dir)
    return winnowing_fingerprints(t["documents"], k=8, window=4)


_MINHASH_PLANTED_ORACLE = f"""
SELECT doc_id AS pair_id, TRUE AS copy_pair_found
FROM (SELECT doc_id, {_NORM_SQL} AS s FROM documents)
WHERE doc_id % 50 = 0 AND len(string_split(s, ' ')) >= 3
"""


@query("dedup_minhash_lsh", _MINHASH_PLANTED_ORACLE)
def dedup_minhash_q(spark, sf_dir):
    """MinHash-LSH near-dup candidate pairs (banded signatures →
    bucket join → exact Jaccard verify ≥ 0.5).

    Graduated from rows-only to a planted-copy CONTAINMENT oracle
    (the `dedup_embedding_lsh` pattern): near-dup recall is
    probabilistic, but a VERBATIM copy has an identical murmur3
    signature, collides in every band, and its exact hashed-shingle
    Jaccard is 1.0 — a deterministic pair, provided its band buckets
    stay under ``max_bucket_size`` (at gate scales the duplicated
    text appears twice, nowhere near the 100-row cap). Every 50th
    shingleable doc (≥3 normalized tokens, the same predicate the
    oracle states in SQL) is re-inserted as doc_id + 10_000_000; each
    must surface as a verified pair with jaccard 1.0. The full pair
    frame stays covered by the planted-pair pytest suite."""
    from data_pipeline_001_spark.functions.text import normalize_text
    from data_pipeline_001_spark.operators.dedup import minhash_lsh_pairs

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    shingleable = (
        F.size(F.split(normalize_text(F.col("text")), r"\s+")) >= 3
    )
    _assert_planted_bound(docs, "doc_id", 10_000_000)
    orig = docs.where((F.col("doc_id") % 50 == 0) & shingleable)
    copies = orig.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    pairs = minhash_lsh_pairs(
        docs.unionByName(copies), num_hashes=32, bands=8, jaccard_threshold=0.5
    )
    found = pairs.where(
        (F.col("id_b") - F.col("id_a") == 10_000_000)
        & (F.col("id_a") % 50 == 0)
    ).select(F.col("id_a").alias("pair_id"), "jaccard")
    return (
        orig.select(F.col("doc_id").alias("pair_id"))
        .join(found, "pair_id", "left")
        .select(
            "pair_id",
            (
                F.col("jaccard").isNotNull()
                & (F.col("jaccard") >= 0.999999)
            ).alias("copy_pair_found"),
        )
    )


_SIMHASH_PLANTED_ORACLE = f"""
SELECT doc_id AS pair_id, TRUE AS copy_hamming_zero
FROM (SELECT doc_id, {_NORM_SQL} AS s FROM documents)
WHERE doc_id % 50 = 0 AND len(string_split(s, ' ')) >= 3
"""


@query("dedup_simhash", _SIMHASH_PLANTED_ORACLE)
def dedup_simhash_q(spark, sf_dir):
    """SimHash near-dup candidates: 64-bit signatures, prefix-block
    candidates, hamming distance ≤ 3.

    Graduated from rows-only to a planted-copy CONTAINMENT oracle:
    identical normalized text gives an identical 64-bit SimHash, so a
    planted verbatim copy shares all four 16-bit prefix blocks and
    must surface as a hamming-0 pair (the pigeonhole blocking cannot
    miss distance 0), provided its blocks stay under
    ``max_block_size`` — at gate scales the duplicated text appears
    twice against a 200-row cap. Same planted set + SQL predicate as
    `dedup_minhash_lsh`. The general hamming≤3 frame stays covered by
    the planted-pair pytest suite."""
    from data_pipeline_001_spark.functions.text import normalize_text
    from data_pipeline_001_spark.operators.dedup import simhash_near_duplicates

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    shingleable = (
        F.size(F.split(normalize_text(F.col("text")), r"\s+")) >= 3
    )
    _assert_planted_bound(docs, "doc_id", 10_000_000)
    orig = docs.where((F.col("doc_id") % 50 == 0) & shingleable)
    copies = orig.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    pairs = simhash_near_duplicates(docs.unionByName(copies)).where(
        F.col("hamming") <= 3
    )
    found = pairs.where(
        (F.col("id_b") - F.col("id_a") == 10_000_000)
        & (F.col("id_a") % 50 == 0)
    ).select(F.col("id_a").alias("pair_id"), "hamming")
    return (
        orig.select(F.col("doc_id").alias("pair_id"))
        .join(found, "pair_id", "left")
        .select(
            "pair_id",
            (
                F.col("hamming").isNotNull() & (F.col("hamming") == 0)
            ).alias("copy_hamming_zero"),
        )
    )


@query(
    "similarity_bruteforce_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id < 10),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  ROUND(list_cosine_similarity(q.q_vec, CAST(c.embedding AS DOUBLE[])), 6) AS cosine
           FROM q, embeddings c WHERE c.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cosine, rn FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS INT) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def similarity_bruteforce(spark, sf_dir):
    """Exact cosine top-k — queries broadcast, corpus streamed once."""
    from data_pipeline_001_spark.operators.similarity import brute_force_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return brute_force_topk(e, e.where(F.col("vec_id") < 10), k=5)


@query(
    "vector_norms",
    """
    SELECT vec_id,
           ROUND(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                              x -> x * x))), 6) AS l2_norm,
           ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) AS comp_sum,
           CAST(len(embedding) AS INT) AS dim
    FROM embeddings
    """,
)
def vector_norms(spark, sf_dir):
    """Array-function surface over array<float>: L2 norm + component
    sum via aggregate/transform (JVM-side)."""
    from data_pipeline_001_spark.functions.vectors import dot

    t = load_tables(spark, sf_dir)
    e = F.col("embedding")
    comp_sum = F.aggregate(
        e, F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return t["embeddings"].select(
        "vec_id",
        F.round(F.sqrt(dot(e, e)), 6).alias("l2_norm"),
        F.round(comp_sum, 6).alias("comp_sum"),
        F.size(e).alias("dim"),
    )


@query(
    "embedding_dimension_stats",
    """
    SELECT pos,
           ROUND(AVG(val), 6) AS mean_val,
           ROUND(MIN(val), 6) AS min_val,
           ROUND(MAX(val), 6) AS max_val
    FROM (SELECT CAST(generate_subscripts(embedding, 1) AS INT) AS pos,
                 CAST(unnest(embedding) AS DOUBLE) AS val
          FROM embeddings)
    GROUP BY pos
    """,
)
def embedding_dim_stats(spark, sf_dir):
    """posexplode over the vector column → per-dimension statistics
    (the feature-distribution profile of an embedding corpus)."""
    t = load_tables(spark, sf_dir)
    return (
        t["embeddings"]
        .select(F.posexplode("embedding").alias("pos0", "val"))
        .select((F.col("pos0") + 1).cast("int").alias("pos"), F.col("val").cast("double").alias("val"))
        .groupBy("pos")
        .agg(
            F.round(F.avg("val"), 6).alias("mean_val"),
            F.round(F.min("val"), 6).alias("min_val"),
            F.round(F.max("val"), 6).alias("max_val"),
        )
    )


_ANN_PLANTED_ORACLE = """
SELECT vec_id AS query_id, TRUE AS copy_found,
       TRUE AS copy_cosine_one, TRUE AS copy_rank1
FROM embeddings WHERE vec_id < 10
"""


def _ann_planted_contract(topk_fn, e, n_queries=10, **kw):
    """Shared planted-copy containment harness for the approximate
    top-k paths (LSH / IVF / PQ): re-insert each query vector as an
    exact copy (vec_id + 1_000_000), run the ANN operator over
    corpus+copies, and report per query whether the copy surfaced,
    scored cosine 1.0, and ranked first. General-neighbor recall
    stays covered by the recall-vs-brute-force pytest suite; this
    contract checks the deterministic guarantee an exact duplicate
    carries through each index structure."""
    base = e.select("vec_id", "embedding")
    _assert_planted_bound(base, "vec_id", 1_000_000)
    orig = base.where(F.col("vec_id") < n_queries)
    copies = orig.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    out = topk_fn(base.unionByName(copies), orig, **kw)
    hit = out.where(
        F.col("neighbor_id") == F.col("query_id") + 1_000_000
    ).select("query_id", F.col("cosine").alias("_cos"), F.col("rn").alias("_rn"))
    return (
        orig.select(F.col("vec_id").alias("query_id"))
        .join(hit, "query_id", "left")
        .select(
            "query_id",
            F.col("_cos").isNotNull().alias("copy_found"),
            (F.col("_cos").isNotNull() & (F.col("_cos") >= 0.999999)).alias(
                "copy_cosine_one"
            ),
            (F.coalesce(F.col("_rn"), F.lit(99)) == 1).alias("copy_rank1"),
        )
    )


@query("similarity_lsh_topk", _ANN_PLANTED_ORACLE)
def similarity_lsh(spark, sf_dir):
    """Random-hyperplane LSH ANN: bucketed candidates + multi-probe.
    The scale path — candidates/query ≈ corpus/2^bits · probes.

    Graduated from rows-only to a planted-copy CONTAINMENT oracle: an
    exact copy of a query vector has an identical hyperplane signature
    in every table, so it is a guaranteed candidate in the unflipped
    probe bucket (lsh_topk has no bucket cap) and the exact cosine
    verify ranks it first at 1.0. Recall on general neighbors is
    probabilistic and stays bounded by
    tests/test_llm_operators.py::test_lsh_recall_reasonable."""
    from data_pipeline_001_spark.operators.similarity import lsh_topk

    t = load_tables(spark, sf_dir)
    # near-uniform synthetic vectors separate weakly (top-5 cosine ≈
    # 0.3), so recall needs generous tables/probes; clustered real
    # embeddings reach the same recall with far fewer candidates
    return _ann_planted_contract(
        lsh_topk, t["embeddings"], k=5, bits=6, tables=8, probes=7
    )


@query(
    "similarity_numpy_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS q_vec
               FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, c.vec_id AS neighbor_id,
                  ROUND(list_cosine_similarity(q.q_vec, CAST(c.embedding AS DOUBLE[])), 6) AS cosine
           FROM q, embeddings c WHERE c.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rn FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def similarity_numpy(spark, sf_dir):
    """Arrow-batched mapInPandas top-k (NumPy matmul per batch) — the
    Pandas-UDF pattern for score functions beyond column expressions."""
    from data_pipeline_001_spark.operators.similarity import numpy_topk_batches

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    qvecs = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.where(F.col("vec_id") < 5).collect()
    ]
    return numpy_topk_batches(e, qvecs, k=5)


@query("similarity_ivf_topk", _ANN_PLANTED_ORACLE)
def similarity_ivf(spark, sf_dir):
    """IVF ANN: mini-kmeans coarse quantizer → inverted lists →
    nprobe-bounded fine search. The second scale path next to LSH.

    Graduated from rows-only to a planted-copy CONTAINMENT oracle: an
    exact copy is assigned to the query's own nearest centroid, which
    is by definition among the query's nprobe probed lists, so the
    copy is a guaranteed candidate for ANY trained centroid set and
    the exact rerank puts it first at cosine 1.0. Recall on general
    neighbors stays bounded by the recall pytest suite."""
    from data_pipeline_001_spark.operators.similarity import ivf_topk

    t = load_tables(spark, sf_dir)
    return _ann_planted_contract(
        ivf_topk, t["embeddings"], k=5, n_centroids=16, nprobe=6
    )


@query(
    "dedup_embedding_cosine",
    """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])) >= 0.5
    """,
)
def dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (§2.13 'embedding-cosine
    near-dup'). Exact O(n²) pairwise — the small-sf ORACLE TWIN of the
    primary scale path `dedup_embedding_lsh`; never the plan to run on
    a full corpus.

    Round-11 shape: one batched-NumPy Arrow task
    (`pairwise_cosine_pairs`) replaces the broadcast BNLJ whose
    interpreted 64-term HOF fold ran twice per pair (filter +
    projection). The emitted doubles are bit-identical to the join
    form (same fold order, same dot/(na*nb) grouping; zero-norm
    vectors stay loud — see the operator docstring); rounding stays
    in the JVM exactly as before. Same-session best-of-3 on the
    2000-row sf0.1 table: 26.0 → 1.5 s; the r10-era join-form
    history: inlined cosine 103 s → prenormed ~35 s."""
    from data_pipeline_001_spark.operators.similarity import (
        pairwise_cosine_pairs,
    )

    t = load_tables(spark, sf_dir)
    pairs = pairwise_cosine_pairs(t["embeddings"], threshold=0.5)
    return pairs.select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


@query(
    "dedup_cluster_components",
    f"""
    WITH g AS (
      SELECT doc_id, lang,
             list_distinct([substr(t, i, 3) for i in range(1, GREATEST(LENGTH(t) - 2, 1) + 1)]) AS grams
      FROM (SELECT doc_id, lang, {_NORM_SQL} AS t FROM documents)
    ), edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.62
    ), sym AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ), reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.dst, r.label FROM r JOIN sym s ON s.src = r.node
      ) SELECT node, label FROM r
    )
    SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1
    """,
)
def dedup_clusters_q(spark, sf_dir):
    """Near-dup CLUSTERS: min-label connected components over the
    deterministic n-gram-Jaccard pair set — one (doc_id, cluster_id)
    row per document that has at least one near-dup. The oracle
    computes the same components with a recursive CTE (min reachable
    id)."""
    from data_pipeline_001_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    t = load_tables(spark, sf_dir)
    pairs = ngram_jaccard_pairs(t["documents"], n=3, threshold=0.62, block_col="lang")
    return connected_components(pairs)


_LSH_CLUSTER_PLANTED_ORACLE = f"""
SELECT doc_id AS pair_id, TRUE AS same_cluster
FROM (SELECT doc_id, {_NORM_SQL} AS s FROM documents)
WHERE doc_id % 50 = 0 AND len(string_split(s, ' ')) >= 3
"""


@query("dedup_cluster_components_lsh", _LSH_CLUSTER_PLANTED_ORACLE)
def dedup_clusters_lsh_q(spark, sf_dir):
    """SCALE-PATH near-dup clusters: the same min-label propagation,
    sourced from MinHash-LSH verified pairs instead of the blocked
    n-gram Jaccard self-join. The lang-blocked Jaccard twin above is
    oracle-exact but quadratic per block (10k-doc blocks at sf1 are
    already 50M-pair joins); the LSH source keeps pair generation
    ~linear in corpus size, so this is the registered form a 100 TB
    corpus dedup would run. Cluster membership agreement with the
    exact twin is bounded in tests/test_llm_operators.py.

    Graduated from rows-only to a planted-copy CONTAINMENT oracle:
    a verbatim copy is a deterministic MinHash-LSH pair (identical
    signature → collides in every band → exact Jaccard 1.0, see
    `dedup_minhash_lsh`), and min-label propagation puts both
    endpoints of any surfaced pair in one component — so each planted
    (orig, orig+10M) pair must land in the same cluster."""
    from data_pipeline_001_spark.functions.text import normalize_text
    from data_pipeline_001_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    shingleable = (
        F.size(F.split(normalize_text(F.col("text")), r"\s+")) >= 3
    )
    _assert_planted_bound(docs, "doc_id", 10_000_000)
    orig = docs.where((F.col("doc_id") % 50 == 0) & shingleable)
    copies = orig.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    pairs = minhash_lsh_pairs(docs.unionByName(copies))
    clusters = connected_components(pairs)
    c_orig = clusters.select(
        F.col("doc_id").alias("pair_id"), F.col("cluster_id").alias("_ca")
    )
    c_copy = clusters.select(
        (F.col("doc_id") - F.lit(10_000_000)).alias("pair_id"),
        F.col("cluster_id").alias("_cb"),
    ).where(F.col("pair_id") >= 0)
    return (
        orig.select(F.col("doc_id").alias("pair_id"))
        .join(c_orig, "pair_id", "left")
        .join(c_copy, "pair_id", "left")
        .select(
            "pair_id",
            (
                F.col("_ca").isNotNull()
                & F.col("_cb").isNotNull()
                & (F.col("_ca") == F.col("_cb"))
            ).alias("same_cluster"),
        )
    )


@query(
    "text_pii_scrub",
    """
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com or +1-555-01'
                  || CAST(doc_id % 100 AS VARCHAR) || '9 today' AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(length(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_emails,
           CAST(length(regexp_extract_all(t, '\\+?\\d[\\d -]{7,}\\d')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                          '\\+?\\d[\\d -]{7,}\\d', '<PHONE>', 'g') AS scrubbed_text
    FROM aug
    """,
)
def text_pii_scrub_q(spark, sf_dir):
    """PII scrubbing pass (email + phone redaction) over documents
    augmented with synthetic per-doc PII so the scrub is exercised on
    every row. RE2-safe regexes shared verbatim with the oracle."""
    from data_pipeline_001_spark.operators.text_analysis import scrub_pii

    t = load_tables(spark, sf_dir)
    aug = t["documents"].select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +1-555-01"),
            (F.col("doc_id") % 100).cast("string"),
            F.lit("9 today"),
        ).alias("text"),
    )
    return scrub_pii(aug)


@query(
    "text_repetition_ratio",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex({_NORM_SQL}, '\\s+') AS tk FROM documents
    ), sh AS (
      SELECT doc_id,
             unnest(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                    ELSE [tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]
                          for i in range(1, len(tk) - 1)] END) AS sh
      FROM toks
    ), c AS (
      SELECT doc_id, sh, COUNT(*) AS cnt FROM sh GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_shingles,
           CAST(MAX(cnt) AS BIGINT) AS max_shingle_count,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / SUM(cnt), 6) AS repetition_ratio
    FROM c GROUP BY 1
    """,
)
def text_repetition_q(spark, sf_dir):
    """Gopher-style repetition flag: max word-trigram frequency share
    per document (boilerplate/keyword-stuffing detector)."""
    from data_pipeline_001_spark.operators.text_analysis import repetition_ratio

    t = load_tables(spark, sf_dir)
    return repetition_ratio(t["documents"])


@query(
    "text_chunk_documents",
    """
    WITH base AS (
      SELECT doc_id, text,
             CAST(ceil(greatest(length(text)-40,1)/160.0) AS BIGINT) AS n_chunks
      FROM documents
    ), fan AS (
      SELECT doc_id, text, unnest(range(0, n_chunks)) AS i FROM base
    )
    SELECT doc_id, CAST(i AS INT) AS chunk_id, CAST(i*160 AS INT) AS chunk_start,
           substring(text, CAST(i*160 + 1 AS INT), 200) AS chunk_text,
           CAST(length(substring(text, CAST(i*160+1 AS INT), 200)) AS INT) AS chunk_chars
    FROM fan
    """,
)
def text_chunking(spark, sf_dir):
    """Overlapping fixed-window document chunking (RAG/pretraining
    preprocessing): sequence + posexplode fan-out, executor-side, no
    shuffle, no UDF."""
    from data_pipeline_001_spark.operators.text_analysis import chunk_documents

    t = load_tables(spark, sf_dir)
    return chunk_documents(t["documents"], chunk_chars=200, overlap_chars=40)


_LSH_PLANTED_ORACLE = """
SELECT vec_id AS pair_id, TRUE AS exact_copy_found
FROM embeddings WHERE vec_id % 50 = 0
"""


@query("dedup_embedding_lsh", _LSH_PLANTED_ORACLE)
def dedup_embedding_lsh_q(spark, sf_dir):
    """PRIMARY embedding near-dup path (§2.13): multi-table
    hyperplane-LSH candidate buckets → exact cosine verify. Cost is
    Σ bucket² (skew-capped), not corpus²; precision 1.0 against the
    exact twin `dedup_embedding_cosine`, recall bounded in
    tests/test_llm_operators.py::test_embedding_lsh_recall_vs_exact.
    bits auto-scale with corpus size (bits=None) so candidate volume
    stays linear in n at any sf.

    Graduated from rows-only to a planted-copy CONTAINMENT oracle:
    general-pair recall is probabilistic (not SQL-checkable), but an
    EXACT copy produces identical hyperplane signatures in every
    table — a deterministic, not probabilistic, collision — so a
    planted duplicate (every 50th vector re-inserted as
    vec_id + 1_000_000) is guaranteed to surface as a verified pair
    with cosine 1.0, unless its bucket blew past ``max_bucket_size``
    in all 16 tables at once (auto-bits keeps average buckets ~64
    rows, so a >500 bucket does not occur at gate scales). The full
    pair frame stays recall-tested against the exact twin."""
    from data_pipeline_001_spark.operators.similarity import embedding_near_dup_lsh

    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding")
    _assert_planted_bound(e, "vec_id", 1_000_000)
    orig = e.where(F.col("vec_id") % 50 == 0)
    copies = orig.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"), "embedding"
    )
    pairs = embedding_near_dup_lsh(
        e.unionByName(copies), threshold=0.4, bits=None, tables=16, dim=64
    )
    found = pairs.where(
        (F.col("id_b") - F.col("id_a") == 1_000_000)
        & (F.col("id_a") % 50 == 0)
    ).select(F.col("id_a").alias("pair_id"), "cosine")
    return orig.select(F.col("vec_id").alias("pair_id")).join(
        found, "pair_id", "left"
    ).select(
        "pair_id",
        (F.col("cosine").isNotNull() & (F.col("cosine") >= 0.999999)).alias(
            "exact_copy_found"
        ),
    )


@query(
    "grouped_map_zscore",
    """
    SELECT event_id, event_type,
           ROUND((value - AVG(value) OVER (PARTITION BY event_type))
                 / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
    FROM events
    """,
)
def grouped_map_zscore(spark, sf_dir):
    """Grouped-map applyInPandas (§2.11 UDTF surface): per-group
    z-score normalization in pandas, verified against the SQL window
    formulation."""
    import pandas as pd

    t = load_tables(spark, sf_dir)

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf["value"].std(ddof=1)
        z = (pdf["value"] - pdf["value"].mean()) / std
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "zscore": z.round(6),
            }
        )

    return (
        t["events"]
        .select("event_id", "event_type", "value")
        .groupBy("event_type")
        .applyInPandas(zscore, "event_id long, event_type string, zscore double")
    )


@query(
    "multimodal_binary_features",
    """
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           lower(substr(hex(encode(text)), 1, 16)) AS head_hex,
           sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_features(spark, sf_dir):
    """Binary-column multimodal plumbing: payload + typed metadata →
    Arrow-batched feature extraction (decode step stubbed; byte-level
    features real).

    The full mapInPandas featurizer runs (including the zlib entropy
    proxy — covered by pytest); the registry entry emits the columns
    an independent engine can recompute from the same bytes —
    byte length, first-8-bytes hex, sha256 — so the Arrow
    binary round-trip is hash-verified end-to-end against DuckDB's
    own UTF-8 encoding of the corpus."""
    from data_pipeline_001_spark.operators.multimodal import (
        attach_binary_payload,
        extract_features,
    )

    t = load_tables(spark, sf_dir)
    media = attach_binary_payload(t["documents"])
    return extract_features(media).select(
        "media_id", "byte_len", "head_hex", "sha256"
    )


_SEMANTIC_ORACLE = """
SELECT vec_id AS pair_id,
       TRUE AS same_component,
       TRUE AS not_both_kept
FROM embeddings WHERE vec_id % 50 = 0
"""

#: cosine threshold for dedup_semantic_clusters. PINNED BELOW 1.0 BY
#: MARGIN: the operator computes within-cluster cosines via BLAS
#: matmul, whose accumulation order differs from a sequential fold by
#: ~1 ulp — the planted-copy oracle is only order-invariant because
#: identical vectors score exactly 1.0, a 0.07 margin above this
#: threshold. tests/test_llm_operators.py asserts the margin stays
#: ≥ 0.01 so a future "tighten to 0.999" edit can't silently
#: reintroduce boundary sensitivity (round-9 advice).
SEMANTIC_DEDUP_THRESHOLD = 0.93


@query("dedup_semantic_clusters", _SEMANTIC_ORACLE)
def dedup_semantic_q(spark, sf_dir):
    """SemDeDup-style semantic dedup (Abbas et al. 2023): coarse
    k-means clusters bound the pairwise cosine search; one canonical
    survivor per near-dup component. Graduated from rows-only to a
    planted-copy CONTAINMENT oracle (round-2 pattern): the trained
    k-means routing is not SQL-reproducible, but what dedup must DO
    to an exact duplicate is. Every 50th vector is planted back into
    the corpus as an exact copy (vec_id + 1_000_000); identical
    vectors route to the same cluster deterministically and their
    cosine is 1.0 ≥ threshold, so each planted pair is guaranteed to
    land in one near-dup component (``same_component``) with at most
    one survivor (``not_both_kept`` — the component's canonical
    min-id may be a third member, so 'exactly one of the pair kept'
    is NOT guaranteed, and the contract doesn't claim it). Holds as
    long as no cluster exceeds ``max_cluster_size`` (sub-bucketing
    splits on id hash) — at gate scales clusters are ~500 rows. The
    full keep/remove frame remains property-tested in
    tests/test_llm_operators.py."""
    from data_pipeline_001_spark.operators.similarity import semantic_dedup

    t = load_tables(spark, sf_dir)
    e = t["embeddings"].select("vec_id", "embedding", "label")
    _assert_planted_bound(e, "vec_id", 1_000_000)
    orig = e.where(F.col("vec_id") % 50 == 0)
    copies = orig.select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        "embedding",
        "label",
    )
    out = semantic_dedup(
        e.unionByName(copies), threshold=SEMANTIC_DEDUP_THRESHOLD
    )
    pair_rows = out.where(F.col("vec_id") % 50 == 0)  # 1_000_000 % 50 == 0
    return (
        pair_rows.groupBy(
            (F.col("vec_id") % 1_000_000).alias("pair_id")
        )
        .agg(
            (
                (F.count("group_id") == 2)
                & (F.countDistinct("group_id") == 1)
            ).alias("same_component"),
            (F.sum(F.col("keep").cast("int")) <= 1).alias("not_both_kept"),
        )
    )


@query("similarity_pq_topk", _ANN_PLANTED_ORACLE)
def similarity_pq(spark, sf_dir):
    """Product-quantization ANN (ADC scan over m-byte codes + exact
    rerank): the memory-bounded scale path — a 100 TB corpus of
    64-float vectors becomes ~3 TB of codes, scannable without
    touching a float vector until rerank.

    Graduated from rows-only to a planted-copy CONTAINMENT oracle.
    Unlike LSH/IVF this is not a theorem — ADC ranks by quantized
    inner product, and another vector's reconstruction CAN outscore
    the copy's own — but the copy's ADC score is near-maximal by
    construction, and with ``rerank=8`` (40 ADC survivors per query)
    the copy reached rerank in every validation run at
    sf0.001/0.01/0.1; the exact rerank then pins it at rank 1,
    cosine 1.0. A miss would surface as a loud FALSE row, i.e. this
    pins the recall contract the operator is designed to meet.
    General-neighbor recall stays bounded by the pytest suite."""
    from data_pipeline_001_spark.operators.similarity import pq_topk

    t = load_tables(spark, sf_dir)
    return _ann_planted_contract(
        pq_topk, t["embeddings"], k=5, m=8, nbits=4, rerank=8
    )


@query(
    "dedup_incremental_near",
    f"""
    WITH t AS (SELECT doc_id, {_NORM_SQL} AS s FROM documents),
    b AS (SELECT doc_id, s FROM t WHERE doc_id % 2 = 1),
    c AS (SELECT DISTINCT s FROM t WHERE doc_id % 2 = 0)
    SELECT b.doc_id,
           CASE WHEN len(string_split(b.s, ' ')) >= 3
                THEN (c.s IS NOT NULL) ELSE NULL END AS is_exact_dup,
           CASE WHEN len(string_split(b.s, ' ')) >= 3 AND c.s IS NOT NULL
                THEN TRUE ELSE NULL END AS exact_dup_rejected
    FROM b LEFT JOIN c ON b.s = c.s
    """,
)
def dedup_incremental_near_q(spark, sf_dir):
    """Incremental near-dup admission gate: odd doc_ids (the daily
    batch) against even doc_ids (the corpus); batch bands broadcast,
    the corpus never self-joins.

    The MinHash estimates themselves are murmur3-sketch values no
    other engine reproduces, so the cross-engine gate checks the
    sketch's GUARANTEE: a batch document whose normalized text exists
    verbatim in the corpus has an identical signature, collides in
    every band, and must therefore be rejected (admitted = 0). The
    oracle independently finds those exact duplicates in SQL and
    expects ``exact_dup_rejected = TRUE`` for each (NULL for docs too
    short to shingle). The bucket-size cap is DISABLED here
    (``max_bucket_size=0``): the guarantee is only unconditional
    without it — a boilerplate-heavy corpus can push a band bucket
    past the cap and silently drop the exact dup's collisions
    (review round 3) — while the production ingest path keeps the
    operator's default cap and accepts that documented miss class.
    Near-dup (non-verbatim) behavior stays covered by the
    planted-pair pytest suite."""
    from data_pipeline_001_spark.functions.text import normalize_text
    from data_pipeline_001_spark.operators.dedup import minhash_incremental

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    batch = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    gate = minhash_incremental(
        batch, corpus, jaccard_threshold=0.5, max_bucket_size=0
    )

    normb = batch.select(
        "doc_id", normalize_text(F.col("text")).alias("s")
    )
    corpus_s = (
        corpus.select(normalize_text(F.col("text")).alias("s"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    shingleable = F.size(F.split(F.col("s"), " ")) >= 3
    is_exact = F.when(shingleable, F.col("_hit").isNotNull())
    return (
        normb.join(corpus_s, "s", "left")
        .join(gate.select("doc_id", "admitted"), "doc_id")
        .select(
            "doc_id",
            is_exact.alias("is_exact_dup"),
            F.when(
                shingleable & F.col("_hit").isNotNull(),
                F.col("admitted") == 0,
            ).alias("exact_dup_rejected"),
        )
    )


@query(
    "dedup_cluster_canonical",
    f"""
    WITH g AS (
      SELECT doc_id, lang,
             list_distinct([substr(t, i, 3) for i in range(1, GREATEST(LENGTH(t) - 2, 1) + 1)]) AS grams
      FROM (SELECT doc_id, lang, {_NORM_SQL} AS t FROM documents)
    ), edges AS (
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM g a JOIN g b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.62
    ), sym AS (
      SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
    ), reach AS (
      WITH RECURSIVE r(node, label) AS (
        SELECT DISTINCT src, src FROM sym
        UNION
        SELECT s.dst, r.label FROM r JOIN sym s ON s.src = r.node
      ) SELECT node, label FROM r
    ), comp AS (
      SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY 1
    ), q AS (
      SELECT doc_id, {QUALITY_SQL} AS quality FROM documents
    )
    SELECT cluster_id, doc_id AS canonical_id, quality AS best_quality,
           n_members
    FROM (SELECT c.cluster_id, c.doc_id, q.quality,
                 CAST(COUNT(*) OVER (PARTITION BY c.cluster_id) AS BIGINT)
                     AS n_members,
                 ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                    ORDER BY q.quality DESC, c.doc_id) AS rn
          FROM comp c JOIN q USING (doc_id))
    WHERE rn = 1
    """,
)
def cluster_canonical_q(spark, sf_dir):
    """Cluster → survivor selection: for every near-dup cluster keep
    the HIGHEST-quality member (tie → lowest id) — the final step of
    the detect → cluster → select dedup flow, where the kept document
    is chosen on merit instead of min-id. Window argmax per cluster
    over the (tiny) component table joined to quality scores."""
    from pyspark.sql import Window

    from data_pipeline_001_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from data_pipeline_001_spark.operators.text_analysis import quality_scores

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    comp = connected_components(
        ngram_jaccard_pairs(docs, n=3, threshold=0.62, block_col="lang")
    )
    q = quality_scores(docs).select("doc_id", "quality")
    joined = comp.join(q, "doc_id")
    wc = Window.partitionBy("cluster_id")
    wr = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    return (
        joined.withColumn("n_members", F.count("*").over(wc).cast("long"))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("canonical_id"),
            F.col("quality").alias("best_quality"),
            "n_members",
        )
    )
