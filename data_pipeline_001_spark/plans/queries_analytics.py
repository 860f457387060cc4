"""Vector/corpus analytics queries (SURVEY.md §2.13 extension):
distributed covariance (tree-aggregated Gram matrix), PCA projection,
per-label centroids, and n-gram novelty scoring. Registers into the
shared REGISTRY.

``embedding_covariance`` / ``embedding_centroids`` /
``text_ngram_novelty`` carry exact DuckDB oracles.
``embedding_pca`` carries a CONTRACT oracle (SQL has no
eigendecomposition, but variance conservation, eigenvalue/projection
agreement, and orthonormality are checkable); the raw projection is
additionally pinned by NumPy-equivalence property tests in
tests/test_vector_stats.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@query(
    "embedding_covariance",
    """
    WITH e AS (SELECT vec_id, unnest(embedding) AS val,
                      generate_subscripts(embedding, 1) - 1 AS dim
               FROM embeddings)
    SELECT a.dim AS dim_i, b.dim AS dim_j,
           ROUND(covar_pop(a.val::DOUBLE, b.val::DOUBLE), 6) + 0.0 AS cov
    FROM e a JOIN e b ON a.vec_id = b.vec_id
    GROUP BY 1, 2
    """,
)
def embedding_covariance_q(spark, sf_dir):
    """d×d population covariance of the embedding corpus. Per-batch
    NumPy partial Gram matrices via mapInPandas, so the shuffle input
    is one d²-entry partial per Arrow batch — never n·d² rows."""
    from data_pipeline_001_spark.operators.vector_stats import covariance_matrix

    t = load_tables(spark, sf_dir)
    return covariance_matrix(t["embeddings"])


@query(
    "embedding_centroids",
    """
    WITH e AS (SELECT label, unnest(embedding) AS val,
                      generate_subscripts(embedding, 1) - 1 AS dim
               FROM embeddings)
    SELECT label, dim, ROUND(AVG(val::DOUBLE), 6) + 0.0 AS centroid
    FROM e GROUP BY label, dim
    """,
)
def embedding_centroids_q(spark, sf_dir):
    """Per-label mean embedding (the class-centroid table used by
    nearest-centroid classification and semantic-cluster summaries).
    posexplode fans out executor-side; the grouped average
    partial-aggregates map-side."""
    from data_pipeline_001_spark.operators.vector_stats import label_centroids

    t = load_tables(spark, sf_dir)
    return label_centroids(t["embeddings"])


_PCA_ORACLE = """
WITH dim_var AS (
  SELECT var_pop(CAST(x AS DOUBLE)) AS v
  FROM (SELECT unnest(embedding) AS x,
               unnest(range(len(embedding))) AS d
        FROM embeddings)
  GROUP BY d
)
SELECT (SELECT COUNT(*) FROM embeddings) AS n_vecs,
       ROUND(SUM(v), 6) AS total_var,
       TRUE AS explained_frac_ok,
       TRUE AS projection_var_ok,
       TRUE AS orthonormal_ok
FROM dim_var
"""


@query("embedding_pca", _PCA_ORACLE)
def embedding_pca_q(spark, sf_dir):
    """Top-4 PCA of the embedding corpus, graduated from rows-only to
    a CONTRACT oracle (round-2 pattern): SQL cannot express the
    eigendecomposition, but it CAN check what PCA must conserve. The
    query runs the real operator (driver-side eig on the d×d
    covariance + one codegen dot-product projection scan,
    ``vector_stats.pca_project``) and emits one row of invariants:

    * ``n_vecs`` / ``total_var`` — recomputed distributively the same
      way DuckDB does (per-dimension ``var_pop`` over the exploded
      corpus, summed): exact equality.
    * ``projection_var_ok`` — the population variance of each
      projected coordinate equals its eigenvalue to 1e-4 (ties the
      distributed projection to the driver-side eig).
    * ``explained_frac_ok`` — 0 < Σλ_top4 ≤ total_var, and the top-4
      eigenvalues explain at least the uniform 4/d share.
    * ``orthonormal_ok`` — max |VᵀV − I| ≤ 1e-8.

    The full projection stays available as
    ``vector_stats.pca_project`` (NumPy-equivalence property tests in
    tests/test_vector_stats.py). Bounded collects only: the 1-row
    variance aggregates and the d² covariance rows the eig already
    needed."""
    import numpy as np

    from data_pipeline_001_spark.operators.vector_stats import (
        _principal_components,
        pca_project,
    )

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    k = 4
    comps, lam = _principal_components(e, "embedding", k)

    total_var = (
        e.select(F.posexplode("embedding").alias("d", "x"))
        .groupBy("d")
        .agg(F.var_pop(F.col("x").cast("double")).alias("v"))
        .agg(F.sum("v").alias("tv"))
        .collect()[0]["tv"]
    )
    proj = pca_project(e, k=k)
    stats = proj.agg(
        F.count("*").alias("n"),
        *[F.var_pop(f"pc{i + 1}").alias(f"v{i + 1}") for i in range(k)],
    ).collect()[0]

    proj_var_ok = all(
        abs(stats[f"v{i + 1}"] - float(lam[i])) <= 1e-4 for i in range(k)
    )
    lam_sum = float(np.sum(lam))
    explained_ok = (
        0.0 < lam_sum <= total_var + 1e-6
        and lam_sum >= (k / comps.shape[1]) * total_var - 1e-3
    )
    gram = comps @ comps.T
    ortho_ok = bool(np.max(np.abs(gram - np.eye(k))) <= 1e-8)

    return spark.createDataFrame(
        [(int(stats["n"]), round(float(total_var), 6), explained_ok,
          proj_var_ok, ortho_ok)],
        "n_vecs long, total_var double, explained_frac_ok boolean, "
        "projection_var_ok boolean, orthonormal_ok boolean",
    )


@query(
    "text_ngram_novelty",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    g AS (SELECT DISTINCT doc_id,
                 unnest(CASE WHEN len(w) >= 3
                        THEN [array_to_string(w[i:i+2], ' ')
                              for i in range(1, len(w) - 3 + 2)]
                        ELSE [] END) AS gram
          FROM t),
    f AS (SELECT doc_id, MIN(doc_id) OVER (PARTITION BY gram) AS first_doc
          FROM g),
    per AS (SELECT doc_id, COUNT(*) AS n_grams,
                   SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
                       AS n_novel
            FROM f GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
           CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
           ROUND(COALESCE(CAST(p.n_novel AS DOUBLE) / p.n_grams, 0.0), 6)
               AS novelty
    FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id
    """,
)
def ngram_novelty_q(spark, sf_dir):
    """Word-3-gram novelty per document: the fraction of the doc's
    distinct grams first seen (min doc_id) in this doc — the "new
    content" budget signal for curation ordering."""
    from data_pipeline_001_spark.operators.text_analysis import ngram_novelty

    t = load_tables(spark, sf_dir)
    return ngram_novelty(t["documents"], n=3)


@query(
    "quality_drift_psi",
    """
    WITH base AS (SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS INT), 0), 9) AS bin,
                         COUNT(*) AS n
                  FROM events WHERE event_id % 2 = 0 AND value IS NOT NULL
                  GROUP BY 1),
    cur AS (SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS INT), 0), 9) AS bin,
                   COUNT(*) AS n
            FROM events WHERE event_id % 2 = 1 AND value IS NOT NULL
            GROUP BY 1),
    spine AS (SELECT unnest(range(10))::INT AS bin),
    j AS (SELECT s.bin,
                 COALESCE(b.n, 0) AS n_base,
                 COALESCE(c.n, 0) AS n_cur
          FROM spine s LEFT JOIN base b ON s.bin = b.bin
                       LEFT JOIN cur c ON s.bin = c.bin),
    tot AS (SELECT SUM(n_base) AS tb, SUM(n_cur) AS tc FROM j)
    SELECT j.bin,
           ROUND(CAST(j.n_base AS DOUBLE) / t.tb, 6) AS pct_base,
           ROUND(CAST(j.n_cur AS DOUBLE) / t.tc, 6) AS pct_cur,
           ROUND((GREATEST(CAST(j.n_cur AS DOUBLE) / t.tc, 1e-6)
                  - GREATEST(CAST(j.n_base AS DOUBLE) / t.tb, 1e-6))
                 * LN(GREATEST(CAST(j.n_cur AS DOUBLE) / t.tc, 1e-6)
                      / GREATEST(CAST(j.n_base AS DOUBLE) / t.tb, 1e-6)), 6)
               + 0.0 AS psi_term
    FROM j, tot t
    """,
)
def drift_psi_q(spark, sf_dir):
    """Distribution drift (PSI) of events.value between the even/odd
    event_id snapshot halves: deterministic equi-width bins over
    [0, 500), one narrow agg per side, broadcast bin-table join."""
    from data_pipeline_001_spark.operators.constraints import drift_psi

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    return drift_psi(
        ev.where(F.col("event_id") % 2 == 0),
        ev.where(F.col("event_id") % 2 == 1),
        "value",
        lo=0.0,
        hi=500.0,
        n_bins=10,
    )


@query(
    "curation_dsir_weights",
    f"""
    WITH t AS (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS w
               FROM documents),
    tok AS (SELECT doc_id,
                   ('0x' || substr(md5(unnest(w)), 1, 4))::UBIGINT % 1024
                       AS bucket
            FROM t),
    tt AS (SELECT bucket, COUNT(*) AS n FROM tok
           WHERE doc_id % 29 = 0 GROUP BY 1),
    rr AS (SELECT bucket, COUNT(*) AS n FROM tok
           WHERE doc_id % 29 <> 0 GROUP BY 1),
    spine AS (SELECT unnest(range(1024))::UBIGINT AS bucket),
    cnt AS (SELECT s.bucket, COALESCE(t2.n, 0) AS n_t, COALESCE(r2.n, 0) AS n_r
            FROM spine s
            LEFT JOIN tt t2 ON s.bucket = t2.bucket
            LEFT JOIN rr r2 ON s.bucket = r2.bucket),
    tot AS (SELECT SUM(n_t) AS tot_t, SUM(n_r) AS tot_r FROM cnt),
    ratio AS (SELECT bucket,
                     LN((n_t + 1.0) / (tot_t + 1024))
                     - LN((n_r + 1.0) / (tot_r + 1024)) AS lr
              FROM cnt, tot),
    scored AS (SELECT k.doc_id, COUNT(*) AS n_tokens,
                      ROUND(SUM(r.lr), 6) + 0.0 AS lw
               FROM (SELECT * FROM tok WHERE doc_id % 29 <> 0) k
               JOIN ratio r ON k.bucket = r.bucket
               GROUP BY k.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           COALESCE(s.lw, 0.0) AS log_weight
    FROM (SELECT doc_id FROM documents WHERE doc_id % 29 <> 0) d
    LEFT JOIN scored s ON d.doc_id = s.doc_id
    """,
)
def dsir_weights_q(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): score raw docs by
    hashed-unigram likelihood ratio against the doc_id%29 target
    split. Bucket tables are bounded by n_buckets so the log-ratio
    join broadcasts; corpus tokens never shuffle."""
    from data_pipeline_001_spark.operators.text_analysis import dsir_log_weights

    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    return dsir_log_weights(
        docs.where(F.col("doc_id") % 29 != 0),
        docs.where(F.col("doc_id") % 29 == 0),
        n_buckets=1024,
    )


@query(
    "text_unicode_normalize",
    """
    SELECT doc_id,
           nfc_normalize(text) AS nfc_text,
           strip_accents(text) AS ascii_text,
           CAST(CASE WHEN strip_accents(text) <> text THEN 1 ELSE 0 END
                AS INT) AS had_accents
    FROM documents
    """,
)
def unicode_normalize_q(spark, sf_dir):
    """Unicode NFC + accent-strip normalization over the corpus —
    Arrow-batched pandas UDFs (both engines implement UAX #15, so the
    oracle is exact; non-decomposable characters pass through on both
    sides). The synthetic corpus is ASCII, so the non-ASCII contract
    is pinned by planted unit tests rather than this oracle."""
    from data_pipeline_001_spark.functions.udfs import (
        nfc_normalize,
        strip_accents,
    )

    t = load_tables(spark, sf_dir)
    return t["documents"].select(
        "doc_id",
        nfc_normalize(F.col("text")).alias("nfc_text"),
        strip_accents(F.col("text")).alias("ascii_text"),
        (strip_accents(F.col("text")) != F.col("text"))
        .cast("int")
        .alias("had_accents"),
    )
