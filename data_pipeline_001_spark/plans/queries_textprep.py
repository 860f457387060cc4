"""Crawl-style text preparation: HTML boilerplate extraction and URL
canonicalization (round-4 additions to the LLM-pipeline surface).

Oracle strategy mirrors ``queries_multimodal``: the messy inputs are
built as DETERMINISTIC functions of ``doc_id`` Spark-side, so DuckDB
predicts the extractor/canonicalizer output analytically — the hash
gate then proves the operators invert exactly the mess that was
injected (script/style/comment blocks, entities, case, tracking
params), with no parallel implementation on the oracle side.

This module imports after ``queries_multimodal`` in
``__spark_entry__._registry`` — new registry entries queue behind the
pinned round-3 coverage backlog.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

_HTML_ORACLE = r"""
SELECT doc_id,
       trim('Doc ' || CAST(doc_id AS VARCHAR) || ' ' ||
            trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g'))) AS clean_text
FROM documents
"""


@query("text_html_extract", _HTML_ORACLE)
def text_html_extract(spark, sf_dir):
    """Wrap every document in deterministic HTML boilerplate — script
    with ``<``/``&&``/quotes, style, a comment, an ``<h1>`` heading
    that must SURVIVE (inner text kept), and the body text with ``a``
    entity-encoded as ``&#97;`` — then extract with ``html_to_text``.
    The oracle is the closed-form inverse: heading + original text,
    whitespace-normalized. All codegen regex; no UDF."""
    from data_pipeline_001_spark.operators.text_analysis import html_to_text

    t = load_tables(spark, sf_dir)
    html = F.concat(
        F.lit('<html>\n<head>\n<script type="text/javascript">'),
        F.lit('var x = 1 < 2 && "q";</script>\n'),
        F.lit("<style>p { color: red; }</style>\n<!-- comment -->\n"),
        F.lit("</head>\n<body>\n<h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1>\n<p>"),
        F.replace(F.col("text"), F.lit("a"), F.lit("&#97;")),
        F.lit("</p>\n</body>\n</html>"),
    )
    return t["documents"].select(
        "doc_id", html_to_text(html).alias("clean_text")
    )


_URL_ORACLE = """
SELECT doc_id,
       'https://ex' || CAST(doc_id % 50 AS VARCHAR) || '.com/Path'
         || CAST(doc_id % 7 AS VARCHAR) || '?id='
         || CAST(doc_id AS VARCHAR) AS canonical_url,
       'ex' || CAST(doc_id % 50 AS VARCHAR) || '.com' AS domain
FROM documents
"""


@query("text_url_canonicalize", _URL_ORACLE)
def text_url_canonicalize(spark, sf_dir):
    """Synthesize a messy per-document URL (uppercase scheme+host,
    ``www.`` prefix, trailing slash, ``utm_*`` tracking params around
    a real ``id`` param) and canonicalize it — the key a crawl
    pipeline dedups on and applies per-domain quotas to. The oracle
    is the closed-form canonical URL; path case must be PRESERVED
    while scheme/host fold, and only the tracking params drop."""
    from data_pipeline_001_spark.operators.text_analysis import (
        canonicalize_url,
        url_domain,
    )

    t = load_tables(spark, sf_dir)
    messy = F.concat(
        F.lit("HTTPS://WWW.EX"),
        (F.col("doc_id") % 50).cast("string"),
        F.lit(".COM/Path"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("/?utm_source=feed&id="),
        F.col("doc_id").cast("string"),
        F.lit("&utm_campaign=x"),
    )
    canon = canonicalize_url(messy)
    return t["documents"].select(
        "doc_id",
        canon.alias("canonical_url"),
        url_domain(canon).alias("domain"),
    )


_LINE_DEDUP_ORACLE = r"""
WITH base AS (
  SELECT doc_id,
         array_to_string(
           list_transform(
             generate_series(0, CAST(ceil(len(string_split(text,' '))/5.0) AS INT)-1),
             i -> array_to_string(string_split(text,' ')[(i*5+1):(i*5+5)], ' ')),
           chr(10))
         || chr(10)
         || CASE WHEN doc_id % 10 = 0
                 THEN 'follow us on example social' || chr(10) ELSE '' END
         || 'subscribe to our newsletter' AS lined
  FROM documents
),
lines AS (
  SELECT doc_id,
         generate_subscripts(string_split(lined, chr(10)), 1) - 1 AS pos,
         unnest(string_split(lined, chr(10))) AS line
  FROM base
),
freq AS (SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line),
kept AS (SELECT l.doc_id, l.pos, l.line
         FROM lines l JOIN freq f USING(line) WHERE f.df < 40),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text,
               COUNT(*) AS n_kept FROM kept GROUP BY doc_id),
totals AS (SELECT doc_id, COUNT(*) AS n_lines FROM lines GROUP BY doc_id)
SELECT t.doc_id, COALESCE(a.clean_text,'') AS clean_text,
       CAST(COALESCE(a.n_kept,0) AS BIGINT) AS n_kept,
       CAST(t.n_lines - COALESCE(a.n_kept,0) AS BIGINT) AS n_dropped
FROM totals t LEFT JOIN agg a USING(doc_id)
"""


@query("text_line_dedup", _LINE_DEDUP_ORACLE)
def text_line_dedup(spark, sf_dir):
    """CCNet-style line-level boilerplate removal (Wenzek et al.
    2020): documents are given deterministic line structure (5-word
    lines) plus planted boilerplate — a footer on EVERY document and
    a social line on every 10th — then ``line_dedup`` drops lines
    whose document frequency ≥ 40. The footer (df = corpus size) and
    the planted semi-common line must vanish; content lines survive
    in order. The DuckDB oracle runs the same dedup relationally, so
    the hash gate checks counts AND the reassembled text."""
    from data_pipeline_001_spark.operators.text_analysis import line_dedup

    t = load_tables(spark, sf_dir)
    words = F.split(F.col("text"), " ")
    lines = F.transform(
        F.sequence(
            F.lit(0),
            F.ceil(F.size(words) / F.lit(5.0)).cast("int") - F.lit(1),
        ),
        lambda i: F.array_join(
            F.slice(words, i * F.lit(5) + F.lit(1), F.lit(5)), " "
        ),
    )
    lined = F.concat(
        F.array_join(lines, "\n"),
        F.lit("\n"),
        F.when(
            F.col("doc_id") % 10 == 0,
            F.lit("follow us on example social\n"),
        ).otherwise(F.lit("")),
        F.lit("subscribe to our newsletter"),
    )
    fixture = t["documents"].select("doc_id", lined.alias("text"))
    return line_dedup(fixture, min_doc_freq=40)


_PROFILE_COLS = (
    ("l_orderkey", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
)

_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {"ROUND(CAST(MIN(" + c + ") AS DOUBLE), 6)" if kind == "num" else "CAST(NULL AS DOUBLE)"} AS min_num,
           {"ROUND(CAST(MAX(" + c + ") AS DOUBLE), 6)" if kind == "num" else "CAST(NULL AS DOUBLE)"} AS max_num,
           {"MIN(" + c + ")" if kind == "str" else "CAST(NULL AS VARCHAR)"} AS min_str,
           {"MAX(" + c + ")" if kind == "str" else "CAST(NULL AS VARCHAR)"} AS max_str
    FROM lineitem
    """
    for c, kind in _PROFILE_COLS
)


@query("profile_lineitem_columns", _PROFILE_ORACLE)
def profile_lineitem_columns(spark, sf_dir):
    """Deequ-style column profile of the fact table: null counts,
    exact distinct cardinality, numeric min/max, string lexicographic
    bounds. Exact mode plans one single-distinct aggregate PER column
    (round 11 removed the fused form's Expand row-blowup) — six
    one-column parquet scans whose total bytes equal one full-width
    scan; the genuinely ONE-scan fused plan is the operator's HLL
    default (see operators/profiling.py for the derived-input
    caveat).
    Exact distinct here for cross-engine equality; the operator's
    default is the mergeable HLL estimate for 100 TB-width profiles.
    ``mean_num`` is computed by the operator (pytest-verified) but
    excluded from the hash-gated projection: ROUND(AVG(double)) over
    a cross-engine float sum is the documented half-case flake class,
    while min/max/counts are order-independent exact values."""
    from data_pipeline_001_spark.operators.profiling import profile

    t = load_tables(spark, sf_dir)
    return profile(
        t["lineitem"],
        [c for c, _ in _PROFILE_COLS],
        exact_distinct=True,
    ).drop("mean_num")
