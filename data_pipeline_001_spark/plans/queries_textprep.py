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
       'Doc ' || CAST(doc_id AS VARCHAR) || ' ' ||
       trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g')) AS clean_text
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
