"""Document-corpus analysis operators (SURVEY.md §2.13): per-doc
stats, quality scoring, heuristic language ID, fingerprinting —
thin compositions of ``functions.text`` column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_001_spark.functions import text as TX


def document_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document metrics: chars, whitespace tokens, regex tokens,
    punctuation/digit ratios, fingerprint."""
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        "lang",
        TX.char_len(t).alias("n_chars_computed"),
        TX.token_count(t).alias("n_tokens"),
        TX.regex_token_count(t).alias("n_regex_tokens"),
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.digit_ratio(t), 6).alias("digit_ratio"),
        TX.fingerprint(t).alias("fp"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        "lang",
        TX.quality_score(t).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax stopword-hit ratio across the
    small built-in stopword tables; 'und' when nothing hits."""
    t = F.col(text_col)
    scores = F.array(
        *[
            F.struct(
                F.round(TX.stopword_ratio(t, lang), 6).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(TX.STOPWORDS)
        ]
    )
    best = F.array_max(scores)
    return docs.select(
        "doc_id",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "predicted_lang"
        ),
        best["score"].alias("lang_score"),
    )
