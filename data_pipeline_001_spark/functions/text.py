"""Text scalar functions for the training-data pipeline surface
(SURVEY.md §2.13): tokenization, shingles, quality ratios, language
heuristics, fingerprints.

All JVM-side column expressions (no Python UDFs): at 100 TB these run
inside whole-stage codegen over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small multilingual stopword table for the n-gram/stopword language
# heuristic. Deliberately tiny & deterministic (public common words).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "de", "et", "un", "une", "est", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den"),
}

# whitespace spelled as the explicit java.util.regex \s class
# [ \t\n\x0B\f\r]: RE2's \s omits U+000B (vertical tab), so a bare
# \s in a pattern shared across JVM/Arrow-RE2/DuckDB engines counts
# \x0B as punctuation on one side and whitespace on the other
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"


def normalize_text(text: Column) -> Column:
    """lower-case + collapse whitespace — canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: MD5 of the normalized text."""
    return F.md5(normalize_text(text))


def whitespace_tokens(text: Column) -> Column:
    """array<string> of whitespace-split tokens."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (bigint)."""
    return F.size(whitespace_tokens(text)).cast("long")


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: words | numbers | single punctuation."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN)).cast("long")


def regex_token_count_arrow(text: Column) -> Column:
    """Same count as :func:`regex_token_count`, computed by RE2 via
    ``pyarrow.compute`` (functions.udfs.arrow_regex_count) — measured
    2.3× faster than JVM ``regexp_count`` on long document text.
    TOKEN_PATTERN is in the Java/RE2-agreeing subset (disjoint
    first-char alternatives, no lookarounds), so the two forms are
    bit-identical; a parity test asserts it."""
    from data_pipeline_001_spark.functions.udfs import arrow_regex_count

    return arrow_regex_count(TOKEN_PATTERN)(text)


def char_len(text: Column) -> Column:
    return F.length(text).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are common punctuation."""
    stripped = F.regexp_replace(text, r"[.,!?;:]", "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )


def digit_ratio(text: Column) -> Column:
    stripped = F.regexp_replace(text, r"[0-9]", "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.greatest(
        F.length(text).cast("double"), F.lit(1.0)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are ``lang`` stopwords."""
    words = STOPWORDS[lang]
    toks = whitespace_tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*words)))
    return hits.cast("double") / F.greatest(F.size(toks).cast("double"), F.lit(1.0))


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length-normalized minus
    punctuation/digit noise plus stopword naturalness. A heuristic in
    the style of public corpus-filtering pipelines (C4/Gopher rules)."""
    length_term = F.least(F.length(text).cast("double") / 500.0, F.lit(1.0))
    return F.round(
        F.greatest(
            F.least(
                0.5 * length_term
                + 0.5 * stopword_ratio(text)
                - punct_ratio(text)
                - digit_ratio(text),
                F.lit(1.0),
            ),
            F.lit(0.0),
        ),
        6,
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """array<string> of n-word shingles over the normalized text.

    Column-level convenience for small inputs; hot paths use the
    codegen row form ``operators.dedup.exploded_shingles`` (array
    higher-order functions evaluate interpreted)."""
    toks = whitespace_tokens(normalize_text(text))
    count = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(count - n, F.lit(0)))
    return F.when(count < n, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )


def char_ngrams(text: Column, n: int = 3) -> Column:
    """array<string> of character n-grams (for Jaccard similarity).

    Column-level convenience for small inputs; the corpus-scale path
    is the posexplode+lead form inside ``dedup.ngram_jaccard_pairs``."""
    norm = normalize_text(text)
    length = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(length - n + 1, F.lit(1)))
    return F.transform(idx, lambda i: F.substring(norm, i, F.lit(n)))
