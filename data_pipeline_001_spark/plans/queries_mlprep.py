"""ML-serving preparation queries (round-4 additions): int8
quantization calibration over the embedding corpus and BPE
merge-pair statistics over the document corpus.

Both are thin registrations of operators (vector_stats /
text_analysis) with exact DuckDB oracles. This module imports after
``queries_textprep`` in ``__spark_entry__._registry`` — new registry
entries queue behind the pinned round-3 coverage backlog.
"""

from __future__ import annotations

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
