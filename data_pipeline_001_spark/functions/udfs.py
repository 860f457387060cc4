"""UDF / UDAF surface (SURVEY.md §2.11).

The reference's extension points are pluggable Python callables
(create_stage_id_func / create_target_id_func,
core/state_manager.py:434-467,490-536; swap-in source_count,
core/source_discovery_manager.py:9,103-109). Here the equivalents:

- scalar extension → Arrow-vectorized ``pandas_udf`` (never
  row-at-a-time ``udf`` in a hot path — 10-100× slower);
- aggregate extension (UDAF) → ``pandas_udf`` GROUPED_AGG;
- table-function extension (UDTF) → ``mapInPandas`` /
  ``applyInPandas`` (see operators.similarity / operators.multimodal);
- SQL registration → ``register_all(spark)`` exposes them to
  ``spark.sql`` callers.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def py_sigmoid(v: pd.Series) -> pd.Series:
    """Vectorized scalar pandas UDF: logistic squash of a value column.

    Stands in for any custom per-row score a user would plug in; the
    Arrow batch transfer keeps it ~vectorized-NumPy fast.
    """
    return 1.0 / (1.0 + (-v / 100.0).apply(math.exp))


@pandas_udf("double")
def weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (UDAF): Σ v·w / Σ w per group."""
    denom = w.sum()
    return float((v * w).sum() / denom) if denom else float("nan")


def register_all(spark) -> None:
    """Expose the Python extensions to SQL (spark.sql callers)."""
    spark.udf.register("py_sigmoid", py_sigmoid)
    spark.udf.register("weighted_mean", weighted_mean)


@pandas_udf("string")
def nfc_normalize(s: pd.Series) -> pd.Series:
    """Unicode NFC normalization (composed form) — the canonical first
    step of a multilingual text pipeline, so that 'é' composed and
    'é' decomposed hash/dedup identically. Arrow-vectorized;
    matches DuckDB's ``nfc_normalize`` (both implement UAX #15)."""
    import unicodedata

    return s.map(
        lambda x: unicodedata.normalize("NFC", x) if x is not None else None
    )


@pandas_udf("string")
def strip_accents(s: pd.Series) -> pd.Series:
    """Remove combining marks: NFD-decompose, drop M* category chars,
    recompose. 'Amélie' → 'Amelie'; characters with no canonical
    decomposition (ø, ß) pass through unchanged — the same contract as
    DuckDB's ``strip_accents`` for decomposable Latin, which the
    oracle relies on."""
    import unicodedata

    def _strip(x):
        if x is None:
            return None
        return unicodedata.normalize(
            "NFC",
            "".join(
                c
                for c in unicodedata.normalize("NFD", x)
                if not unicodedata.combining(c)
            ),
        )

    return s.map(_strip)
