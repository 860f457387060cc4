"""UDF-surface queries (SURVEY.md §2.11): scalar pandas UDF and
GROUPED_AGG pandas UDAF, each with an exact DuckDB oracle (the Python
functions compute closed-form expressions the oracle can mirror).
Registers into the shared REGISTRY in ``plans.queries``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.plans.queries_curation2 import _NORM_SQL
from data_pipeline_001_spark.session import load_tables


@query(
    "udf_scalar_sigmoid",
    """
    SELECT event_id, ROUND(1.0 / (1.0 + EXP(-value / 100.0)), 6) AS score
    FROM events WHERE event_id < 1000
    """,
)
def udf_scalar(spark, sf_dir):
    """Arrow-vectorized scalar pandas UDF (the §2.11 scalar extension
    point — e.g. a custom id or score function)."""
    from data_pipeline_001_spark.functions.udfs import py_sigmoid

    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .where(F.col("event_id") < 1000)
        .select("event_id", F.round(py_sigmoid(F.col("value")), 6).alias("score"))
    )


@query(
    "udf_grouped_weighted_mean",
    """
    SELECT event_type,
           ROUND(SUM(value * k) / SUM(k), 6) AS weighted_value
    FROM (SELECT event_type, value,
                 CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
          FROM events)
    WHERE k > 0
    GROUP BY event_type
    """,
)
def udf_grouped(spark, sf_dir):
    """GROUPED_AGG pandas UDAF: weighted mean of value by the JSON
    weight — the custom-aggregate extension point."""
    from data_pipeline_001_spark.functions.udfs import weighted_mean

    t = load_tables(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("double")
    return (
        t["events"]
        .select("event_type", "value", k.alias("k"))
        .where(F.col("k") > 0)
        .groupBy("event_type")
        .agg(F.round(weighted_mean(F.col("value"), F.col("k")), 6).alias("weighted_value"))
    )


@query(
    "udtf_word_counts",
    f"""
    WITH t AS (SELECT doc_id,
                      unnest(string_split({_NORM_SQL}, ' ')) AS word
               FROM documents WHERE doc_id < 50)
    SELECT doc_id, word, CAST(COUNT(*) AS INT) AS cnt
    FROM t GROUP BY doc_id, word
    """,
)
def udtf_word_counts_q(spark, sf_dir):
    """Python UDTF (Spark 4 table function): one input row fans out to
    many output rows from Python. This is the LAST-resort escape hatch
    in the UDF ladder (scalar pandas → grouped agg → grouped map →
    mapInPandas → UDTF): row-at-a-time Python, so it's demonstrated on
    a bounded slice and everything it does here COULD be done with
    explode+groupBy (which the oracle and the explode_word_frequency
    query prove). Real use is logic that genuinely needs per-row
    Python fan-out (parsers, tokenizers with state).

    Round-11 (guide §4.4 class): the doc_id filter must live in a
    SUBQUERY below the lateral join — Spark 4 does not push an outer
    WHERE on the left side's columns past a LATERAL Python UDTF, so
    the ``WHERE d.doc_id < 50`` form ran the UDTF over the whole
    corpus and filtered after (measured at sf1: 13.7 s over 500k
    docs → 0.35 s over the 50 the query is about, identical 1,250
    rows; the scan now carries PushedFilters LessThan(doc_id,50))."""
    import re
    from collections import Counter

    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, cnt int", useArrow=True)
    class WordCounts:
        def eval(self, text: str):
            norm = re.sub(r"\s+", " ", (text or "").lower()).strip()
            for word, cnt in sorted(Counter(norm.split(" ")).items()):
                yield word, cnt

    spark.udtf.register("word_counts_udtf", WordCounts)
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, u.word, u.cnt
        FROM (SELECT doc_id, text FROM documents WHERE doc_id < 50) d,
             LATERAL word_counts_udtf(d.text) u
        """
    )
