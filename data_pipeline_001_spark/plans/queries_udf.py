"""UDF-surface queries (SURVEY.md §2.11): scalar pandas UDF and
GROUPED_AGG pandas UDAF, each with an exact DuckDB oracle (the Python
functions compute closed-form expressions the oracle can mirror).
Registers into the shared REGISTRY in ``plans.queries``.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
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
