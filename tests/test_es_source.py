"""ElasticsearchSource: the query-DSL builder must reproduce the
reference's bool-query semantics exactly (elasticsearch_counter.py:
99-159) — half-open bounds with second-precision Z-suffixed
timestamps, exists per must_exist, must_not-term-null per
exclude_null — and the Source must degrade with a clear error when
the connector jar is absent (as in this container)."""

from datetime import datetime

import pytest

from data_pipeline_001_spark.sources.elasticsearch import (
    ElasticsearchSource,
    build_es_query_body,
    format_es_timestamp,
)

S = datetime(2024, 3, 1, 4, 0, 0)
E = datetime(2024, 3, 1, 5, 0, 0)


def test_timestamp_format_matches_reference():
    # strftime %Y-%m-%dT%H:%M:%SZ — literal Z, no sub-second part
    assert format_es_timestamp(datetime(2024, 3, 1, 4, 5, 6, 789000)) == (
        "2024-03-01T04:05:06Z"
    )


def test_minimal_body_is_half_open_range():
    body = build_es_query_body("@timestamp", S, E)
    assert body == {
        "query": {
            "bool": {
                "must": [
                    {
                        "range": {
                            "@timestamp": {
                                "gte": "2024-03-01T04:00:00Z",
                                "lt": "2024-03-01T05:00:00Z",
                            }
                        }
                    }
                ]
            }
        }
    }
    # the upper bound MUST be lt, never lte (P1 invariant)
    assert "lte" not in str(body)


def test_must_exist_and_exclude_null_clauses():
    body = build_es_query_body(
        "ts", S, E, must_exist=("user_id", "event_type"), exclude_null=("value",)
    )
    b = body["query"]["bool"]
    assert {"exists": {"field": "user_id"}} in b["must"]
    assert {"exists": {"field": "event_type"}} in b["must"]
    assert b["must_not"] == [{"term": {"value": None}}]


def test_no_must_not_key_when_unused():
    assert "must_not" not in build_es_query_body("ts", S, E)["query"]["bool"]


def test_source_options_carry_query_and_paging(spark):
    src = ElasticsearchSource(
        spark,
        resource="logs-2024/_doc",
        nodes="es1,es2",
        port=9243,
        ts_field="@timestamp",
        must_exist=("user_id",),
        es_options={"es.net.ssl": "true"},
    )
    opts = src._options(S, E)
    assert opts["es.resource"] == "logs-2024/_doc"
    assert opts["es.nodes"] == "es1,es2" and opts["es.port"] == "9243"
    # page size mirrors the reference's elasticdump_limit default
    assert opts["es.scroll.size"] == "10000"
    assert opts["es.net.ssl"] == "true"
    import json

    q = json.loads(opts["es.query"])
    assert q["query"]["bool"]["must"][0]["range"]["@timestamp"]["lt"] == (
        "2024-03-01T05:00:00Z"
    )


def test_missing_connector_raises_actionable_error(spark):
    src = ElasticsearchSource(spark, resource="idx")
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    with pytest.raises(RuntimeError, match="--packages"):
        src.count(S, E)
