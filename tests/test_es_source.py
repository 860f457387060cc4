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


def test_missing_connector_scan_raises_actionable_error(spark):
    src = ElasticsearchSource(spark, resource="idx")
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    # the distributed scan path still demands the jar (count/extract
    # fall back to REST instead — tested against the mock below)
    with pytest.raises(RuntimeError, match="--packages"):
        src._read(S, E)


# -- mock-REST end-to-end (round-4 verdict item 5) ---------------------
#
# A stdlib http.server plays Elasticsearch: canned _count and scroll
# responses, every request body recorded — so the assertion is on the
# EXACT bool-query JSON that hits the wire, not on builder output.

import http.server
import json as _json
import threading


class _MockES(http.server.BaseHTTPRequestHandler):
    requests: list = []  # (method, path, body) per call, shared per-server
    #: failure-injection state, reset per fixture: flaky _count serves
    #: N transport errors before succeeding; the expiring scroll kills
    #: the first scroll context (ES keep-alive lapse) so the client
    #: must re-establish the whole scroll
    flaky_count_fails: int = 0
    expiry_searches: int = 0

    def _respond(self, payload):
        data = _json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = _json.loads(self.rfile.read(n)) if n else {}
        self.__class__.requests.append(("POST", self.path, body))
        if self.path == "/flaky-idx/_count":
            if self.__class__.flaky_count_fails > 0:
                self.__class__.flaky_count_fails -= 1
                self.send_error(503, "es_rejected_execution_exception")
                return
            payload = {"count": 777, "_shards": {"total": 3}}
        elif self.path.endswith("/_count"):
            payload = {"count": 1234, "_shards": {"total": 3}}
        elif self.path.startswith("/expiry-idx/_search"):
            self.__class__.expiry_searches += 1
            sid = f"scroll-x{self.__class__.expiry_searches}"
            payload = {
                "_scroll_id": sid,
                "hits": {"hits": [{"_source": {"user_id": 1, "value": 10.5}}]},
            }
        elif self.path.startswith("/empty-idx/_search"):
            payload = {"_scroll_id": "scroll-e", "hits": {"hits": []}}
        elif self.path.startswith("/jar-idx/_search"):
            payload = {
                "_scroll_id": "scroll-j",
                "hits": {
                    "total": {"value": 2},
                    "hits": [
                        {
                            "_index": "jar-idx",
                            "_id": "1",
                            "_source": {
                                "@timestamp": "2024-03-01T04:10:00Z",
                                "user_id": 1,
                                "value": 10.5,
                            },
                        },
                        {
                            "_index": "jar-idx",
                            "_id": "2",
                            "_source": {
                                "@timestamp": "2024-03-01T04:20:00Z",
                                "user_id": 2,
                                "value": 20.5,
                            },
                        },
                    ],
                },
            }
        elif "/_search?scroll=" in self.path:
            payload = {
                "_scroll_id": "scroll-1",
                "hits": {
                    "hits": [
                        {"_source": {"user_id": 1, "value": 10.5}},
                        {"_source": {"user_id": 2, "value": 20.5}},
                    ]
                },
            }
        elif self.path == "/_search/scroll":
            scroll_id = body.get("scroll_id")
            if scroll_id == "scroll-x1":
                # first scroll context expired server-side: ES answers
                # 404 search_context_missing_exception
                self.send_error(404, "search_context_missing_exception")
                return
            if scroll_id == "scroll-x2":
                payload = {
                    "_scroll_id": "scroll-x3",
                    "hits": {"hits": [{"_source": {"user_id": 4, "value": 40.5}}]},
                }
            elif scroll_id == "scroll-1":
                payload = {
                    "_scroll_id": "scroll-2",
                    "hits": {"hits": [{"_source": {"user_id": 3, "value": 30.5}}]},
                }
            else:
                payload = {"_scroll_id": "scroll-3", "hits": {"hits": []}}
        else:  # pragma: no cover
            self.send_error(404)
            return
        self._respond(payload)

    def do_DELETE(self):
        n = int(self.headers.get("Content-Length", 0))
        body = _json.loads(self.rfile.read(n)) if n else {}
        self.__class__.requests.append(("DELETE", self.path, body))
        self._respond({"succeeded": True, "num_freed": 1})

    # -- es-hadoop discovery surface (connector-jar scan path) ---------
    # The org.elasticsearch.spark.sql connector probes the cluster with
    # GET/HEAD before scanning: root version info, node publish
    # addresses, the index mapping, and shard routing. Only exercised
    # by test_connector_jar_scan_path_against_mock (skips while the jar
    # is absent from this container); extend these fixtures if a real
    # jar surfaces additional protocol calls.
    _JAR_MAPPING = {
        "properties": {
            "@timestamp": {"type": "date"},
            "user_id": {"type": "long"},
            "value": {"type": "double"},
        }
    }

    def do_HEAD(self):
        self.__class__.requests.append(("HEAD", self.path, {}))
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_GET(self):
        self.__class__.requests.append(("GET", self.path, {}))
        port = self.server.server_address[1]
        if self.path in ("/", ""):
            self._respond(
                {
                    "name": "mock",
                    "cluster_name": "mock-es",
                    "version": {"number": "7.17.9"},
                    "tagline": "You Know, for Search",
                }
            )
        elif self.path.startswith("/_nodes"):
            self._respond(
                {
                    "nodes": {
                        "n1": {
                            "name": "mock-node",
                            "roles": ["data", "ingest", "master"],
                            "http": {
                                "publish_address": f"127.0.0.1:{port}"
                            },
                        }
                    }
                }
            )
        elif "_search_shards" in self.path:
            self._respond(
                {
                    "nodes": {"n1": {"name": "mock-node"}},
                    "shards": [
                        [
                            {
                                "index": "jar-idx",
                                "node": "n1",
                                "shard": 0,
                                "primary": True,
                                "state": "STARTED",
                            }
                        ]
                    ],
                }
            )
        elif "_mapping" in self.path or self.path.startswith("/jar-idx"):
            self._respond({"jar-idx": {"mappings": self._JAR_MAPPING}})
        else:  # pragma: no cover
            self.send_error(404)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture()
def mock_es():
    _MockES.requests = []
    _MockES.flaky_count_fails = 0
    _MockES.expiry_searches = 0
    server = http.server.HTTPServer(("127.0.0.1", 0), _MockES)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield server.server_address[1], _MockES.requests
    server.shutdown()


def test_rest_count_sends_exact_bool_query_and_roundtrips(spark, mock_es):
    port, recorded = mock_es
    src = ElasticsearchSource(
        spark,
        resource="logs-2024/_doc",
        nodes="127.0.0.1",
        port=port,
        ts_field="@timestamp",
        must_exist=("user_id", "event_type"),
        exclude_null=("value",),
    )
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    assert src.count(S, E) == 1234
    _method, path, body = recorded[0]
    assert path == "/logs-2024/_count"  # index only, type stripped
    # the EXACT reference bool query on the wire: half-open ts range,
    # exists per must_exist, must_not-term-null per exclude_null
    assert body == build_es_query_body(
        "@timestamp", S, E, ("user_id", "event_type"), ("value",)
    )
    assert body["query"]["bool"]["must"][0]["range"]["@timestamp"] == {
        "gte": "2024-03-01T04:00:00Z",
        "lt": "2024-03-01T05:00:00Z",
    }


def test_rest_extract_scrolls_to_exhaustion(spark, mock_es):
    port, recorded = mock_es
    src = ElasticsearchSource(
        spark, resource="logs-2024", nodes="127.0.0.1", port=port
    )
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    df = src.extract(S, E)
    rows = {(r["user_id"], r["value"]) for r in df.collect()}
    assert rows == {(1, 10.5), (2, 20.5), (3, 30.5)}
    calls = [(m, p) for m, p, _ in recorded]
    # initial search carries the query + page size; scroll pages until
    # an empty page terminates the loop; then the scroll context is
    # freed server-side (ES caps open scrolls)
    assert calls[0][1].startswith("/logs-2024/_search?scroll=")
    assert calls[1:] == [
        ("POST", "/_search/scroll"),
        ("POST", "/_search/scroll"),
        ("DELETE", "/_search/scroll"),
    ]
    assert recorded[0][2]["size"] == 10000
    assert recorded[0][2]["query"] == build_es_query_body("@timestamp", S, E)["query"]
    assert recorded[1][2] == {"scroll": "2m", "scroll_id": "scroll-1"}
    assert recorded[-1][2] == {"scroll_id": "scroll-3"}


def test_rest_extract_empty_window_typed_frame(spark, mock_es):
    """Zero-document windows are routine: with a configured schema the
    fallback returns a typed EMPTY frame (the pipeline loads an empty
    batch); without one it raises an actionable error."""
    port, recorded = mock_es
    src = ElasticsearchSource(
        spark, resource="empty-idx", nodes="127.0.0.1", port=port,
        schema="user_id long, value double",
    )
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    df = src.extract(S, E)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["user_id", "value"]
    # the empty scroll context is still cleaned up
    assert ("DELETE", "/_search/scroll") in [(m, p) for m, p, _ in recorded]
    bare = ElasticsearchSource(
        spark, resource="empty-idx", nodes="127.0.0.1", port=port
    )
    with pytest.raises(RuntimeError, match="schema"):
        bare.extract(S, E)


@pytest.fixture()
def retry_sleeps(monkeypatch):
    """Capture R1 retry sleeps instead of actually waiting: swap the
    ``time`` module object inside utils for a shim whose ``sleep``
    records its argument (other attributes pass through)."""
    import time as _time
    import types

    from data_pipeline_001_spark import utils as U

    calls: list[float] = []
    shim = types.SimpleNamespace(
        sleep=calls.append,
        time=_time.time,
        perf_counter=_time.perf_counter,
        monotonic=_time.monotonic,
        strftime=_time.strftime,
    )
    monkeypatch.setattr(U, "time", shim)
    yield calls


def test_rest_count_retries_through_transient_failures(
    spark, mock_es, retry_sleeps
):
    """Failure-path parity with the reference: its ``_count`` is
    wrapped in @retry (3 attempts, 30 s apart,
    log_retry_decorators.py:47-87). A _count that 503s twice then
    succeeds must recover transparently, sleeping the reference
    schedule between attempts."""
    port, recorded = mock_es
    _MockES.flaky_count_fails = 2
    src = ElasticsearchSource(
        spark, resource="flaky-idx", nodes="127.0.0.1", port=port
    )
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    assert src.count(S, E) == 777
    counts = [(m, p) for m, p, _ in recorded if p == "/flaky-idx/_count"]
    assert len(counts) == 3  # 2 failures + 1 success
    assert retry_sleeps == [30.0, 30.0]


def test_rest_count_exhausted_retries_raise(spark, mock_es, retry_sleeps):
    """Permanent failure must surface after exactly 3 attempts, not
    hang or loop."""
    import urllib.error

    port, recorded = mock_es
    _MockES.flaky_count_fails = 99
    src = ElasticsearchSource(
        spark, resource="flaky-idx", nodes="127.0.0.1", port=port
    )
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    with pytest.raises(urllib.error.HTTPError):
        src.count(S, E)
    assert len(recorded) == 3
    assert retry_sleeps == [30.0, 30.0]


def test_rest_extract_reestablishes_expired_scroll(
    spark, mock_es, retry_sleeps
):
    """An expired scroll context (404 search_context_missing) cannot
    be resumed — the R1 retry must re-run the WHOLE scroll from a
    fresh search and still return the complete window."""
    port, recorded = mock_es
    src = ElasticsearchSource(
        spark, resource="expiry-idx", nodes="127.0.0.1", port=port
    )
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    df = src.extract(S, E)
    rows = {(r["user_id"], r["value"]) for r in df.collect()}
    # attempt 2's fresh scroll serves page 1 (user 1) + page 2 (user 4)
    assert rows == {(1, 10.5), (4, 40.5)}
    searches = [p for _, p, _ in recorded if p.startswith("/expiry-idx/_search?")]
    assert len(searches) == 2  # initial + re-established after expiry
    assert retry_sleeps == [30.0]


def test_rest_extract_cap_is_not_retried(spark, mock_es, retry_sleeps):
    """The REST extract volume cap is a logic error, not a transport
    fault — it must propagate on the FIRST attempt (retrying would
    re-scroll 100k docs twice for nothing)."""
    port, recorded = mock_es
    src = ElasticsearchSource(
        spark, resource="logs-2024", nodes="127.0.0.1", port=port
    )
    if src._connector_available():  # pragma: no cover - jar present
        pytest.skip("connector jar on classpath")
    src.REST_EXTRACT_MAX_DOCS = 1
    with pytest.raises(RuntimeError, match="exceeded 1 documents"):
        src.extract(S, E)
    assert retry_sleeps == []


def test_connector_jar_scan_path_against_mock(spark, mock_es):
    """Round-5 verdict item 8: the real ``org.elasticsearch.spark.sql``
    scan path has never executed in this container (the jar is absent),
    so this test closes the gap by itself the moment the environment
    allows — when the connector class is loadable it runs the genuine
    distributed scan against the mock server's fixtures (version /
    nodes / mapping / shard discovery via GET, scrolled search via
    POST) and must return the window's typed rows; until then it skips
    loudly, naming the missing jar."""
    port, recorded = mock_es
    src = ElasticsearchSource(
        spark,
        resource="jar-idx",
        nodes="127.0.0.1",
        port=port,
        es_options={
            # single-node loopback cluster: don't let the connector
            # re-route to discovered data nodes or WAN-probe
            "es.nodes.wan.only": "true",
            "es.nodes.discovery": "false",
            "es.index.read.missing.as.empty": "false",
        },
    )
    if not src._connector_available():
        pytest.skip(
            "org.elasticsearch.spark.sql connector jar absent from the "
            "container classpath — launch Spark with --packages "
            "org.elasticsearch:elasticsearch-spark-30_2.13:<ver> to run "
            "the real distributed scan path (REST fallback is covered "
            "by the tests above)"
        )
    df = src._read(S, E)  # the genuine connector scan, not the fallback
    rows = {(r["user_id"], r["value"]) for r in df.collect()}
    assert rows == {(1, 10.5), (2, 20.5)}
    # the es.query window body must have reached the wire
    searches = [b for m, p, b in recorded if "/_search" in p and m == "POST"]
    assert searches, "connector never issued a search against the mock"
