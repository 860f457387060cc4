"""Elasticsearch Source — the reference's primary source system,
re-expressed over the public elasticsearch-hadoop Spark connector
(``org.elasticsearch.spark.sql``).

The reference talks to ES two ways:
  * ``_count`` REST call with a bool query — ts range + ``exists``
    per must_exist field + ``must_not term {field: None}`` per
    exclude_null field (source/elasticsearch_counter.py:99-159);
  * ``elasticdump`` subprocess streaming the same searchBody to S3
    JSON files (stage/ingestion_engine.py:132-235).

Here both collapse to one Spark DataFrame: the connector translates
pushed filters into ES query DSL server-side, and extract/count are
the same lazy plan with different actions. The DSL builder is kept as
a pure function so the window semantics (half-open bounds, strict
``%Y-%m-%dT%H:%M:%SZ`` formatting) are unit-testable without a
cluster; it is also handed to the connector via ``es.query`` so the
server filters documents even where pushdown can't express the
predicate.

The connector jar is not bundled in this environment — construction
works everywhere (pure config), while ``count``/``extract`` raise a
clear error if the ``org.elasticsearch.spark.sql`` format is absent.
"""

from __future__ import annotations

import json
import urllib.request
from datetime import datetime
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_001_spark.sources.base import Source
from data_pipeline_001_spark.sources.file_connectors import window_predicate

ES_FORMAT = "org.elasticsearch.spark.sql"

# strftime pattern the reference uses for every ES-bound timestamp
# (utils/time_utils.py:304-317, format_timestamp_for_elasticsearch)
ES_TS_FORMAT = "%Y-%m-%dT%H:%M:%SZ"


def format_es_timestamp(ts: datetime) -> str:
    """F8: ES-bound timestamp string, second precision, literal Z."""
    return ts.strftime(ES_TS_FORMAT)


def build_es_query_body(
    ts_field: str,
    start: datetime,
    end: datetime,
    must_exist: tuple[str, ...] = (),
    exclude_null: tuple[str, ...] = (),
) -> dict[str, Any]:
    """The reference's bool query, verbatim semantics
    (elasticsearch_counter.py:106-131):

    - half-open window: ``range {ts: {gte: start, lt: end}}`` — the
      ``lt`` (not ``lte``) upper bound is the P1 invariant every other
      operator assumes;
    - one ``exists`` clause per ``must_exist`` field (P2);
    - one ``must_not term {field: None}`` clause per ``exclude_null``
      field (P3 — the ES-idiom form; relationally both are
      ``IS NOT NULL``).
    """
    must: list[dict[str, Any]] = [
        {
            "range": {
                ts_field: {
                    "gte": format_es_timestamp(start),
                    "lt": format_es_timestamp(end),
                }
            }
        }
    ]
    must.extend({"exists": {"field": f}} for f in must_exist)
    must_not: list[dict[str, Any]] = [
        {"term": {f: None}} for f in exclude_null
    ]
    bool_q: dict[str, Any] = {"must": must}
    if must_not:
        bool_q["must_not"] = must_not
    return {"query": {"bool": bool_q}}


class ElasticsearchSource(Source):
    """Windowed ES index source behind the standard Source protocol.

    Replaces both reference access paths (REST ``_count`` and
    ``elasticdump``) with one declarative scan: predicates reach the
    server via connector pushdown *and* the explicit ``es.query``
    body, so a 100 TB index never ships unfiltered documents.

    Parameters mirror the reference's index config
    (projects/index_01/index_config.json): ``resource`` is
    ``index/type`` or just the index name, ``nodes`` the ES hosts,
    ``ts_field`` defaults to ``@timestamp``
    (elasticsearch_counter.py:49).
    """

    def __init__(
        self,
        spark: SparkSession,
        resource: str,
        nodes: str = "localhost",
        port: int = 9200,
        ts_field: str = "@timestamp",
        must_exist: tuple[str, ...] = (),
        exclude_null: tuple[str, ...] = (),
        es_options: dict[str, str] | None = None,
        schema: str | None = None,
    ):
        self.spark = spark
        self.resource = resource
        self.nodes = nodes
        self.port = port
        self.ts_field = ts_field
        self.must_exist = tuple(must_exist)
        self.exclude_null = tuple(exclude_null)
        self.es_options = dict(es_options or {})
        #: optional DDL schema string ("a LONG, b STRING"); the REST
        #: extract fallback uses it to return a typed EMPTY frame for
        #: zero-document windows (routine in windowed ingestion — the
        #: pipeline must treat them as empty loads, not failures)
        self.schema = schema

    # -- plan construction -------------------------------------------------

    def _options(self, start: datetime, end: datetime) -> dict[str, str]:
        opts = {
            "es.nodes": self.nodes,
            "es.port": str(self.port),
            "es.resource": self.resource,
            # server-side filtering even beyond what pushdown covers
            "es.query": json.dumps(
                build_es_query_body(
                    self.ts_field, start, end, self.must_exist, self.exclude_null
                )
            ),
            # scroll paging — the connector's analogue of the
            # reference's elasticdump_limit=10000 page size
            "es.scroll.size": "10000",
            "es.read.field.as.array.include": "",
        }
        opts.update(self.es_options)
        return opts

    def _connector_available(self) -> bool:
        try:
            jvm = self.spark.sparkContext._jvm
            jvm.java.lang.Class.forName("org.elasticsearch.spark.sql.DefaultSource")
            return True
        except Exception:
            return False

    def _read(self, start: datetime, end: datetime) -> DataFrame:
        if not self._connector_available():
            raise RuntimeError(
                "Elasticsearch connector not on the classpath; launch with "
                '--packages org.elasticsearch:elasticsearch-spark-30_2.13:<ver> '
                "or use FileSource for file-backed data"
            )
        df = (
            self.spark.read.format(ES_FORMAT)
            .options(**self._options(start, end))
            .load()
        )
        # re-apply the window predicate Spark-side: es.query already
        # filtered server-side, but keeping the predicate in the plan
        # documents the invariant and lets Catalyst prune partitions
        # if the frame is later unioned/cached
        return df.where(window_predicate(self.ts_field, start, end))

    # -- REST fallback (no connector jar) ----------------------------------

    #: scroll keep-alive + page size for the REST fallback — mirrors
    #: the reference's elasticdump_limit=10000 page size
    REST_SCROLL_KEEPALIVE = "2m"
    #: hard cap for the driver-side REST extract; beyond this the
    #: connector jar is the only sane path (see extract docstring)
    REST_EXTRACT_MAX_DOCS = 100_000
    #: REST failure-path parity with the reference: ``_count`` and
    #: the scroll extract are wrapped in the R1 retry decorator with
    #: the reference's schedule — 3 attempts, 30 s apart
    #: (log_retry_decorators.py:47-87). Only transport/HTTP errors
    #: (OSError covers urllib's URLError/HTTPError) retry; logic
    #: errors like the extract cap propagate immediately. A retried
    #: scroll re-establishes the whole scroll from scratch — the
    #: expired server-side context cannot be resumed.
    REST_RETRY_ATTEMPTS = 3
    REST_RETRY_DELAY_S = 30.0

    def _retrying(self, fn):
        from data_pipeline_001_spark.utils import retry

        return retry(
            attempts=self.REST_RETRY_ATTEMPTS,
            delay_s=self.REST_RETRY_DELAY_S,
            exceptions=(OSError,),
        )(fn)

    def _rest_url(self, path: str) -> str:
        node = self.nodes.split(",")[0].strip()
        if "://" not in node:
            node = f"http://{node}:{self.port}"
        return f"{node}/{path}"

    def _rest_post(self, path: str, body: dict[str, Any]) -> dict[str, Any]:
        return self._rest_call("POST", path, body)

    def _rest_delete(self, path: str, body: dict[str, Any]) -> dict[str, Any]:
        return self._rest_call("DELETE", path, body)

    def _rest_call(
        self, method: str, path: str, body: dict[str, Any]
    ) -> dict[str, Any]:
        req = urllib.request.Request(
            self._rest_url(path),
            data=json.dumps(body).encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method=method,
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            return json.load(resp)

    def _index(self) -> str:
        # es.resource may be "index/type" (legacy) or just "index"
        return self.resource.split("/")[0]

    def _rest_count(self, start: datetime, end: datetime) -> int:
        """The reference's actual ``_count`` path
        (elasticsearch_counter.py:99-159): POST the bool query to
        ``/{index}/_count``; only the integer crosses the wire."""
        body = build_es_query_body(
            self.ts_field, start, end, self.must_exist, self.exclude_null
        )
        return int(self._rest_post(f"{self._index()}/_count", body)["count"])

    def _rest_scroll_docs(
        self, start: datetime, end: datetime
    ) -> list[dict[str, Any]]:
        """Scroll-paged document fetch via REST — the reference's
        elasticdump analogue (stage/ingestion_engine.py:132-235)."""
        body = build_es_query_body(
            self.ts_field, start, end, self.must_exist, self.exclude_null
        )
        body["size"] = int(self.es_options.get("es.scroll.size", "10000"))
        page = self._rest_post(
            f"{self._index()}/_search?scroll={self.REST_SCROLL_KEEPALIVE}",
            body,
        )
        docs: list[dict[str, Any]] = []
        try:
            while True:
                hits = page.get("hits", {}).get("hits", [])
                if not hits:
                    return docs
                docs.extend(h["_source"] for h in hits)
                if len(docs) > self.REST_EXTRACT_MAX_DOCS:
                    raise RuntimeError(
                        f"REST extract exceeded {self.REST_EXTRACT_MAX_DOCS} "
                        "documents — install the ES connector jar for "
                        "shard-parallel extraction at this volume"
                    )
                page = self._rest_post(
                    "_search/scroll",
                    {
                        "scroll": self.REST_SCROLL_KEEPALIVE,
                        "scroll_id": page["_scroll_id"],
                    },
                )
        finally:
            # free the server-side scroll context (ES caps open
            # scrolls at 500 by default; leaking one per window would
            # wedge a long-running windowed extractor). Best-effort:
            # the context also dies at keep-alive expiry.
            sid = page.get("_scroll_id") if isinstance(page, dict) else None
            if sid:
                try:
                    self._rest_delete("_search/scroll", {"scroll_id": sid})
                except Exception:  # noqa: BLE001 — cleanup must not mask results
                    pass

    # -- Source protocol ---------------------------------------------------

    def count(self, start: datetime, end: datetime) -> int:
        """S1: server-side filtered count. With the connector jar the
        count is the lazy scan's count action (per-shard, parallel);
        without it, the reference's ``_count`` REST call — either way
        only match counts cross the wire."""
        if self._connector_available():
            return self._read(start, end).count()
        return self._retrying(self._rest_count)(start, end)

    def extract(self, start: datetime, end: datetime) -> DataFrame:
        """S2: the window's documents. Connector path: lazy scan,
        scroll-paged, one Spark partition per ES shard — a 1000-shard
        index reads with 1000-way parallelism; this is the 100 TB
        path. REST fallback: driver-side scroll capped at
        ``REST_EXTRACT_MAX_DOCS`` (bounded control-plane fetch, NOT a
        data-plane scan — it exists so small windows work and tests
        run without the jar, and it fails loudly past the cap)."""
        if self._connector_available():
            return self._read(start, end)
        docs = self._retrying(self._rest_scroll_docs)(start, end)
        if not docs:
            # empty windows are ROUTINE in windowed ingestion — the
            # pipeline loads an empty batch, it does not fail. A typed
            # empty frame needs a schema, which inference can't supply.
            if self.schema is not None:
                return self.spark.createDataFrame([], self.schema)
            raise RuntimeError(
                "REST extract returned no documents and no schema was "
                "configured to type an empty frame — pass schema=... to "
                "ElasticsearchSource (or install the connector jar, "
                "which reads the index mapping)"
            )
        import pandas as pd

        return self.spark.createDataFrame(pd.DataFrame(docs))
