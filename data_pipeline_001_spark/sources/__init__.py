"""Connector protocol: pluggable sources and sinks (SURVEY.md §7 step 6)."""

from data_pipeline_001_spark.sources.base import Sink, Source  # noqa: F401
from data_pipeline_001_spark.sources.elasticsearch import (  # noqa: F401
    ElasticsearchSource,
    build_es_query_body,
)
from data_pipeline_001_spark.sources.file_connectors import (  # noqa: F401
    FileSource,
    MockAsyncSink,
    PartitionedParquetSink,
)
