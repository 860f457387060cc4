"""Quickstart: the engine's user-facing surface in one runnable file.

    python examples/quickstart.py [sf_dir]

Walks the same path a reference-pipeline user would take after
switching: build a session, run a windowed extract→load→audit
pipeline slice on the events table, then a few analytics / curation
queries from the declared registry.
"""

from __future__ import annotations

import os
import sys
import tempfile
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from data_pipeline_001_spark.session import get_spark, load_tables

    spark = get_spark()
    tables = load_tables(spark, sf_dir)
    print(f"tables: {sorted(tables)}")

    # --- 1. windowed pipeline slice (the reference's core loop) -----
    from data_pipeline_001_spark.plans.control_table import ControlTable
    from data_pipeline_001_spark.plans.pipeline import (
        PipelineConfig,
        WindowPipeline,
    )
    from data_pipeline_001_spark.sources.file_connectors import (
        FileSource,
        PartitionedParquetSink,
    )

    with tempfile.TemporaryDirectory() as tmp:
        pipe = WindowPipeline(
            spark,
            PipelineConfig(pipeline_name="quickstart", granularity="6h"),
            FileSource(spark, f"{sf_dir}/events.parquet", ts_col="ts"),
            PartitionedParquetSink(spark, f"{tmp}/stage"),
            PartitionedParquetSink(spark, f"{tmp}/target"),
            ControlTable(spark, f"{tmp}/control"),
        )
        result = pipe.run(datetime(2024, 1, 2), datetime(2024, 1, 3))
        print(f"pipeline: {result}")

    # --- 2. analytics & curation queries from the registry ----------
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "q01_pricing_summary",
        "dedup_exact_fingerprint",
        "curation_session_assembly",
        "agg_retention_cohorts",
    ):
        df = qs[name](spark, sf_dir)
        print(f"\n{name}:")
        df.show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
