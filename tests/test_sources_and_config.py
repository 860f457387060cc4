"""Connector format coverage (S2: parquet/JSON/CSV sources) and the
layered-config merge (hanlder_script.py:117-194 semantics)."""

from datetime import datetime

import os

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.pipeline import PipelineConfig
from data_pipeline_001_spark.sources.file_connectors import FileSource

WINDOW = (datetime(2024, 1, 2), datetime(2024, 1, 3))


@pytest.fixture(scope="module")
def json_dir(tables, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_json"))
    tables["events"].write.mode("overwrite").json(d)
    return d


@pytest.fixture(scope="module")
def csv_dir(tables, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_csv"))
    tables["events"].drop("props").write.mode("overwrite").option(
        "header", True
    ).csv(d)
    return d


def test_parquet_json_csv_orc_xml_sources_agree(spark, tables, json_dir, csv_dir, tmp_path_factory):
    from pyspark.sql import types as T

    parquet_src = FileSource(spark, "/root/testdata/sf0.001/events.parquet")
    schema = tables["events"].schema
    json_src = FileSource(spark, json_dir, fmt="json", schema=schema)
    csv_schema = T.StructType([f for f in schema.fields if f.name != "props"])
    csv_src = FileSource(spark, csv_dir, fmt="csv", schema=csv_schema)
    orc_dir = str(tmp_path_factory.mktemp("events_orc"))
    tables["events"].write.mode("overwrite").orc(orc_dir)
    orc_src = FileSource(spark, orc_dir, fmt="orc")

    # XML (Spark 4 built-in): rowTag required; microsecond
    # timestampFormat because the writer's default truncates to millis
    xml_dir = str(tmp_path_factory.mktemp("events_xml"))
    xml_opts = {
        "rowTag": "event",
        "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    }
    tables["events"].drop("props").write.format("xml").options(
        **xml_opts
    ).mode("overwrite").save(xml_dir)
    xml_src = FileSource(
        spark, xml_dir, fmt="xml", schema=csv_schema, options=xml_opts
    )

    n = parquet_src.count(*WINDOW)
    assert n > 0
    assert json_src.count(*WINDOW) == n
    assert csv_src.count(*WINDOW) == n
    assert orc_src.count(*WINDOW) == n
    assert xml_src.count(*WINDOW) == n


def test_must_exist_filter(spark):
    src = FileSource(
        spark, "/root/testdata/sf0.001/events.parquet", must_exist=("user_id",)
    )
    all_src = FileSource(spark, "/root/testdata/sf0.001/events.parquet")
    assert src.count(*WINDOW) <= all_src.count(*WINDOW)


def test_config_merge_later_layers_win():
    cfg = PipelineConfig.merged(
        {"granularity": "1h", "tolerance_pct": 1.0},          # drive defaults
        {"granularity": "30m", "custom_key": "x"},            # index config
        {"max_pipeline_runs": 7, "granularity": None},        # env overrides (None ignored)
    )
    assert cfg.granularity == "30m"       # index overrides default; None doesn't
    assert cfg.max_pipeline_runs == 7
    assert cfg.tolerance_pct == 1.0
    assert cfg.extras["custom_key"] == "x"


def test_sink_file_sizing(spark, tables, tmp_path):
    """File-size discipline (the reference's 250 MB split,
    stage/ingestion_engine.py:174): maxRecordsPerFile bounds output
    file row counts so downstream scans parallelize."""
    import os

    from datetime import datetime

    from data_pipeline_001_spark.sources.file_connectors import (
        PartitionedParquetSink,
    )

    sink = PartitionedParquetSink(
        spark, str(tmp_path / "sized"), max_records_per_file=100
    )
    w = (datetime(2024, 1, 2), datetime(2024, 1, 3))
    df = tables["events"].limit(450).coalesce(1)
    sink.load(df, *w)
    out_dir = sink._window_path(w[0])
    files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    assert len(files) >= 5  # 450 rows / 100-row cap
    assert sink.count(*w) == 450


def test_ivf_recall(tables):
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    e = tables["embeddings"]
    q = e.where(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=5, n_centroids=16, nprobe=6).collect()
    }
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_json_source_quarantines_malformed_records(spark, tables, tmp_path):
    """A malformed line must land in the quarantine dir and be excluded
    from count/extract; valid rows are unaffected."""
    from pyspark.sql import types as T

    import json as jsonlib
    import os

    d = str(tmp_path / "dirty_json")
    os.makedirs(d)
    rows = (
        tables["events"].where(F.col("event_id") < 100).drop("props").collect()
    )
    with open(os.path.join(d, "data.json"), "w") as fh:
        for r in rows:
            rec = r.asDict()
            rec["ts"] = rec["ts"].isoformat()
            fh.write(jsonlib.dumps(rec) + "\n")
        fh.write('{"event_id": 999999, "ts": BROKEN\n{not json at all}\n')

    schema = T.StructType(
        [f for f in tables["events"].schema.fields if f.name != "props"]
    )
    clean_src = FileSource(
        spark, d, fmt="json", schema=schema, quarantine_path=str(tmp_path / "quar")
    )
    n_valid = clean_src.count(*WINDOW)
    expected = (
        tables["events"]
        .where(F.col("event_id") < 100)
        .where((F.col("ts") >= F.lit(WINDOW[0])) & (F.col("ts") < F.lit(WINDOW[1])))
        .count()
    )
    assert n_valid == expected
    quarantined = spark.read.json(str(tmp_path / "quar")).collect()
    assert len(quarantined) == 2
    assert any("BROKEN" in r["corrupt_record"] for r in quarantined)


def test_quarantine_rejects_conflicting_reader_options(spark, tmp_path):
    """Round-9 (advice): user options are applied after the quarantine
    reader options, so mode=DROPMALFORMED (or a conflicting corrupt-
    record column) would silently defeat the PERMISSIVE contract —
    must raise loudly at construction instead."""
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("ts", T.TimestampType())])
    for bad in ({"mode": "DROPMALFORMED"}, {"columnNameOfCorruptRecord": "x"}):
        with pytest.raises(ValueError, match="conflict with quarantine_path"):
            FileSource(
                spark,
                str(tmp_path),
                fmt="json",
                schema=schema,
                quarantine_path=str(tmp_path / "q"),
                options=bad,
            )
    # non-conflicting options still pass through fine
    FileSource(
        spark,
        str(tmp_path),
        fmt="json",
        schema=schema,
        quarantine_path=str(tmp_path / "q"),
        options={"timestampFormat": "yyyy-MM-dd"},
    )


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    from data_pipeline_001_spark.operators.compaction import (
        compact_sink,
        plan_compaction,
    )

    root = str(tmp_path / "sink")
    # two windows: one fragmented (16 files), one already compact
    frag = f"{root}/2024-01-01/00-00"
    ok = f"{root}/2024-01-01/01-00"
    spark.range(10_000).repartition(16).write.parquet(frag)
    spark.range(100).coalesce(1).write.parquet(ok)

    plans = plan_compaction(root, target_bytes=1 << 30, min_files=4)
    assert [p["path"] for p in plans] == [frag]
    assert plans[0]["n_files"] == 16

    before = spark.read.parquet(frag).orderBy("id").collect()
    results = compact_sink(spark, root, target_bytes=1 << 30)
    assert len(results) == 1
    assert results[0]["files_after"] == 1
    after = spark.read.parquet(frag).orderBy("id").collect()
    assert after == before
    # the already-compact window was not touched
    assert plan_compaction(root, target_bytes=1 << 30, min_files=4) == []


def test_compaction_swap_is_atomic_on_failure(spark, tmp_path, monkeypatch):
    """A crash during the temp write must leave the original intact."""
    import data_pipeline_001_spark.operators.compaction as C

    p = str(tmp_path / "d")
    spark.range(1000).repartition(8).write.parquet(p)
    before = set(os.listdir(p))

    class Boom(RuntimeError):
        pass

    def bad_rename(*a, **k):
        raise Boom("crash before swap")

    monkeypatch.setattr(C.os, "rename", bad_rename)
    with pytest.raises(Boom):
        C.compact_dir(spark, p, target_bytes=1 << 30)
    assert set(os.listdir(p)) == before  # original untouched


def test_compaction_recovers_crashed_swap(spark, tmp_path):
    """Crash WINDOWS of the two-rename swap (ADVICE r2): a stranded
    ._compact_old with the data dir missing (crash between renames)
    must be restored; one alongside an existing data dir (crash before
    cleanup) must be discarded; a stale temp dir is always rebuilt.
    In every case a re-run compacts successfully."""
    import shutil

    import data_pipeline_001_spark.operators.compaction as C

    p = str(tmp_path / "d")
    spark.range(1000).repartition(8).write.parquet(p)
    rows = spark.read.parquet(p).orderBy("id").collect()

    # case 1: crash between the renames — data only in ._compact_old
    os.rename(p, p + "._compact_old")
    res = C.compact_dir(spark, p, target_bytes=1 << 30)
    assert res["files_after"] == 1
    assert spark.read.parquet(p).orderBy("id").collect() == rows
    assert not os.path.exists(p + "._compact_old")

    # case 2: crash before cleanup — compacted data at p, old lingers
    spark.range(50).write.parquet(p + "._compact_old")
    spark.range(10).coalesce(1).write.parquet(p + "._compact_tmp")  # stale tmp too
    res = C.compact_dir(spark, p, target_bytes=1 << 30)
    assert spark.read.parquet(p).orderBy("id").collect() == rows
    assert not os.path.exists(p + "._compact_old")
    assert not os.path.exists(p + "._compact_tmp")


def test_source_schema_evolution(spark, tmp_path):
    """Older files lack a later-added column: both the mergeSchema
    route and the explicit-schema route must read the union schema
    with NULLs filled for the missing column."""
    from pyspark.sql import types as T

    root = str(tmp_path / "ev")
    spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 30), 1.0)], "ts timestamp, v double"
    ).write.parquet(f"{root}/gen1")
    spark.createDataFrame(
        [(datetime(2024, 1, 1, 1, 30), 2.0, "new")],
        "ts timestamp, v double, tag string",
    ).write.parquet(f"{root}/gen2")

    merged = FileSource(spark, f"{root}/gen*", merge_schema=True)
    out = merged.extract(datetime(2024, 1, 1), datetime(2024, 1, 2)).orderBy("ts")
    rows = out.collect()
    assert [r["tag"] for r in rows] == [None, "new"]

    explicit = FileSource(
        spark,
        f"{root}/gen*",
        schema=T.StructType(
            [
                T.StructField("ts", T.TimestampType()),
                T.StructField("v", T.DoubleType()),
                T.StructField("tag", T.StringType()),
            ]
        ),
    )
    rows2 = explicit.extract(
        datetime(2024, 1, 1), datetime(2024, 1, 2)
    ).orderBy("ts").collect()
    assert [r["tag"] for r in rows2] == [None, "new"]


def test_python_datasource_generates_on_executors(spark):
    """Custom PySpark 4 Python DataSource: deterministic, partition-
    parallel synthetic events — same options, same content, regardless
    of partition layout; no driver-side row path."""
    from data_pipeline_001_spark.operators.constraints import content_checksum
    from data_pipeline_001_spark.sources import synthetic

    synthetic.register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", 5000)
        .option("partitions", 16)
        .option("seed", 7)
        .load()
    )
    assert df.count() == 5000
    assert df.rdd.getNumPartitions() == 16
    ck = lambda d: d.agg(  # noqa: E731
        content_checksum(["event_id", "user_id", "event_type"]).alias("c")
    ).collect()[0]["c"]
    base = ck(df)
    # different partitioning, same content
    df2 = (
        spark.read.format("synthetic_events")
        .option("rows", 5000)
        .option("partitions", 3)
        .option("seed", 7)
        .load()
    )
    assert ck(df2) == base
    # a different seed is a different corpus
    df3 = (
        spark.read.format("synthetic_events")
        .option("rows", 5000)
        .option("partitions", 16)
        .option("seed", 8)
        .load()
    )
    assert ck(df3) != base
    # schema mirrors the events table (minus props)
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts", "user_id", "event_type", "value",
    ]


def test_parquet_sink_observes_write_metrics(spark, tables, tmp_path):
    """The window write captures rows/min/max ts via Observation —
    inside the write job, no second scan — and they match an
    independent recount of what landed."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from data_pipeline_001_spark.sources.file_connectors import (
        PartitionedParquetSink,
    )

    sink = PartitionedParquetSink(spark, str(tmp_path / "t"))
    ev = tables["events"]
    start, end = datetime(2024, 1, 1), datetime(2024, 1, 2)
    win = ev.where(
        (F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end))
    )
    sink.load(win, start, end)
    m = sink.last_write_metrics
    assert m is not None
    back = spark.read.parquet(sink._window_path(start))
    agg = back.agg(
        F.count(F.lit(1)), F.min("ts"), F.max("ts")
    ).first()
    assert m["rows"] == agg[0] > 0
    assert m["min_ts"] == agg[1] and m["max_ts"] == agg[2]


def test_dynamic_partition_overwrite_replaces_only_touched(
    spark, tables, tmp_path
):
    """partitionOverwriteMode=dynamic: an overwrite write that touches
    one partition value leaves sibling partitions intact — the
    idempotent-window-rewrite contract at the Spark-native
    partitionBy layer (vs the sink's explicit path discipline)."""
    from pyspark.sql import functions as F

    out = str(tmp_path / "part")
    ev = tables["events"].withColumn("day", F.to_date("ts"))
    days = [r.day for r in ev.select("day").distinct().limit(2).collect()]
    assert len(days) == 2
    ev.where(F.col("day").isin(days)).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(out)
    n_day0 = ev.where(F.col("day") == days[0]).count()
    n_day1 = ev.where(F.col("day") == days[1]).count()

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # rewrite ONLY day1, with half its rows
        half = ev.where(
            (F.col("day") == days[1]) & (F.col("event_id") % 2 == 0)
        )
        n_half = half.count()
        half.write.partitionBy("day").mode("overwrite").parquet(out)
        back = spark.read.parquet(out)
        assert back.where(F.col("day") == days[0]).count() == n_day0
        assert back.where(F.col("day") == days[1]).count() == n_half
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
