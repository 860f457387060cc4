"""VersionedTable: commit protocol, time travel, rollback, merge,
optimistic concurrency, vacuum retention, and crash debris handling."""

import json
import os
import time

import pytest

pytestmark = pytest.mark.slow  # lane 2: see pytest.ini
from pyspark.sql import functions as F

from data_pipeline_001_spark.sources.versioned_table import (
    ConcurrentCommitError,
    VersionedTable,
)


@pytest.fixture()
def vt(spark, tmp_path):
    return VersionedTable(spark, str(tmp_path / "tbl"))


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def test_append_time_travel_and_history(spark, vt):
    v1 = vt.append(_df(spark, [(1, "a"), (2, "b")]))
    v2 = vt.append(_df(spark, [(3, "c")]))
    assert (v1, v2) == (1, 2)
    assert vt.read(1).count() == 2
    assert vt.read(2).count() == 3
    assert vt.read().count() == 3
    assert [m["op"] for m in vt.history()] == ["append", "append"]


def test_overwrite_isolates_old_snapshot(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(9, "z")]))
    assert {r["k"] for r in vt.read(1).collect()} == {1}
    assert {r["k"] for r in vt.read(2).collect()} == {9}


def test_merge_upserts_against_snapshot(spark, vt):
    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.merge(_df(spark, [(2, "B"), (3, "c")]), ["k"])
    assert {(r["k"], r["v"]) for r in vt.read().collect()} == {
        (1, "a"), (2, "B"), (3, "c"),
    }
    # pre-merge snapshot untouched
    assert {(r["k"], r["v"]) for r in vt.read(1).collect()} == {
        (1, "a"), (2, "b"),
    }


def test_rollback_is_forward_commit(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(2, "bad")]))
    v3 = vt.rollback(1)
    assert v3 == 3
    assert {r["k"] for r in vt.read().collect()} == {1}
    # the bad commit stays inspectable
    assert {r["k"] for r in vt.read(2).collect()} == {2}


def test_concurrent_commit_loses_cleanly(spark, vt, monkeypatch):
    vt.append(_df(spark, [(1, "a")]))
    # simulate the race: both writers compute next version = 2, the
    # other one links its manifest first
    monkeypatch.setattr(vt, "_next_version", lambda: 2)
    with open(vt._manifest_path(2), "w") as fh:
        json.dump({"version": 2, "op": "append", "files": [], "parent": 1,
                   "ts": 0}, fh)
    with pytest.raises(ConcurrentCommitError):
        vt._commit(["data/x"], "append")
    # retry re-reads the snapshot and claims the NEXT slot
    monkeypatch.undo()
    assert vt._commit(["data/x"], "append") == 3
    # no temp debris left behind either way
    assert not [n for n in os.listdir(vt.manifest_dir) if n.startswith(".tmp")]


def test_vacuum_respects_retention(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(2, "b")]))
    # retention_seconds=0: caller asserts exclusive access
    removed = vt.vacuum(keep_versions=1, retention_seconds=0)
    assert len(removed) == 1
    assert {r["k"] for r in vt.read().collect()} == {2}
    with pytest.raises(Exception):
        vt.read(1).collect()


def test_vacuum_grace_skips_inflight_dirs(spark, vt):
    """Default retention window keeps freshly-written unreferenced dirs:
    a concurrent writer creates its data dir before linking the
    manifest, so an aggressive vacuum must not rmtree it."""
    vt.append(_df(spark, [(1, "a")]))
    # simulate an in-flight commit: data written, manifest not yet linked
    rel = vt._write_data(_df(spark, [(9, "inflight")]))
    removed = vt.vacuum(keep_versions=1)  # default grace period
    assert removed == []
    assert os.path.isdir(os.path.join(vt.root, rel))
    # after the grace period (mtime aged artificially) it IS collected
    old = time.time() - 7200
    os.utime(os.path.join(vt.root, rel), (old, old))
    removed = vt.vacuum(keep_versions=1)
    assert removed == [rel]


def test_corrupt_manifest_burns_slot_without_wedging(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    # external interference: a manifest file containing invalid JSON
    with open(vt._manifest_path(2), "w") as fh:
        fh.write('{"version": 2, "op"')
    # reads skip it ...
    assert vt.current_version() == 1
    assert vt.read().count() == 1
    # ... and the next commit burns the slot instead of colliding
    assert vt.append(_df(spark, [(2, "b")])) == 3
    assert vt.read().count() == 2


def test_stream_sink_replay_is_exactly_once(spark, vt):
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_sink,
    )

    handle = versioned_stream_sink(vt)
    b0 = _df(spark, [(1, "a"), (2, "b")])
    b1 = _df(spark, [(3, "c")])
    handle(b0, 0)
    handle(b1, 1)
    # crash-replay of batch 1: same id arrives again
    handle(b1, 1)
    assert vt.read().count() == 3
    assert [m["batch_id"] for m in vt.history()] == [0, 1]
    # a new batch after the replay continues the chain
    handle(_df(spark, [(4, "d")]), 2)
    assert vt.read().count() == 4


def test_replay_check_is_monotonic_and_reads_one_manifest(spark, vt):
    """Round-9 (advice): batch ids from one checkpoint are monotonic,
    so the replay check compares against the NEWEST committed batch_id
    only — found newest-first, stopping at the first stream commit
    (O(1) manifest reads per micro-batch instead of O(versions)).
    Interleaved non-stream commits must not confuse it."""
    from data_pipeline_001_spark.sources.versioned_table import (
        batch_already_committed,
        versioned_stream_sink,
    )

    handle = versioned_stream_sink(vt)
    handle(_df(spark, [(1, "a")]), 0)
    vt.append(_df(spark, [(9, "z")]))  # interleaved batch commit, no batch_id
    handle(_df(spark, [(2, "b")]), 1)
    assert batch_already_committed(vt, 0) is True   # older id => replay
    assert batch_already_committed(vt, 1) is True
    assert batch_already_committed(vt, 2) is False  # next id => fresh
    # replay of an old id writes nothing
    handle(_df(spark, [(99, "dup")]), 0)
    assert vt.read().count() == 3


def test_vacuum_retains_stream_high_water_manifest(spark, vt):
    """Round-10 (advice): the replay check walks manifests newest-first
    to the FIRST batch_id-bearing one, so that manifest must survive
    vacuum — an interleaved batch commit followed by
    ``vacuum(keep_versions=1)`` used to delete every stream manifest,
    after which a replayed micro-batch recommitted and a fold sink
    would double-count. The high-water manifest is now always
    retained (its data dirs remain reclaimable; only the commit
    record survives)."""
    from data_pipeline_001_spark.sources.versioned_table import (
        batch_already_committed,
        versioned_stream_sink,
    )

    handle = versioned_stream_sink(vt)
    handle(_df(spark, [(1, "a")]), 0)
    handle(_df(spark, [(2, "b")]), 1)
    vt.append(_df(spark, [(9, "z")]))  # newest manifest has no batch_id
    vt.vacuum(keep_versions=1, retention_seconds=0)
    # the stream high-water record survived: a replayed batch is still
    # recognized and writes nothing
    assert batch_already_committed(vt, 1) is True
    assert batch_already_committed(vt, 0) is True
    n_before = vt.read().count()
    handle(_df(spark, [(99, "dup")]), 1)
    assert vt.read().count() == n_before
    # and a genuinely new batch still commits
    assert batch_already_committed(vt, 2) is False


def test_additive_sink_rejects_data_sized_key_set(spark, vt):
    """Round-9 (advice): the additive sink's per-batch fold is
    O(table); its key-sized-table assumption is now enforced via
    ``max_rows`` — a key set larger than the bound raises loudly
    instead of silently degrading the stream to quadratic work."""
    import pytest as _pytest

    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_additive_sink,
    )

    handle = versioned_stream_additive_sink(vt, ["k"], ["n"], max_rows=5)
    ok = spark.createDataFrame([(i, 1) for i in range(4)], "k long, n long")
    handle(ok, 0)
    assert vt.read().count() == 4
    big = spark.createDataFrame([(i, 1) for i in range(10)], "k long, n long")
    with _pytest.raises(ValueError, match="data-sized"):
        handle(big, 1)
    # the failed fold committed nothing: table still at batch 0's state
    assert vt.read().count() == 4
    assert [m.get("batch_id") for m in vt.history()] == [0]


def test_stream_sink_through_real_stream(spark, vt, tmp_path):
    """End-to-end: a rate-limited memory stream committed through
    foreachBatch lands every row exactly once in the table."""
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_sink,
    )

    src = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    q = (
        src.selectExpr("CAST(value AS BIGINT) AS k", "'r' AS v")
        .writeStream.foreachBatch(versioned_stream_sink(vt))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        import time as _t

        deadline = _t.time() + 30
        while _t.time() < deadline and vt.current_version() < 2:
            _t.sleep(0.5)
    finally:
        q.stop()
    rows = [r["k"] for r in vt.read().collect()]
    assert len(rows) == len(set(rows)) and rows  # no duplicates


def test_stats_pruned_read_skips_dirs(spark, tmp_path):
    from data_pipeline_001_spark.sources.versioned_table import (
        StatsVersionedTable,
    )

    vt = StatsVersionedTable(spark, str(tmp_path / "st"), stats_cols=["k"])
    vt.append(_df(spark, [(1, "a"), (5, "b")]))       # k in [1, 5]
    vt.append(_df(spark, [(100, "c"), (200, "d")]))   # k in [100, 200]
    vt.append(_df(spark, [(1000, "e")]))              # k in [1000, 1000]

    pruned = vt.read_pruned("k", 90, 300)
    assert {r["k"] for r in pruned.collect()} == {100, 200}
    # only the one overlapping dir is in the scan
    dirs = {f.rsplit("/", 2)[-2] for f in pruned.inputFiles()}
    assert len(dirs) == 1
    # full read still sees everything
    assert vt.read().count() == 5
    # disjoint range -> empty without scanning anything
    assert vt.read_pruned("k", -50, -10).count() == 0


def test_snapshot_diff_reports_cdc_rows(spark, vt):
    from data_pipeline_001_spark.sources.versioned_table import snapshot_diff

    vt.append(_df(spark, [(1, "a"), (2, "b")]))
    vt.merge(_df(spark, [(2, "B"), (3, "c")]), ["k"])
    changes = {
        (r["k"], r["v"], r["_change"])
        for r in snapshot_diff(vt, 1, 2).collect()
    }
    assert changes == {
        (2, "b", "delete"),   # update = delete old ...
        (2, "B", "insert"),   # ... + insert new
        (3, "c", "insert"),
    }


def test_stream_merge_sink_upserts_exactly_once(spark, vt):
    from data_pipeline_001_spark.sources.versioned_table import (
        versioned_stream_merge_sink,
    )

    handle = versioned_stream_merge_sink(vt, ["k"])
    handle(_df(spark, [(1, "a"), (2, "b")]), 0)     # bootstrap
    b1 = _df(spark, [(2, "B"), (3, "c")])
    handle(b1, 1)                                    # upsert
    handle(b1, 1)                                    # crash replay
    assert {(r["k"], r["v"]) for r in vt.read().collect()} == {
        (1, "a"), (2, "B"), (3, "c"),
    }
    assert [m["batch_id"] for m in vt.history()] == [0, 1]
    # pre-merge snapshot still time-travelable
    assert {(r["k"], r["v"]) for r in vt.read(1).collect()} == {
        (1, "a"), (2, "b"),
    }


def test_optimize_zorder_preserves_rows_and_allows_rollback(spark, vt):
    from data_pipeline_001_spark.sources.versioned_table import optimize_zorder

    df = spark.createDataFrame(
        [(i, (i * 7) % 50, f"r{i}") for i in range(200)], ["a", "b", "v"]
    )
    vt.append(df)
    v2 = optimize_zorder(vt, "a", "b", bits=6, target_files=4)
    assert v2 == 2
    # same multiset of rows, new layout
    assert vt.read().exceptAll(df).count() == 0
    assert df.exceptAll(vt.read()).count() == 0
    assert vt.history()[-1]["op"].startswith("optimize-zorder")
    # a bad optimize is one rollback away
    vt.rollback(1)
    assert vt.read().count() == 200


def test_schema_evolution_across_commits(spark, vt):
    vt.append(_df(spark, [(1, "a")]))
    wider = spark.createDataFrame([(2, "b", 9.5)], ["k", "v", "score"])
    vt.append(wider)
    merged = vt.read(merge_schema=True)
    assert set(merged.columns) == {"k", "v", "score"}
    rows = {r["k"]: r["score"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_curation_pipeline_commits_each_stage(spark, tmp_path):
    """The user workflow the pieces compose into: each curation stage
    lands as an auditable versioned commit — raw load, funnel filter,
    quota cap — every intermediate state time-travelable and the whole
    run reversible with one rollback."""
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.plans import queries_curation3 as c3
    from data_pipeline_001_spark.sources.versioned_table import VersionedTable

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vt = VersionedTable(spark, str(tmp_path / "corpus"))

    v1 = vt.append(docs)                                   # raw load
    decisions = c3.filter_decision_q(spark, "/root/testdata/sf0.001")
    kept = vt.read(v1).join(
        decisions.where(F.col("keep") == 1).select("doc_id"), "doc_id"
    )
    v2 = vt.overwrite(kept)                                # funnel filter
    import unittest.mock as _m

    with _m.patch.object(c3, "load_tables", lambda s, d: {"documents": vt.read(v2)}):
        quota = c3.source_quota_q(spark, "ignored").select("doc_id")
    v3 = vt.overwrite(vt.read(v2).join(quota, "doc_id"))   # quota cap

    n_raw, n_kept, n_final = (vt.read(v).count() for v in (v1, v2, v3))
    assert n_raw >= n_kept >= n_final > 0
    assert n_kept < n_raw  # the funnel actually dropped documents
    # audit trail: three ops, every stage still readable
    assert [m["op"] for m in vt.history()] == ["append", "overwrite", "overwrite"]
    # the whole run is one rollback away from the raw corpus
    vt.rollback(v1)
    assert vt.read().count() == n_raw


def test_table_cli_history_and_rollback(spark, vt, capsys):
    import json as _json

    from data_pipeline_001_spark.table_cli import main as cli

    vt.append(_df(spark, [(1, "a")]))
    vt.overwrite(_df(spark, [(2, "b")]))

    assert cli([vt.root, "history"]) == 0
    lines = [
        _json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
    ]
    assert [m["version"] for m in lines] == [1, 2]

    assert cli([vt.root, "rollback", "--version", "1"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"rolled_back_to": 1, "new_version": 3}
    assert {r["k"] for r in vt.read().collect()} == {1}


def test_concurrent_writers_all_land_with_retry(spark, vt):
    """8 threads race appends through the optimistic-retry loop; every
    append must land exactly once, versions must be gapless, and the
    final snapshot must contain all rows — the Delta-style commit-loop
    guarantee the manifests exist to provide."""
    import threading

    from data_pipeline_001_spark.sources.versioned_table import (
        ConcurrentCommitError,
    )

    # per-thread pre-built single-row frames (Spark calls inside
    # threads are fine; plan-building is thread-safe)
    frames = {i: _df(spark, [(i, f"t{i}")]) for i in range(8)}
    errors = []

    def writer(i):
        for _ in range(50):  # retry loop
            try:
                vt.append(frames[i])
                return
            except ConcurrentCommitError:
                continue
        errors.append(i)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors
    assert {r["k"] for r in vt.read().collect()} == set(range(8))
    versions = [m["version"] for m in vt.history()]
    assert versions == list(range(1, 9))  # gapless, one commit per writer


def test_versioned_sink_windowed_contract(spark, tmp_path):
    """The Sink surface (load/exists/clean/count) on versioned
    commits: a window reload is one atomic commit, clean is
    metadata-only, and the pre-reload state stays time-travelable."""
    from datetime import datetime

    from data_pipeline_001_spark.sources.versioned_table import (
        VersionedTableSink,
    )

    sink = VersionedTableSink(spark, str(tmp_path / "tgt"))
    w1 = datetime(2024, 1, 1, 0)
    w2 = datetime(2024, 1, 1, 1)

    assert not sink.exists(w1, w2)
    sink.load(_df(spark, [(1, "a"), (2, "b")]), w1, w2)
    sink.load(_df(spark, [(3, "c")]), w2, None)
    assert sink.exists(w1, w2) and sink.count(w1, w2) == 2
    assert sink.count(w2, None) == 1
    assert sink.read().count() == 3

    # idempotent re-ingest: clean + load replaces ONLY that window
    sink.clean(w1, w2)
    assert not sink.exists(w1, w2) and sink.count(w1, w2) == 0
    assert sink.read().count() == 1          # w2 untouched
    sink.load(_df(spark, [(9, "z")]), w1, w2)
    assert sink.count(w1, w2) == 1
    assert {r["k"] for r in sink.read().collect()} == {3, 9}

    # history: every mutation is a commit; v2 (both original windows)
    # still reads in full
    ops = [m["op"] for m in sink.history()]
    assert ops == [
        "window-load:2024-01-01T00:00:00",
        "window-load:2024-01-01T01:00:00",
        "window-clean:2024-01-01T00:00:00",
        "window-load:2024-01-01T00:00:00",
    ]
    assert sink.read(2).count() == 3


def test_pipeline_e2e_with_versioned_target(spark, tmp_path):
    """The windowed pipeline runs end-to-end with the versioned table
    as its TARGET sink — all four loop-path stages green per window,
    counts matched, and the target's manifest history holds one
    window-load commit per window (each reload atomic, each prior
    state time-travelable)."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from data_pipeline_001_spark.plans.control_table import ControlTable
    from data_pipeline_001_spark.plans.pipeline import (
        PipelineConfig,
        WindowPipeline,
    )
    from data_pipeline_001_spark.sources.file_connectors import (
        FileSource,
        PartitionedParquetSink,
    )
    from data_pipeline_001_spark.sources.versioned_table import (
        VersionedTableSink,
    )

    pipe = WindowPipeline(
        spark,
        PipelineConfig(
            pipeline_name="vt_e2e", granularity="6h", max_pipeline_runs=4
        ),
        FileSource(
            spark, "/root/testdata/sf0.001/events.parquet", ts_col="ts"
        ),
        PartitionedParquetSink(spark, str(tmp_path / "stage")),
        VersionedTableSink(spark, str(tmp_path / "target")),
        ControlTable(spark, str(tmp_path / "control")),
    )
    day, day_end = datetime(2024, 1, 2), datetime(2024, 1, 3)
    result = pipe.run(day, day_end)
    assert result.processed == 4 and result.completed == 4

    ct = pipe.control.read().collect()
    assert all(r["count_match_status"] == "matched" for r in ct)

    tgt = pipe.target_sink
    ops = [m["op"] for m in tgt.history()]
    assert len(ops) == 4 and all(o.startswith("window-load:") for o in ops)
    assert tgt.read().count() == pipe.source.count(day, day_end) > 0


def test_live_rollup_table_from_stream(spark, tmp_path):
    """Composition: streaming windowed counts in UPDATE mode upsert
    into the versioned table through the CDC merge sink — a
    continuously-current rollup table where every micro-batch's
    revision is one commit, replay-safe, and the final state equals
    the batch aggregation."""
    from data_pipeline_001_spark.sources.versioned_table import (
        VersionedTable,
        versioned_stream_merge_sink,
    )
    from data_pipeline_001_spark.streaming.stream_pipeline import (
        windowed_counts_stream,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "src")
    # several files so availableNow yields several micro-batches
    events.repartition(4).write.mode("overwrite").parquet(src)

    vt = VersionedTable(spark, str(tmp_path / "rollup"))
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # watermark wider than the whole data span: the repartitioned
    # files are not time-ordered, so any tighter watermark would
    # (correctly) drop cross-file "late" rows and diverge from batch
    counts = windowed_counts_stream(
        stream, granularity="6h", x_time_back="60d"
    )
    q = (
        counts.writeStream.outputMode("update")
        .foreachBatch(versioned_stream_merge_sink(vt, ["window_start"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["window_start"]: r["n_events"] for r in vt.read().collect()
    }
    want = {
        r["window_start"]: r["n_events"]
        for r in events.groupBy(
            F.window("ts", "360 minutes").alias("w")
        )
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
        .collect()
    }
    assert got == want and len(vt.history()) >= 1


def test_fold_sink_is_split_invariant(spark, tmp_path):
    """Round-9 property pin: the fold sink's correctness rests on its
    aggregates being associative AND commutative — ANY micro-batch
    split (including duplicate keys scattered across batches, in any
    order) must yield the identical maintained table. Exercised over
    several adversarial splits of one keyed dataset; the min fold is
    the interesting one (the batch carrying a key's min may arrive
    first, last, or split around other batches)."""
    from data_pipeline_001_spark.sources.versioned_table import (
        VersionedTable,
        versioned_stream_fold_sink,
    )

    rows = [(i % 5, i, 1) for i in range(40)]  # 5 keys, ids 0..39
    want = {
        k: (sum(1 for r in rows if r[0] == k), min(r[1] for r in rows if r[0] == k))
        for k in range(5)
    }
    splits = [
        [rows],                                # one batch
        [rows[:1], rows[1:]],                  # singleton first
        [rows[i::4] for i in range(4)],        # striped (keys everywhere)
        [rows[::-1][:13], rows[::-1][13:]],    # reversed halves
    ]
    for si, batches in enumerate(splits):
        vt = VersionedTable(spark, str(tmp_path / f"fold{si}"))
        fold = versioned_stream_fold_sink(
            vt, ["k"], {"n": "sum", "min_id": "min"}
        )
        for bi, batch in enumerate(batches):
            fold(
                spark.createDataFrame(
                    [(k, 1, i) for (k, i, _one) in batch],
                    "k long, n long, min_id long",
                ),
                bi,
            )
        got = {
            r["k"]: (r["n"], r["min_id"]) for r in vt.read().collect()
        }
        assert got == want, f"split {si} diverged: {got}"
