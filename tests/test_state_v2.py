"""Spark 4 state-v2 (``transformWithStateInPandas``) e2e: RocksDB
named state variables survive across micro-batches AND across a
checkpointed restart, and the final running totals equal the batch
twin computed directly over all input."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.streaming.state_v2 import (
    state_v2_available,
    stateful_session_conf,
    user_profile_stats,
)

needs_protobuf = pytest.mark.skipif(
    not state_v2_available(),
    reason="transformWithState needs google.protobuf's REFLECTION "
    "RUNTIME, absent here (see test_state_v2_absence_is_exactly_the_"
    "documented_runtime_gap for the verified chain); the processor "
    "logic is covered by the local-harness test below",
)


def test_state_v2_absence_is_exactly_the_documented_runtime_gap():
    """Closes the recurring 'could a vendored varint encoder unblock
    state_v2?' question with a verified import chain. The gap is NOT a
    missing encoder: transformWithStateInPandas →
    stateful_processor_api_client.py (imports
    pyspark.sql.streaming.proto.StateMessage_pb2 at every call site) →
    StateMessage_pb2.py line ~23 `from google.protobuf import
    descriptor` → ModuleNotFoundError('google'). The generated module
    then requires descriptor_pool.AddSerializedFile (parsing a
    serialized FileDescriptorProto), internal.builder message-class
    construction, symbol_database, and
    runtime_version.ValidateProtobufRuntimeVersion(PUBLIC, 6.33.0) —
    i.e. protobuf's full reflection runtime at a pinned minimum
    version. A 'minimal varint encoder' cannot satisfy those imports,
    and monkeypatching the ~40 message classes the client uses against
    Spark's Scala state server would be a hand-rolled protobuf
    reimplementation with silent wire-corruption failure modes — not a
    spike. SELF-CLOSING: the moment a protobuf runtime appears in the
    container, this test asserts the probe flips true and the real e2e
    below runs."""
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401
    except ModuleNotFoundError as exc:
        assert exc.name in {"google", "google.protobuf"}, exc
        assert not state_v2_available()
        return
    # runtime present: the probe must agree and the e2e below runs
    assert state_v2_available()


@pytest.fixture()
def rocksdb_state(spark):
    confs = stateful_session_conf()
    prev = {
        k: spark.conf.get(k, None) for k in confs
    }
    for k, v in confs.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


@needs_protobuf
def test_state_v2_running_profile_across_restart(
    spark, tables, tmp_path, rocksdb_state
):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    events = tables["events"].where(F.col("user_id").isNotNull())
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)
    first.write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            user_profile_stats(stream)
            .writeStream.format("memory")
            .queryName("profile_v2")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        q.stop()

    run_once()
    mid = {
        r.user_id: r
        for r in spark.table("profile_v2").collect()
    }
    exp_mid = {
        r.user_id: r
        for r in first.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert {u: r.n_events for u, r in mid.items()} == {
        u: r.n for u, r in exp_mid.items()
    }

    # restart from the checkpoint with new files: state must carry over
    second.write.mode("append").parquet(src)
    run_once()
    # memory sink in update mode appends each batch's updates; the
    # LAST row per user is the final running total
    out = (
        spark.table("profile_v2")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_types").alias("n_types"),
            F.max("sum_value").alias("sum_value"),
        )
    )
    expected = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.count_distinct("event_type").alias("nt"),
        F.sum(F.coalesce("value", F.lit(0.0))).alias("s"),
    )
    got = {r.user_id: r for r in out.collect()}
    want = {r.user_id: r for r in expected.collect()}
    assert set(got) == set(want)
    for u in want:
        assert got[u].n_events == want[u].n, u
        assert got[u].n_types == want[u].nt, u
        assert got[u].sum_value == pytest.approx(want[u].s), u


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeMapState:
    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return k in self._m

    def getValue(self, k):
        return self._m.get(k)

    def updateValue(self, k, v):
        self._m[k] = v

    def keys(self):
        return iter(self._m)


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeMapState())


def test_processor_logic_local_harness():
    """The processor's accumulation logic, driven directly (no Spark):
    two micro-batches for one user accumulate counts, sums, and
    per-type map entries exactly — this is what runs in-container
    while the wire protocol (protobuf) is unavailable."""
    import pandas as pd

    from data_pipeline_001_spark.streaming.state_v2 import (
        UserProfileProcessor,
    )

    p = UserProfileProcessor()
    p.init(_FakeHandle())
    b1 = pd.DataFrame(
        {"event_type": ["click", "view", "click"], "value": [1.0, 2.0, None]}
    )
    (out1,) = p.handleInputRows((7,), iter([b1]), None)
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 3, "sum_value": 3.0, "n_types": 2,
    }
    b2 = pd.DataFrame({"event_type": ["error"], "value": [4.0]})
    (out2,) = p.handleInputRows((7,), iter([b2]), None)
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 4, "sum_value": 7.0, "n_types": 3,
    }
