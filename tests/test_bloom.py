"""Broadcast Bloom-filter membership + incremental dedup contracts.

The load-bearing guarantees, each pinned by a test:
* no false NEGATIVES — every corpus member probes True (else the
  admission would silently re-admit a duplicate);
* false positives exist but are rare at the sized m/n and are fully
  removed by the exact verification step;
* ``dedup_incremental_bloom`` equals the plain anti-join result
  row-for-row (the bloom is an optimization, never a semantics
  change), including NULL-fingerprint admission.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.bloom import (
    bloom_bits,
    bloom_probe,
    dedup_incremental_bloom,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(0, 2000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("fp")
    )


def test_no_false_negatives(spark, corpus):
    bits = bloom_bits(corpus, "fp", m_bits=1 << 16)
    probed = bloom_probe(corpus, "fp", bits, m_bits=1 << 16)
    assert probed.where(~F.col("_maybe_in_corpus")).count() == 0


def test_false_positive_rate_bounded(spark, corpus):
    bits = bloom_bits(corpus, "fp", m_bits=1 << 16)
    outside = spark.range(10_000, 12_000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("fp")
    )
    probed = bloom_probe(outside, "fp", bits, m_bits=1 << 16)
    fpp = probed.where(F.col("_maybe_in_corpus")).count() / 2000
    # m/n = 32.8 bits/key, k=7 → theoretical fpp ~2e-5; allow 100×
    assert fpp < 0.002


def test_incremental_equals_plain_anti_join(spark):
    corpus = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id") % 600).alias("fp"),
    )
    # 0..599 duplicate corpus fingerprints; 600..699 are new
    batch = spark.range(0, 700, 7).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("fp"),
    )
    got = sorted(
        r.doc_id
        for r in dedup_incremental_bloom(
            corpus, batch, "fp", m_bits=1 << 14
        ).collect()
    )
    want = sorted(
        r.doc_id
        for r in batch.join(corpus, "fp", "left_anti").collect()
    )
    assert got == want
    # planted novelty: exactly the ids ≥ 600 admitted
    assert got == [10_000 + i for i in range(0, 700, 7) if i >= 600]


def test_null_fingerprints_admitted(spark):
    corpus = spark.createDataFrame([("a",), (None,)], "fp string")
    batch = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3)], "fp string, id int"
    )
    got = sorted(
        r.id
        for r in dedup_incremental_bloom(
            corpus, batch, "fp", m_bits=1 << 10
        ).collect()
    )
    assert got == [2, 3]  # NULL never equals; 'a' is the only dup


def test_plan_never_shuffle_joins_corpus(spark):
    """The admission plan's joins are broadcast (semi to extract hits,
    anti to drop them) — a SortMergeJoin would mean the corpus got
    shuffled, which is the thing this operator exists to avoid."""
    corpus = spark.range(0, 5000).select(
        F.concat(F.lit("t-"), F.col("id")).alias("fp")
    )
    batch = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t-"), F.col("id") * 100).alias("fp"),
    )
    out = dedup_incremental_bloom(corpus, batch, "fp", m_bits=1 << 16)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2


def test_m_bits_validation_rejects_unsafe_sizes(spark, tables):
    """Non-power-of-two or non-multiple-of-8 m_bits would wrap-bias
    the double hash and index past the packed array inside executors;
    both build and probe must refuse them at plan-construction time."""
    import numpy as np
    import pytest

    from data_pipeline_001_spark.operators.bloom import (
        bloom_bits,
        bloom_probe,
    )

    docs = tables["documents"].withColumn("_fp", F.md5(F.col("text")))
    for bad in (0, -8, 12, 1000, (1 << 20) + 8):
        with pytest.raises(ValueError):
            bloom_bits(docs, "_fp", m_bits=bad)
        with pytest.raises(ValueError):
            bloom_probe(docs, "_fp", np.zeros(16, dtype=np.uint8), m_bits=bad)


def test_probe_broadcast_reused_per_bit_array(spark, tables):
    """Two probes against the same filter must share ONE Spark
    broadcast (content-keyed cache) — repeated admission batches in a
    session must not accumulate executor copies."""
    from data_pipeline_001_spark.operators import bloom as B

    docs = tables["documents"].limit(50).withColumn(
        "_fp", F.md5(F.col("text"))
    )
    bits = B.bloom_bits(docs, "_fp", m_bits=1 << 16)
    before = dict(B._BC_CACHE)
    n1 = B.bloom_probe(docs, "_fp", bits, m_bits=1 << 16).count()
    n2 = B.bloom_probe(docs, "_fp", bits, m_bits=1 << 16).count()
    assert n1 == n2 == 50
    new_keys = set(B._BC_CACHE) - set(before)
    assert len(new_keys) == 1  # one broadcast for both probes
