"""Decoded multimodal features (SURVEY.md §2.13 — multimodal columns).

Round-4 upgrade of the multimodal surface from "Arrow plumbing +
byte-level features" to a REAL decode path: dependency-free BMP and
WAV parsers (`operators/multimodal.py`) run inside ``mapInPandas``
over binary payloads built executor-side.

The oracle trick: fixture pixel/sample values are closed-form
functions of ``doc_id`` (see ``make_bmp``/``make_wav``), so DuckDB
predicts the decoded statistics ANALYTICALLY — the hash gate then
verifies the decoder actually read the bytes it was handed, without
any codec on the oracle side. All derived doubles are exact
(halves/integer ratios), so no cross-engine float drift.

NOTE: this module must stay LAST in ``__spark_entry__._registry``'s
import order — new registry entries register behind the existing
coverage queue so the driver's prefix sample converges.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_001_spark.plans.queries import query
from data_pipeline_001_spark.session import load_tables

_DECODED_ORACLE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END
         AS media_type,
       CASE WHEN doc_id % 2 = 0 THEN 4 + doc_id % 5 END AS width,
       CASE WHEN doc_id % 2 = 0 THEN 3 + doc_id % 3 END AS height,
       CASE WHEN doc_id % 2 = 0 THEN
         (doc_id % 100) + (3 + doc_id % 5) / 2.0 + (2 + doc_id % 3) / 2.0
       END AS mean_r,
       CASE WHEN doc_id % 2 = 0 THEN
         ((2 * doc_id) % 100) + (3 + doc_id % 5) / 2.0
       END AS mean_g,
       CASE WHEN doc_id % 2 = 0 THEN
         ((3 * doc_id) % 100) + (2 + doc_id % 3) / 2.0
       END AS mean_b,
       CASE WHEN doc_id % 2 = 1 THEN 8000 + (doc_id % 3) * 4000 END
         AS sample_rate,
       CASE WHEN doc_id % 2 = 1 THEN 500 + doc_id % 250 END AS n_samples,
       CASE WHEN doc_id % 2 = 1 THEN
         (500 + doc_id % 250) * 1000.0 / (8000 + (doc_id % 3) * 4000)
       END AS duration_ms
FROM documents
"""


@query("multimodal_decoded_features", _DECODED_ORACLE)
def multimodal_decoded_features(spark, sf_dir):
    """Distributed binary decode end-to-end: build BMP/WAV payloads in
    Arrow batches (even doc_id → image, odd → audio), decode them with
    the pure-struct parsers, emit modality-typed features. ``rms`` is
    decoded too but has no closed form — it is pytest-verified against
    a locally computed value instead of the SQL oracle."""
    from data_pipeline_001_spark.operators.multimodal import (
        attach_media_fixtures,
        decode_features,
    )

    t = load_tables(spark, sf_dir)
    media = attach_media_fixtures(t["documents"])
    return decode_features(media).select(
        "media_id", "media_type", "width", "height",
        "mean_r", "mean_g", "mean_b",
        "sample_rate", "n_samples", "duration_ms",
    )


_SAMPLED_ORACLE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END
         AS media_type,
       CASE WHEN doc_id % 2 = 0 THEN 2 END AS thumb_w,
       CASE WHEN doc_id % 2 = 0 THEN 2 END AS thumb_h,
       CASE WHEN doc_id % 2 = 0 THEN
         (doc_id % 100) + ((4 + doc_id % 5) // 2) / 2.0
                        + ((3 + doc_id % 3) // 2) / 2.0
       END AS thumb_mean_r,
       CASE WHEN doc_id % 2 = 0 THEN
         ((2 * doc_id) % 100) + ((4 + doc_id % 5) // 2) / 2.0
       END AS thumb_mean_g,
       CASE WHEN doc_id % 2 = 0 THEN
         ((3 * doc_id) % 100) + ((3 + doc_id % 3) // 2) / 2.0
       END AS thumb_mean_b,
       CASE WHEN doc_id % 2 = 1 THEN (500 + doc_id % 250 + 99) // 100 END
         AS n_frames,
       CASE WHEN doc_id % 2 = 1 THEN 100 END AS frame_samples
FROM documents
"""


@query("multimodal_sampled_features", _SAMPLED_ORACLE)
def multimodal_sampled_features(spark, sf_dir):
    """The brief's remaining multimodal verbs — RESIZE (nearest-
    neighbor 2×2 BMP thumbnail) and FRAME-SAMPLE (fixed-length WAV
    frame energies) — over the same deterministic payloads. The
    thumbnail samples pixels at (tx·w//2, ty·h//2), so its channel
    means have exact closed forms the oracle predicts; frame count is
    ceil(n_samples/100). Frame RMS energies have no closed form and
    are pytest-verified instead."""
    from data_pipeline_001_spark.operators.multimodal import (
        attach_media_fixtures,
        sampled_features,
    )

    t = load_tables(spark, sf_dir)
    media = attach_media_fixtures(t["documents"])
    return sampled_features(media).select(
        "media_id", "media_type", "thumb_w", "thumb_h",
        "thumb_mean_r", "thumb_mean_g", "thumb_mean_b",
        "n_frames", "frame_samples",
    )


_PNG_ORACLE = """
SELECT doc_id AS media_id,
       'image/png' AS media_type,
       4 + doc_id % 5 AS width,
       3 + doc_id % 3 AS height,
       (doc_id % 100) + (3 + doc_id % 5) / 2.0 + (2 + doc_id % 3) / 2.0
         AS mean_r,
       ((2 * doc_id) % 100) + (3 + doc_id % 5) / 2.0 AS mean_g,
       ((3 * doc_id) % 100) + (2 + doc_id % 3) / 2.0 AS mean_b
FROM documents
"""


@query("multimodal_png_features", _PNG_ORACLE)
def multimodal_png_features(spark, sf_dir):
    """Real PNG decode end-to-end (round-5 verdict item 5): build an
    8-bit truecolor PNG per document in Arrow batches — same
    closed-form pixel field as the BMP fixtures, but zlib-compressed
    scanlines where row y carries filter predictor (doc_id + y) % 5,
    so the corpus exercises every PNG filter (None/Sub/Up/Average/
    Paeth) — then decode with the pure zlib+struct parser inside
    ``mapInPandas`` (no shuffle; decode parallelism = input
    partitions). The analytic oracle predicts width/height and the
    exact per-channel means, so a green hash proves the inflate +
    all five filter reversals read every pixel correctly."""
    import pandas as pd

    from data_pipeline_001_spark.operators.multimodal import (
        decode_features,
        make_png,
    )

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    target = spark.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < target:
        docs = docs.repartition(target)

    def build(batches):
        # round-11: the PNG is a pure function of doc_id % 300 (pixel
        # field %300, row filters %5) — per-task memo, each distinct
        # payload still built by the real make_png; the decode side
        # still inflates and filter-reverses every payload
        cache = {}
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                key = int(d) % 300
                p = cache.get(key)
                if p is None:
                    p = cache[key] = make_png(int(d))
                payloads.append(p)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "media_type": ["image/png"] * len(ids),
                }
            )

    media = docs.mapInPandas(
        build, "media_id long, payload binary, media_type string"
    )
    return decode_features(media).select(
        "media_id", "media_type", "width", "height",
        "mean_r", "mean_g", "mean_b",
    )


_PHASH_ORACLE = """
SELECT doc_id AS pair_id, TRUE AS phash_match
FROM documents
WHERE doc_id % 50 = 0 AND doc_id < 2000
"""


@query("multimodal_phash_neardup", _PHASH_ORACLE)
def multimodal_phash_neardup(spark, sf_dir):
    """Image near-duplicate detection over the binary media column:
    aHash/dHash perceptual hashes (8×8 / 8×9 NN-resampled gray
    grids, NumPy in ``mapInPandas``), Hamming-≤3 pairs via banded
    exact-match buckets (4 × 16-bit bands, pigeonhole — the SimHash
    rotation trick, never an all-pairs product).

    Planted-near-copy CONTAINMENT oracle: every 50th image is
    re-inserted brightness-shifted (+40 on every channel,
    media_id + 1_000_000) — the classic exposure-change near-dup.
    Both hashes are EXACTLY invariant under uniform brightness shifts
    (aHash compares cells to their own mean; dHash compares adjacent
    cells), so each planted pair must surface at Hamming 0: a
    deterministic guarantee, not a recall probability.

    Corpus is the fixed even-id < 2000 slice: fixture pixels are
    closed-form in doc_id, which collapses the corpus into ~5 dhash
    classes — an id-bounded slice keeps every (band, key) bucket
    under the 500-row cap at ANY sf (max class 200 + copies). Real
    image corpora don't mass-collide like this; there the cap is
    plain skew protection and the corpus scales freely."""
    import pandas as pd

    from data_pipeline_001_spark.operators.multimodal import (
        bmp_perceptual_hashes,
        make_bmp,
        phash_near_dup_pairs,
    )

    docs = load_tables(spark, sf_dir)["documents"].select("doc_id")
    imgs = docs.where(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 2000)
    )
    planted = imgs.where(F.col("doc_id") % 50 == 0)

    def build(shift, id_offset):
        def run(batches):
            for pdf in batches:
                ids = pdf["doc_id"].astype("int64")
                yield pd.DataFrame(
                    {
                        "media_id": ids + id_offset,
                        "payload": [
                            make_bmp(int(d), brightness=shift) for d in ids
                        ],
                    }
                )

        return run

    schema = "media_id long, payload binary"
    media = imgs.mapInPandas(build(0, 0), schema).unionByName(
        planted.mapInPandas(build(40, 1_000_000), schema)
    )
    pairs = phash_near_dup_pairs(
        bmp_perceptual_hashes(media), hash_col="dhash", max_hamming=3
    )
    found = pairs.where(
        (F.col("id_b") - F.col("id_a") == 1_000_000)
        & (F.col("id_a") % 50 == 0)
        & (F.col("hamming") == 0)
    ).select(F.col("id_a").alias("pair_id"))
    return (
        planted.select(F.col("doc_id").alias("pair_id"))
        .join(found.withColumn("_hit", F.lit(True)), "pair_id", "left")
        .select("pair_id", F.coalesce("_hit", F.lit(False)).alias("phash_match"))
    )
