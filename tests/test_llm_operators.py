"""Dedup / similarity / text / multimodal operator tests with planted
ground truth (exact copies, near-copies, known nearest neighbors)."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.dedup import (
    dedup_exact,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from data_pipeline_001_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    numpy_topk_batches,
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where tall trees grow in silence"
    )
    near = base.replace("lazy", "sleepy").replace("green", "dark")
    other = (
        "completely different content about database engines columnar "
        "storage vectorized execution and adaptive query planning systems"
    )
    rows = [
        (1, base, "en", "s", len(base)),
        (2, base, "en", "s", len(base)),          # exact dup of 1
        (3, "  " + base.upper() + "  ", "en", "s", len(base)),  # normalized dup of 1
        (4, near, "en", "s", len(near)),          # near dup of 1
        (5, other, "en", "s", len(other)),
        (6, other, "en", "s", len(other)),        # exact dup of 5
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_exact_dedup_normalizes_case_and_space(planted_docs):
    groups = exact_duplicates(planted_docs).collect()
    sizes = sorted(g["n_copies"] for g in groups)
    assert sizes == [1, 2, 3]  # {1,2,3}, {4}, {5,6}
    survivors = dedup_exact(planted_docs).select("doc_id").collect()
    assert {r["doc_id"] for r in survivors} == {1, 4, 5}


def test_minhash_finds_near_duplicate(planted_docs):
    pairs = minhash_lsh_pairs(
        planted_docs, num_hashes=32, bands=8, jaccard_threshold=0.3
    ).collect()
    got = {(p["id_a"], p["id_b"]) for p in pairs}
    assert (1, 2) in got  # exact dup
    assert (1, 4) in got or (2, 4) in got  # near dup found via LSH
    assert all({a, b} != {1, 5} for a, b in got)  # unrelated not paired


def test_simhash_near_dup_hamming(planted_docs):
    pairs = simhash_near_duplicates(planted_docs).collect()
    by_pair = {(p["id_a"], p["id_b"]): p["hamming"] for p in pairs}
    assert by_pair.get((1, 2)) == 0  # identical text → identical signature
    near = by_pair.get((1, 4))
    assert near is not None and near <= 16


def test_ngram_jaccard(planted_docs):
    pairs = ngram_jaccard_pairs(planted_docs, threshold=0.6).collect()
    got = {(p["id_a"], p["id_b"]): p["jaccard"] for p in pairs}
    assert got[(1, 2)] == 1.0
    assert (1, 4) in got  # near dup above 0.6
    assert all({a, b} != {1, 5} for a, b in got)


def test_similarity_bruteforce_equals_numpy(tables):
    e = tables["embeddings"]
    q = e.where(F.col("vec_id") < 3)
    bf = brute_force_topk(e, q, k=5).select("query_id", "neighbor_id", "rn")
    np_ = numpy_topk_batches(
        e,
        [(r["vec_id"], list(r["embedding"])) for r in q.collect()],
        k=5,
    ).select("query_id", "neighbor_id", "rn")
    assert bf.subtract(np_).count() == 0
    assert np_.subtract(bf).count() == 0


def test_lsh_recall_reasonable(tables):
    """Multi-probe LSH should recover a decent share of true top-5."""
    e = tables["embeddings"]
    q = e.where(F.col("vec_id") < 10)
    truth = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(e, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(e, q, k=5, bits=6, tables=8, probes=7).collect()
    }
    # synthetic embeddings are near-uniform (top-5 cosine ≈ 0.3), the
    # hardest case for LSH; 0.6 here corresponds to ~0.9+ on clustered data
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_multimodal_roundtrip_and_stub(tables, spark):
    from data_pipeline_001_spark.operators.multimodal import (
        attach_binary_payload,
        decode_stub,
        extract_features,
    )

    media = attach_binary_payload(tables["documents"].limit(20))
    feats = extract_features(media).collect()
    assert len(feats) == 20
    for f_ in feats:
        assert f_["byte_len"] > 0
        assert 0 < f_["compression_ratio"] <= 1.5
        assert len(f_["sha256"]) == 64
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image/png")
    # sha256 computed in pandas matches the JVM-side column
    jvm = {r["media_id"]: r["sha256"] for r in media.collect()}
    assert all(jvm[f_["media_id"]] == f_["sha256"] for f_ in feats)


def test_language_id_on_real_stopwords(spark):
    from data_pipeline_001_spark.operators.text_analysis import language_id

    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog sat in a box that is big", "en", "s", 1),
            (2, "le chat est dans la maison et le jardin est grand", "fr", "s", 1),
            (3, "xyzzy qwerty plugh", "??", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r["predicted_lang"] for r in language_id(docs).collect()}
    assert out[1] == "en"
    assert out[2] == "fr"
    assert out[3] == "und"
