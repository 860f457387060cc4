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
    embedding_near_dup_lsh,
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


def test_pairwise_cosine_arrow_bitwise_parity(tables, spark):
    """`pairwise_cosine_pairs` (round-11 batched-NumPy Arrow task) must
    be BIT-identical to the join+HOF form it replaced: same fold
    order per pair, same dot/(na*nb) grouping, same threshold set.
    Compared on raw doubles via struct packing — not approximate."""
    import struct

    from data_pipeline_001_spark.functions.vectors import dot, norm
    from data_pipeline_001_spark.operators.similarity import (
        pairwise_cosine_pairs,
    )

    emb = tables["embeddings"].select("vec_id", "embedding")

    def join_form(e, thr):
        a = e.select(
            F.col("vec_id").alias("id_a"),
            F.col("embedding").alias("va"),
            norm(F.col("embedding")).alias("na"),
        )
        b = e.select(
            F.col("vec_id").alias("id_b"),
            F.col("embedding").alias("vb"),
            norm(F.col("embedding")).alias("nb"),
        )
        cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
        return (
            a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
            .where(cos >= thr)
            .select("id_a", "id_b", cos.alias("cosine"))
        )

    def canon(df):
        return sorted(
            (r.id_a, r.id_b, struct.pack(">d", r.cosine).hex())
            for r in df.collect()
        )

    # every pair (threshold below any cosine) AND the thresholded set;
    # multi-partition input exercises the batch-gather path
    for thr, expect_rows in ((-2.0, True), (0.5, False)):
        old = canon(join_form(emb, thr))
        new = canon(pairwise_cosine_pairs(emb.repartition(4), threshold=thr))
        assert old == new
        if expect_rows:  # sf0.001 has no pair >= 0.5; -2.0 keeps all
            assert len(old) > 0

    # zero-norm vector: the join form raises ANSI DIVIDE_BY_ZERO; the
    # Arrow task must be equally loud, not silently emit NaN
    bad = spark.createDataFrame(
        [(1, [0.0] * 64), (2, [1.0] * 64)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
        pairwise_cosine_pairs(bad, threshold=0.5).collect()


def _numpy_truth(tables):
    """Exact neighbors computed driver-side with NumPy: the ground
    truth for recall tests needs no Spark job — sf0.001 embeddings fit
    trivially in memory, and the SUBJECT under test (the distributed
    ANN operator) still runs on Spark. Returns (ids, unit_matrix)."""
    import numpy as np

    rows = tables["embeddings"].select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat / np.where(norms == 0, 1, norms)


def _numpy_topk_pairs(ids, unit, query_mask, k=5):
    import numpy as np

    out = set()
    for qi in np.where(query_mask)[0]:
        cos = unit @ unit[qi]
        cos[qi] = -2.0  # exclude self
        order = np.lexsort((ids, -np.round(cos, 6)))
        for j in order[:k]:
            out.add((int(ids[qi]), int(ids[j])))
    return out


def test_lsh_recall_reasonable(tables):
    """Multi-probe LSH should recover a decent share of true top-5
    (exact truth computed driver-side with NumPy — same rounding and
    id tiebreak as brute_force_topk)."""
    e = tables["embeddings"]
    q = e.where(F.col("vec_id") < 10)
    ids, unit = _numpy_truth(tables)
    truth = _numpy_topk_pairs(ids, unit, ids < 10, k=5)
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(e, q, k=5, bits=6, tables=8, probes=7).collect()
    }
    # synthetic embeddings are near-uniform (top-5 cosine ≈ 0.3), the
    # hardest case for LSH; 0.6 here corresponds to ~0.9+ on clustered data
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.6, f"LSH recall too low: {recall}"


def test_embedding_lsh_recall_vs_exact(tables):
    """The registered primary near-dup path (LSH buckets → exact verify)
    vs the exact O(n²) twin at the same threshold: precision must be
    1.0 (verify stage scores candidates exactly) and recall high.

    At cosine 0.4 (θ≈66°, p=1-θ/π≈0.63) with bits=4/tables=16 the
    analytic recall floor is 1-(1-0.63^4)^16 ≈ 0.94; assert 0.7 to
    absorb seed variance on the hardest (near-threshold) pairs."""
    import numpy as np

    e = tables["embeddings"]
    ids, unit = _numpy_truth(tables)
    cos = np.triu(unit @ unit.T, k=1)
    ii, jj = np.where(cos >= 0.4)
    truth = {
        (int(min(ids[i], ids[j])), int(max(ids[i], ids[j])))
        for i, j in zip(ii, jj)
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_lsh(e, threshold=0.4, bits=4, tables=16).collect()
    }
    assert approx <= truth, "verify stage must give precision 1.0"
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.7, f"embedding LSH recall too low: {recall}"


def test_embedding_lsh_finds_planted_near_copies(tables, spark):
    """A jittered copy (cosine≈0.99) must collide in at least one of
    the 16 tables — planted pairs are all recovered."""
    e = tables["embeddings"].where(F.col("vec_id") < 50).select(
        "vec_id", "embedding"
    )
    jittered = e.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * F.lit(1.001)).cast("float")
        ).alias("embedding"),
    )
    pairs = embedding_near_dup_lsh(
        e.unionByName(jittered), threshold=0.9, bits=4, tables=16
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    for i in range(50):
        assert (i, i + 100000) in found, f"planted pair {i} missed"


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
        decode_stub(b"bytes", "image/jpeg")
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


def test_chunk_documents_coverage_and_overlap(tables, spark):
    """Every character lands in >=1 chunk; consecutive chunks overlap
    by exactly overlap_chars (except a short final remainder); chunks
    reassemble to the original text."""
    from data_pipeline_001_spark.operators.text_analysis import chunk_documents

    docs = tables["documents"].where(F.col("doc_id") < 20)
    out = chunk_documents(docs, chunk_chars=100, overlap_chars=30).collect()
    originals = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert by_doc.keys() == originals.keys()
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r["chunk_id"])
        text = originals[doc_id]
        stride = 70
        rebuilt = chunks[0]["chunk_text"]
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur["chunk_start"] == prev["chunk_start"] + stride
            # overlap region identical between neighbors
            assert prev["chunk_text"][stride:] == cur["chunk_text"][: len(prev["chunk_text"]) - stride]
            rebuilt += cur["chunk_text"][len(prev["chunk_text"]) - stride:]
        assert rebuilt == text
        # last chunk reaches the end of the document
        last = chunks[-1]
        assert last["chunk_start"] + last["chunk_chars"] == len(text)


def test_scrub_pii_redacts_planted_patterns(spark):
    from data_pipeline_001_spark.operators.text_analysis import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@corp.example.org thanks"),
            (2, "call +1-555-123 4567 or 020 7946 0958 now"),
            (3, "no personal data here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["scrubbed_text"]
    assert "jane.doe" not in out[1]["scrubbed_text"]
    assert out[2]["n_phones"] == 2
    assert out[2]["scrubbed_text"].count("<PHONE>") == 2
    assert not any(ch.isdigit() for ch in out[2]["scrubbed_text"])
    assert out[3]["n_emails"] == 0 and out[3]["n_phones"] == 0
    assert out[3]["scrubbed_text"] == "no personal data here at all"


def test_repetition_ratio_flags_boilerplate(spark):
    from data_pipeline_001_spark.operators.text_analysis import repetition_ratio

    docs = spark.createDataFrame(
        [
            (1, "click here now " * 20),                      # pure repetition
            (2, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_ratio(docs).collect()}
    assert out[1]["repetition_ratio"] > 0.3  # dominated by one trigram
    assert out[2]["max_shingle_count"] == 1
    assert out[2]["repetition_ratio"] == round(1 / out[2]["n_shingles"], 6)
    assert out[1]["repetition_ratio"] > out[2]["repetition_ratio"]


def test_connected_components_transitive_chain(spark):
    """A-B and B-C pairs (A never directly paired with C) must land in
    ONE cluster labeled by the min id; disjoint pairs stay separate;
    multi-hop chains converge."""
    from data_pipeline_001_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 4), (6, 5), (7, 6)],  # chain 4-5-6-7
        "id_a long, id_b long",
    )
    out = {r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 4: 4, 5: 4, 6: 4, 7: 4}


def test_cluster_components_lsh_recovers_planted_clusters(planted_docs):
    """The LSH-sourced scale path must recover the planted components:
    {1,2,3,4} (exact + near dups of base) and {5,6} (exact dups)."""
    from data_pipeline_001_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )

    pairs = minhash_lsh_pairs(
        planted_docs, num_hashes=32, bands=8, jaccard_threshold=0.3
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert {got[d] for d in (1, 2, 3, 4) if d in got} == {1}
    assert got[5] == got[6] == 5
    # both planted components found, min-id labeling, disjoint
    assert set(got.values()) == {1, 5}


def test_duplicated_substring_spans_planted(spark):
    from data_pipeline_001_spark.operators.text_analysis import (
        duplicated_substring_spans,
    )

    shared = "the exact duplicated passage both documents quote verbatim here"  # 63 chars
    a = "unique prefix for document alpha keeps going " + shared + " unique alpha tail content"
    b = "totally different beginning material bravo xx " + shared + " another distinct ending"
    c = "no overlap at all in this third document just filler words repeated"
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    out = duplicated_substring_spans(docs, k=40).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # only the two quoting docs carry spans
    assert set(by_doc) == {1, 2}
    for doc_id, row in by_doc.items():
        # span must cover the shared passage (63 chars ≥ span ≥ k)
        assert row["span_len"] >= len(shared)
        text = a if doc_id == 1 else b
        lo = row["span_start"] - 1
        covered = text.lower()[lo : lo + row["span_len"]]
        assert shared in covered


def test_char_kgram_hashes_match_window_composition(spark):
    """Round-11 parity pin: the Arrow/NumPy k-gram hash path must be
    bit-identical to the former JVM form (8-gram rolling hashes via
    posexplode + Window lead, composed with power weights) — on
    ASCII, non-ASCII codepoints, and docs shorter than k."""
    from pyspark.sql import Window

    from data_pipeline_001_spark.operators.text_analysis import (
        char_kgram_hashes,
        rolling_hash_windows,
    )

    k, base, mod = 16, 257, (1 << 31) - 1
    docs = spark.createDataFrame(
        [
            (1, "The quick   brown fox JUMPS over the lazy dog again"),
            (2, "naïve café über-résumé — çédille and ß sharp s mix"),
            (3, "short"),  # shorter than k → no windows
            (4, "exactly sixteen!"),  # length == k → one window
            (5, None),
        ],
        "doc_id long, text string",
    )

    # the former formulation, verbatim
    rh8 = rolling_hash_windows(docs, "text", "doc_id", k=8, base=base, mod=mod)
    n_chunks = k // 8
    w = Window.partitionBy("id").orderBy("pos")
    h = None
    for j in range(n_chunks):
        p = pow(base, 8 * (n_chunks - 1 - j), mod)
        term = (
            (F.lead("rh", 8 * j).over(w) if j else F.col("rh")) * F.lit(p)
        ) % F.lit(mod)
        h = term if h is None else (h + term) % F.lit(mod)
    old = (
        rh8.select(
            "id",
            "pos",
            h.alias("hk"),
            F.lead("rh", 8 * (n_chunks - 1)).over(w).alias("_tail"),
        )
        .where(F.col("_tail").isNotNull())
        .drop("_tail")
    )

    new = char_kgram_hashes(docs, "text", "doc_id", k, base=base, mod=mod)
    old_rows = sorted(map(tuple, old.collect()))
    new_rows = sorted(map(tuple, new.collect()))
    assert old_rows == new_rows
    assert len(new_rows) > 0


def test_duplicated_substring_spans_requires_multiple_of_8(spark):
    from data_pipeline_001_spark.operators.text_analysis import (
        duplicated_substring_spans,
    )

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        duplicated_substring_spans(docs, k=30)


def test_pq_recall_and_exact_scores(tables):
    """PQ+rerank: decent recall of true top-5, and every returned
    cosine must be the EXACT cosine (rerank recomputes it)."""
    from data_pipeline_001_spark.operators.similarity import pq_topk

    e = tables["embeddings"]
    q = e.where(F.col("vec_id") < 10)
    truth_rows = brute_force_topk(e, q, k=5).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in truth_rows}
    exact_cos = {
        (r["query_id"], r["neighbor_id"]): r["cosine"] for r in truth_rows
    }
    got = pq_topk(e, q, k=5, m=8, nbits=4, rerank=6).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.5, f"PQ recall too low: {recall}"
    for r in got:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_cos:
            assert abs(r["cosine"] - exact_cos[key]) < 1e-9


def test_pq_codes_shape(tables, spark):
    from data_pipeline_001_spark.operators.similarity import (
        pq_encode,
        pq_train_codebooks,
    )

    e = tables["embeddings"]
    books = pq_train_codebooks(e, m=8, nbits=4)
    assert books.shape == (8, 16, 8)
    codes = pq_encode(e, books).collect()
    assert len(codes) == e.count()
    for r in codes[:20]:
        assert len(r["code"]) == 8
        assert all(0 <= c < 16 for c in r["code"])


def test_pq_codebooks_deterministic_and_small_corpus_safe(tables, spark):
    """ADVICE r2: the training sample must be ordered (a bare limit()
    is partition-layout-dependent), and a corpus smaller than 2^nbits
    must train without raising (seed with replacement)."""
    import numpy as np

    from data_pipeline_001_spark.operators.similarity import pq_train_codebooks

    e = tables["embeddings"]
    a = pq_train_codebooks(e, m=8, nbits=4, sample=200)
    b = pq_train_codebooks(e.repartition(7), m=8, nbits=4, sample=200)
    assert np.array_equal(a, b)  # layout-independent

    tiny = e.orderBy("vec_id").limit(5)  # 5 vectors < 2^4 centroids
    books = pq_train_codebooks(tiny, m=8, nbits=4)
    assert books.shape == (8, 16, 8)
    assert np.isfinite(books).all()


def test_minhash_incremental_rejects_near_copies(spark):
    from data_pipeline_001_spark.operators.dedup import minhash_incremental

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep green forest where tall trees grow in silence"
    )
    near = base.replace("lazy", "sleepy").replace("green", "dark")
    novel = (
        "entirely new material about vectorized query execution and "
        "columnar storage layouts with adaptive runtime planning"
    )
    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(1, base), (2, "other corpus doc here with words")], schema)
    batch = spark.createDataFrame(
        [(10, near), (11, novel), (12, base)], schema  # near-copy, novel, exact copy
    )
    out = {r["doc_id"]: r for r in minhash_incremental(batch, corpus).collect()}
    assert out[10]["admitted"] == 0 and out[10]["best_match_id"] == 1
    assert out[10]["best_jaccard"] >= 0.5
    assert out[12]["admitted"] == 0 and out[12]["best_jaccard"] == 1.0
    assert out[11]["admitted"] == 1


def test_semantic_dedup_collapses_planted_near_identicals(spark, tables):
    """SemDeDup contract: planted near-identical copies of an existing
    vector are removed (one canonical survivor, min id), distinct
    vectors keep, and every removed row has a kept near neighbor at or
    above the threshold."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.functions.vectors import cosine_similarity
    from data_pipeline_001_spark.operators.similarity import semantic_dedup

    e = tables["embeddings"]
    base = e.orderBy("vec_id").limit(3).collect()
    planted = []
    for i, r in enumerate(base):
        v = np.array(r["embedding"], dtype=np.float64)
        noisy = v + np.random.RandomState(i).normal(0, 1e-4, len(v))
        planted.append((900000 + i, [float(x) for x in noisy]))
    corpus = e.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    )
    out = semantic_dedup(corpus, n_clusters=8, threshold=0.95)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == corpus.count()
    for i, r in enumerate(base):
        twin = rows[900000 + i]
        orig = rows[r["vec_id"]]
        # the planted copy joins its original's group; min id survives
        assert twin["group_id"] == orig["group_id"] == orig["vec_id"]
        assert not twin["keep"] and orig["keep"]

    # every removed row has a kept neighbor >= threshold
    removed = out.where(~F.col("keep")).select(
        F.col("vec_id").alias("rid"), F.col("group_id").alias("g")
    )
    kept = out.where(F.col("keep")).select(F.col("vec_id").alias("kid"))
    vecs = corpus.select("vec_id", "embedding")
    pairs = (
        removed.join(vecs.withColumnRenamed("vec_id", "rid"), "rid")
        .withColumnRenamed("embedding", "ev_r")
        .join(kept.join(vecs.withColumnRenamed("vec_id", "kid"), "kid"), F.col("g") == F.col("kid"))
        .withColumnRenamed("embedding", "ev_k")
        .where(cosine_similarity(F.col("ev_r"), F.col("ev_k")) >= 0.95)
    )
    assert pairs.count() == removed.count()


def test_semantic_dedup_deterministic(spark, tables):
    from data_pipeline_001_spark.operators.similarity import semantic_dedup

    e = tables["embeddings"]
    a = semantic_dedup(e, n_clusters=8, threshold=0.93).collect()
    b = semantic_dedup(e.repartition(5), n_clusters=8, threshold=0.93).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bmp_wav_decode_roundtrip_pure_python():
    """The struct-built fixtures decode back to their closed-form
    parameters; RMS matches a locally computed value."""
    import math

    from data_pipeline_001_spark.operators.multimodal import (
        decode_bmp,
        decode_media,
        decode_wav,
        make_bmp,
        make_wav,
    )

    for d in (0, 2, 7, 41, 999, 123456):
        img = decode_bmp(make_bmp(d))
        w, h = 4 + d % 5, 3 + d % 3
        assert (img["width"], img["height"]) == (w, h)
        assert img["mean_r"] == (d % 100) + (w - 1) / 2.0 + (h - 1) / 2.0
        assert img["mean_g"] == ((2 * d) % 100) + (w - 1) / 2.0
        assert img["mean_b"] == ((3 * d) % 100) + (h - 1) / 2.0

        wav = decode_wav(make_wav(d))
        rate = 8000 + (d % 3) * 4000
        n, step = 500 + d % 250, 1 + d % 7
        assert wav["sample_rate"] == rate
        assert (wav["channels"], wav["bits"]) == (1, 16)
        assert wav["n_samples"] == n
        assert wav["duration_ms"] == n * 1000.0 / rate
        expected_rms = math.sqrt(
            sum((((i * step) % 2048) - 1024) ** 2 for i in range(n)) / n
        )
        assert abs(wav["rms"] - expected_rms) < 1e-9

    # dispatch: native formats decode, codec formats stay loud
    assert decode_media(make_bmp(4), "image/bmp")["width"] == 8
    assert decode_media(make_wav(3), "audio/wav")["sample_rate"] == 8000
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff", "image/jpeg")
    # foreign bytes are rejected, not mis-parsed
    with pytest.raises(ValueError):
        decode_bmp(b"PNG whatever")
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxAVI LIST")


def test_png_decode_roundtrip_all_filters():
    """The zlib+filter-predictor PNG decoder recovers the exact
    closed-form pixel statistics; the fixture's per-row predictor
    (doc_id + y) % 5 means these ids jointly cover all five PNG
    filters, so a pass proves every reversal."""
    import struct
    import zlib

    from data_pipeline_001_spark.operators.multimodal import (
        decode_bmp,
        decode_media,
        decode_png,
        make_bmp,
        make_png,
    )

    covered = set()
    for d in (0, 1, 2, 3, 4, 7, 41, 999, 123456):
        img = decode_png(make_png(d))
        w, h = 4 + d % 5, 3 + d % 3
        covered.update((d + y) % 5 for y in range(h))
        assert (img["width"], img["height"]) == (w, h)
        assert img["mean_r"] == (d % 100) + (w - 1) / 2.0 + (h - 1) / 2.0
        assert img["mean_g"] == ((2 * d) % 100) + (w - 1) / 2.0
        assert img["mean_b"] == ((3 * d) % 100) + (h - 1) / 2.0
        # PNG and BMP fixtures encode the SAME pixel field: decoded
        # stats must agree exactly across the two container formats
        bmp = decode_bmp(make_bmp(d))
        assert {k: img[k] for k in ("width", "height", "mean_r")} == {
            k: bmp[k] for k in ("width", "height", "mean_r")
        }
    assert covered == {0, 1, 2, 3, 4}

    # brightness shift moves every channel mean by exactly the offset
    base, lit = decode_png(make_png(50)), decode_png(make_png(50, brightness=40))
    assert lit["mean_r"] == base["mean_r"] + 40

    assert decode_media(make_png(4), "image/png")["width"] == 8

    # corruption stays loud: bad magic, CRC damage, truncation,
    # unsupported color type
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"BM not a png")
    good = bytearray(make_png(7))
    good[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    with pytest.raises(ValueError):
        decode_png(make_png(7)[:20])
    sig = make_png(7)[:8]
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0)  # RGBA
    bad = (
        sig
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(NotImplementedError, match="color_type=6"):
        decode_png(bad)


def test_decoded_features_distributed(tables, spark):
    """mapInPandas build -> decode over a real documents slice: every
    row carries exactly its modality's columns."""
    from data_pipeline_001_spark.operators.multimodal import (
        attach_media_fixtures,
        decode_features,
    )

    docs = tables["documents"].limit(30)
    out = decode_features(attach_media_fixtures(docs)).collect()
    assert len(out) == 30
    for r in out:
        if r["media_type"] == "image/bmp":
            assert r["width"] is not None and r["sample_rate"] is None
            assert r["media_id"] % 2 == 0
            assert r["mean_r"] == (
                (r["media_id"] % 100)
                + (r["width"] - 1) / 2.0
                + (r["height"] - 1) / 2.0
            )
        else:
            assert r["sample_rate"] is not None and r["width"] is None
            assert r["media_id"] % 2 == 1
            assert r["rms"] > 0


def test_html_to_text_strips_boilerplate_keeps_content(spark):
    from data_pipeline_001_spark.operators.text_analysis import html_to_text

    cases = [
        # (raw html, expected extraction)
        (
            "<html><head><script>var a = 1 < 2 && 'x';</script>"
            "<style>p{}</style><!-- hidden --></head>"
            "<body><h1>Title</h1>\n<p>Hello   world</p></body></html>",
            "Title Hello world",
        ),
        ("&lt;tag&gt; &amp;&#97;mp; &quot;q&#39;", "<tag> &amp; \"q'"),
        # &amp; decodes LAST: double-encoded entity stays single-decoded
        ("&amp;#97;", "&#97;"),
        ("<SCRIPT SRC='x'>nested < tags </SCRIPT>ok", "ok"),
        ("no markup at all", "no markup at all"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i long, html string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"case {i}: {got[i]!r} != {want!r}"


def test_canonicalize_url_contract(spark):
    from data_pipeline_001_spark.operators.text_analysis import (
        canonicalize_url,
        url_domain,
    )

    cases = [
        ("HTTP://WWW.Example.COM/A/B/?utm_source=x&id=7&utm_medium=y",
         "https://example.com/A/B?id=7"),
        ("https://sub.site.org/p?a=1&b=2", "https://sub.site.org/p?a=1&b=2"),
        ("https://site.org/", "https://site.org"),
        ("https://site.org/path/?utm_only=1", "https://site.org/path"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i long, url string"
    )
    rows = df.select(
        "i",
        canonicalize_url(F.col("url")).alias("c"),
    ).withColumn("d", url_domain(F.col("c"))).collect()
    got = {r["i"]: (r["c"], r["d"]) for r in rows}
    for i, (_, want) in enumerate(cases):
        assert got[i][0] == want, f"case {i}: {got[i][0]!r} != {want!r}"
    assert got[0][1] == "example.com"


def test_line_dedup_drops_boilerplate_keeps_order(spark):
    from data_pipeline_001_spark.operators.text_analysis import line_dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha one\nFOOTER\nbeta two"),
            (2, "FOOTER\ngamma three"),
            (3, "delta four\nFOOTER"),
            (4, "FOOTER\nFOOTER\nepsilon five"),  # repeated within doc
            (5, "all unique here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_doc_freq=4).collect()}
    # FOOTER appears in 4 distinct docs -> dropped everywhere,
    # including BOTH copies in doc 4 (df counts distinct docs, not rows)
    assert out[1]["clean_text"] == "alpha one\nbeta two"
    assert out[2]["clean_text"] == "gamma three"
    assert out[3]["clean_text"] == "delta four"
    assert out[4]["clean_text"] == "epsilon five"
    assert (out[4]["n_kept"], out[4]["n_dropped"]) == (1, 2)
    assert out[5]["clean_text"] == "all unique here"
    assert out[5]["n_dropped"] == 0
    # a doc that is ONLY boilerplate survives as an empty row, not lost
    only = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "X"), (4, "X")], "doc_id long, text string"
    )
    o = {r["doc_id"]: r for r in line_dedup(only, min_doc_freq=4).collect()}
    assert all(o[i]["clean_text"] == "" and o[i]["n_kept"] == 0 for i in o)


def test_resize_and_frame_energy_pure_python():
    import math

    from data_pipeline_001_spark.operators.multimodal import (
        make_bmp,
        make_wav,
        resize_bmp_nearest,
        wav_frame_energy,
    )

    for d in (0, 2, 8, 44, 1234):
        w, h = 4 + d % 5, 3 + d % 3
        t = resize_bmp_nearest(make_bmp(d), 2, 2)
        # nearest-neighbor at (tx*w//2, ty*h//2) with LOGICAL rows
        # (bottom-up layout flipped) -> exact closed-form means
        assert t["thumb_mean_r"] == (d % 100) + (w // 2) / 2.0 + (h // 2) / 2.0
        assert t["thumb_mean_g"] == ((2 * d) % 100) + (w // 2) / 2.0
        assert t["thumb_mean_b"] == ((3 * d) % 100) + (h // 2) / 2.0
        # identity resize reproduces the full-image means exactly
        from data_pipeline_001_spark.operators.multimodal import decode_bmp

        full = decode_bmp(make_bmp(d))
        ident = resize_bmp_nearest(make_bmp(d), w, h)
        assert ident["thumb_mean_r"] == full["mean_r"]

    for d in (1, 3, 7, 101):
        n, step = 500 + d % 250, 1 + d % 7
        fr = wav_frame_energy(make_wav(d), frame_samples=100)
        assert fr["n_frames"] == (n + 99) // 100
        samples = [((i * step) % 2048) - 1024 for i in range(n)]
        rms = [
            math.sqrt(sum(s * s for s in samples[i : i + 100]) / len(samples[i : i + 100]))
            for i in range(0, n, 100)
        ]
        assert abs(fr["max_frame_rms"] - max(rms)) < 1e-9
        assert abs(fr["mean_frame_rms"] - sum(rms) / len(rms)) < 1e-9


def test_review_fix_regressions(spark):
    """Round-4 self-review fixes: scheme-less URLs canonicalize to
    NULL (not a collapsed near-empty key); empty-data WAVs report
    zero frames with NULL energies; sampled_features rejects
    unsupported media types with the documented error."""
    import struct

    import pandas as pd
    from pyspark.sql import functions as F

    from data_pipeline_001_spark.operators.multimodal import (
        sampled_features,
        wav_frame_energy,
    )
    from data_pipeline_001_spark.operators.text_analysis import canonicalize_url

    df = spark.createDataFrame(
        [(1, "example.com/a?x=1"), (2, "https://ok.org/p")], "i long, url string"
    )
    got = {r["i"]: r["c"] for r in df.select("i", canonicalize_url(F.col("url")).alias("c")).collect()}
    assert got[1] is None
    assert got[2] == "https://ok.org/p"

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    empty_wav = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    d = wav_frame_energy(empty_wav)
    assert d["n_frames"] == 0
    assert d["max_frame_rms"] is None and d["mean_frame_rms"] is None

    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1], "payload": [b"\xff\xd8\xff"], "media_type": ["image/jpeg"]}
        )
    )
    import pytest as _pytest

    with _pytest.raises(Exception, match="codec libraries"):
        sampled_features(media).collect()


def test_arrow_regex_count_parity_with_jvm(spark):
    """The Arrow/RE2 counter must be bit-identical to JVM regexp_count
    on the token pattern — incl. NULL, empty, unicode (code-point
    classes), and long adversarial strings. This parity is what lets
    text_stats_by_lang / text_token_counts take the 2.3×-faster RE2
    path while keeping their DuckDB oracles."""
    from data_pipeline_001_spark.functions import text as TX

    rows = [
        (0, "hello, world 42 foo-bar!"),
        (1, ""),
        (2, None),
        (3, "   \t\n  "),
        (4, "a…b café Über straße 3.14"),
        (5, "\U0001f600 emoji \U0001f680x9"),  # non-BMP: surrogate pair in UTF-16
        (6, "x" * 5000 + "!?" * 100),
        (7, "1234567890" * 50),
        # \x0B (vertical tab): java.util.regex \s includes it, RE2's
        # \s does not — the explicit [ \t\n\x0B\f\r] class in
        # TOKEN_PATTERN must make both engines treat it as whitespace
        (8, "a\x0bb ,\x0b, c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select(
        "doc_id",
        TX.regex_token_count(F.col("text")).alias("jvm"),
        TX.regex_token_count_arrow(F.col("text")).alias("arrow"),
    ).collect()
    assert len(out) == len(rows)
    for r in out:
        assert r["jvm"] == r["arrow"], (r["doc_id"], r["jvm"], r["arrow"])


def test_arrow_regex_count_rejects_non_re2_syntax(spark):
    from data_pipeline_001_spark.functions.udfs import arrow_regex_count

    for bad in (r"(?=x)y", r"(?!a)b", r"(?<=a)b", r"(a)\1"):
        with pytest.raises(ValueError):
            arrow_regex_count(bad)
    arrow_regex_count(r"(\?)")  # literal escaped '?' is fine


def test_bpe_pair_stats_planted_top_pair(spark):
    from data_pipeline_001_spark.operators.text_analysis import bpe_pair_stats

    df = spark.createDataFrame(
        [
            (1, "banana banana band"),
            (2, "An ANA anna x"),  # case folding; 1-char word dropped
            (3, "   "),
        ],
        "doc_id long, text string",
    )
    out = bpe_pair_stats(df, top_k=3).collect()
    # 'an' occurrences: banana(2 each ×2 words)=4, band=1, an=1, ana=1,
    # anna=1 → 8; 'na' = 2+2+1+1 = 6
    assert (out[0]["pair"], out[0]["n"]) == ("an", 8)
    assert (out[1]["pair"], out[1]["n"]) == ("na", 6)
    assert len(out) == 3


def test_bpe_encode_merges_known_words(spark):
    """The fixed merge table actually merges: 'the' and 'and' collapse
    to single tokens, 'inner' to 'in n er' = 3 — and, since the
    round-5 sentinel fix, a merge can never consume the tail of a
    LONGER token: 'other' is [o, the, r], not [o, ther]."""
    from data_pipeline_001_spark.plans.queries_mlprep import (
        _bpe_sql_chain,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("the",), ("and",), ("inner",), ("thethe",), ("other",)],
        "w string",
    )
    seq = "rtrim(regexp_replace(w, '(.)', '$1 '))"
    chain = _bpe_sql_chain(seq)
    n_tok = f"length({chain}) - length(replace({chain}, ' ', '')) - 1"
    got = {
        r.w: (r.seq, r.n)
        for r in df.select(
            "w",
            F.expr(chain).alias("seq"),
            F.expr(n_tok).alias("n"),
        ).collect()
    }
    assert got["the"] == (" the ", 1)        # t h→th, th e→the
    assert got["and"] == (" and ", 1)        # a n→an, an d→and
    assert got["inner"] == (" in n er ", 3)  # i n→in, e r→er
    # documented residual vs merge-all BPE: adjacent merge sites
    # share a delimiter space, so the second 'th e' site survives one
    # rule pass (both engines share this exactly — see _bpe_sql_chain)
    assert got["thethe"] == (" the th e ", 3)
    # the round-4 boundary bug: rule (e,r) used to substring-match
    # ' the r' and produce 'o ther' (2 tokens)
    assert got["other"] == (" o the r ", 3)


def test_bpe_train_matches_reference_algorithm(spark):
    """The learned merge table equals a pure-Python reference BPE
    (count adjacent pairs over the current tokenization, argmax with
    (count DESC, pair ASC) tiebreak, leftmost-greedy merge) run on
    the same corpus."""
    from collections import Counter

    from data_pipeline_001_spark.operators.text_analysis import bpe_train

    texts = [
        "the theme thesis then",
        "and the sand band thematic",
        "banana bandana the and",
    ]

    def ref_bpe(texts, n_merges):
        import re

        words = []
        for t in texts:
            words += re.findall("[a-z]+", t.lower())
        seqs = [list(w) for w in words if len(w) >= 2]
        merges = []
        for step in range(1, n_merges + 1):
            c = Counter()
            for s in seqs:
                for i in range(len(s) - 1):
                    c[(s[i], s[i + 1])] += 1
            if not c:
                break
            (l, r), n = min(
                c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            merges.append((step, l, r, n))
            out = []
            for s in seqs:
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        ns.append(l + r)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                out.append(ns)
            seqs = out
        return merges

    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r.step, r.left, r.right, r.pair_count)
        for r in bpe_train(docs, n_merges=6).orderBy("step").collect()
    ]
    assert got == ref_bpe(texts, 6)


def test_compressibility_orders_text_quality(spark):
    """Planted ordering: repeated boilerplate compresses hardest,
    normal prose in the middle, hex noise worst; NULL/empty → NULL."""
    import secrets

    from pyspark.sql import functions as F

    from data_pipeline_001_spark.functions.udfs import zlib_compress_ratio

    rows = [
        ("rep", "spam " * 400),
        ("prose", "the quick brown fox jumps over the lazy dog and "
                  "then wanders back home through the quiet evening " * 20),
        ("noise", secrets.token_hex(1000)),
        ("empty", ""),
        ("null", None),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    got = {
        r.k: r.r
        for r in df.select(
            "k", zlib_compress_ratio(F.col("text")).alias("r")
        ).collect()
    }
    assert got["empty"] is None and got["null"] is None
    assert got["rep"] < 0.05 < got["prose"] < got["noise"]


# -- perceptual hashing (image near-dup over the binary column) --------


def test_phash_brightness_invariance_and_sensitivity():
    """aHash/dHash must be EXACTLY invariant under uniform brightness
    shifts (the planted-pair guarantee) and must differ across
    genuinely different images (not a constant function)."""
    from data_pipeline_001_spark.operators.multimodal import (
        ahash64,
        dhash64,
        make_bmp,
    )

    hashes = set()
    for d in range(0, 60, 2):
        base = make_bmp(d)
        for shift in (1, 40, 99):
            assert ahash64(base) == ahash64(make_bmp(d, brightness=shift))
            assert dhash64(base) == dhash64(make_bmp(d, brightness=shift))
        hashes.add((ahash64(base), dhash64(base)))
    assert len(hashes) > 1


def test_phash_near_dup_recovers_planted_pairs(spark, tables):
    """Planted brightness-shifted copies must come back as Hamming-0
    pairs through the banded bucket join; pairs output must be exact
    (verified hamming, precision 1.0 against direct hash distance)."""
    import pandas as pd

    from data_pipeline_001_spark.operators.multimodal import (
        bmp_perceptual_hashes,
        make_bmp,
        phash_near_dup_pairs,
    )

    ids = list(range(0, 200, 2))
    rows = [(i, make_bmp(i)) for i in ids] + [
        (i + 1_000_000, make_bmp(i, brightness=25)) for i in ids if i % 50 == 0
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )
    pairs = phash_near_dup_pairs(
        bmp_perceptual_hashes(media), hash_col="dhash", max_hamming=3
    ).collect()
    planted = {
        (i, i + 1_000_000) for i in ids if i % 50 == 0
    }
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert planted <= found
    for r in pairs:
        assert 0 <= r["hamming"] <= 3
        if (r["id_a"], r["id_b"]) in planted:
            assert r["hamming"] == 0


def test_phash_pigeonhole_bands_catch_hamming_3():
    """Flipping any ≤3 bits of a 64-bit hash must leave at least one
    of the 4 16-bit bands untouched (the pigeonhole guarantee the
    bucket join relies on)."""
    import itertools
    import random

    rng = random.Random(7)
    for _ in range(200):
        sig = rng.getrandbits(64)
        nbits = rng.randint(1, 3)
        flipped = sig
        for b in rng.sample(range(64), nbits):
            flipped ^= 1 << b
        shared = any(
            (sig >> (16 * i)) & 0xFFFF == (flipped >> (16 * i)) & 0xFFFF
            for i in range(4)
        )
        assert shared


def test_semantic_dedup_threshold_keeps_blas_safe_margin():
    """Round-9 (advice): the planted-copy oracle for
    dedup_semantic_clusters is order-invariant ONLY because identical
    vectors (cosine exactly 1.0) clear the threshold by a wide margin
    — BLAS matmul accumulation differs from a sequential fold by ~1
    ulp, so a threshold within ulp-distance of 1.0 would make engine
    parity depend on float accumulation order. Pin the margin."""
    from data_pipeline_001_spark.plans.queries_llm import (
        SEMANTIC_DEDUP_THRESHOLD,
    )

    assert 1.0 - SEMANTIC_DEDUP_THRESHOLD >= 0.01
