"""Similarity search over embedding columns (SURVEY.md §2.13).

- ``brute_force_topk``: exact cosine top-k. The query side is small
  and explicitly broadcast; the corpus side streams — one pass, no
  shuffle of the corpus. This is the correctness baseline.
- ``lsh_topk``: random-hyperplane LSH bucketing. Corpus and queries
  hash to sign-bit buckets (with multi-probe on the query side); only
  same-bucket pairs are scored. This is the 100 TB path: the bucket
  key becomes the join/shuffle key and candidate count per query is
  ~corpus/2^bits · probes instead of the whole corpus.
- ``numpy_topk_batches``: Arrow-batched ``mapInPandas`` variant that
  does the matmul in NumPy per batch — the pattern for when the score
  function outgrows column expressions (e.g. learned metrics).
"""

from __future__ import annotations

import math
import random
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_001_spark.functions.vectors import cosine_similarity, dot, norm

def _cos_prenormed(q_vec, c_vec, q_norm, c_norm):
    """cosine with per-vector norms precomputed BEFORE the join: the
    norm is a property of one vector, so computing it inside an
    n_queries × n_corpus join repeats it n-fold (measured ~2× whole-
    query at the sf1 bench point). Same operations, same order →
    bit-equal to cosine_similarity."""
    return dot(q_vec, c_vec) / (q_norm * c_norm)



def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine) — k rows per query.

    ``queries`` is broadcast; ties broken by neighbor id for
    determinism. Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _cos_prenormed(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def pairwise_cosine_pairs(
    corpus: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 1024,
    max_rows: int = 20_000,
) -> DataFrame:
    """All-pairs exact cosine: (id_a, id_b, cosine) for every id_a <
    id_b with cosine >= threshold, ``cosine`` the RAW double (callers
    round). The bounded small-sf oracle twin of the LSH scale paths —
    never the plan for a full corpus (quadratic by definition).

    Round-11 shape (guide §4.2): the former broadcast BNLJ evaluated
    an interpreted 64-term HOF fold per PAIR (twice: filter +
    projection). Pairwise work over a bounded slice is one task's
    worth of NumPy, so the whole table is coalesced into ONE Arrow
    task and the n×n cosine matrix is computed with dim vectorized
    multiply-adds, sequential over the DIMENSION axis: per pair the
    IEEE operation sequence ((0+a₀b₀)+a₁b₁)+… is exactly the
    ``functions.vectors.dot`` left fold, norms likewise, then
    dot/(nᵃ·nᵇ) — so every emitted double is bit-identical to the
    join+HOF form (pinned by a parity test). A zero-norm vector
    raises loudly, mirroring the ANSI DIVIDE_BY_ZERO the join form
    hits; with all norms nonzero no NaN can arise, so the ``~(cos <
    t)`` keep-mask is exactly ``>=``. Row blocks bound peak memory at
    block×n doubles; measured 26.0 → 1.5 s on the 2000-row sf0.1
    table (the sf1 sweep's slice size).
    """

    def pair_batches(batches):
        import numpy as np
        import pyarrow as pa

        out_schema = pa.schema(
            [
                ("id_a", pa.int64()),
                ("id_b", pa.int64()),
                ("cosine", pa.float64()),
            ]
        )
        id_chunks, vec_chunks = [], []
        dim = None
        n_seen = 0
        for batch in batches:
            ids = np.asarray(batch.column(0), dtype=np.int64)
            vec_col_arr = batch.column(1)
            if ids.size:
                # round-12 (ADVICE): ListArray.flatten() silently DROPS
                # null entries, so a null/ragged embedding would
                # misalign the reshape (or mispair rows when sizes
                # happen to divide) — refuse loudly instead
                if vec_col_arr.null_count:
                    raise ValueError(
                        "pairwise_cosine_pairs: null embedding in batch"
                    )
                vals = np.asarray(vec_col_arr.flatten(), dtype=np.float64)
                if vals.size % ids.size:
                    raise ValueError(
                        "pairwise_cosine_pairs: ragged embeddings — "
                        f"{vals.size} values over {ids.size} rows"
                    )
                n_seen += ids.size
                # round-12 (VERDICT task 7): this operator is the
                # BOUNDED quadratic oracle twin — one task computes an
                # n x n matrix, which is only correct because callers
                # pass a documented small slice. Enforce the bound
                # instead of documenting it.
                if n_seen > max_rows:
                    raise ValueError(
                        f"pairwise_cosine_pairs: over {max_rows} rows in "
                        "one task — this is the bounded oracle twin; use "
                        "the LSH scale path for a real corpus"
                    )
                dim = vals.size // ids.size
                id_chunks.append(ids)
                vec_chunks.append(vals.reshape(ids.size, dim))
        if not id_chunks:
            return
        ids = np.concatenate(id_chunks)
        mat = np.concatenate(vec_chunks)
        order = np.argsort(ids, kind="stable")
        ids, mat = ids[order], mat[order]
        n = ids.size
        # norm: same left fold as functions.vectors.norm
        acc = np.zeros(n)
        for k in range(dim):
            acc = acc + mat[:, k] * mat[:, k]
        if np.any(acc == 0.0):
            raise ArithmeticError(
                "pairwise_cosine_pairs: zero-norm vector — cosine is "
                "undefined (ANSI DIVIDE_BY_ZERO parity with the join form)"
            )
        norms = np.sqrt(acc)
        cols = np.arange(n)
        for i0 in range(0, n, block):
            i1 = min(i0 + block, n)
            dots = np.zeros((i1 - i0, n))
            for k in range(dim):
                dots += mat[i0:i1, k, None] * mat[None, :, k]
            cos = dots / (norms[i0:i1, None] * norms[None, :])
            keep = (cols[None, :] > np.arange(i0, i1)[:, None]) & ~(
                cos < threshold
            )
            ii, jj = np.nonzero(keep)
            if ii.size:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(ids[i0 + ii]),
                        pa.array(ids[jj]),
                        pa.array(cos[ii, jj]),
                    ],
                    schema=out_schema,
                )

    src = corpus.select(
        F.col(id_col).cast("long").alias("id"), F.col(vec_col).alias("v")
    ).coalesce(1)
    return src.mapInArrow(
        pair_batches, "id_a long, id_b long, cosine double"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bits: int = 8,
    tables: int = 4,
    probes: int = 9,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH.

    ``tables`` independent hyperplane sets (the standard L-tables
    construction): a true neighbor only needs to collide in ONE table,
    so recall compounds as 1-(1-p)^L. Each query additionally probes
    its ``probes-1`` single-bit-flip buckets per table (multi-probe).
    Candidate volume ≈ corpus · tables · probes / 2^bits per query —
    the knob that trades recall for work at 100 TB.
    """
    from data_pipeline_001_spark.functions.vectors import random_projection_signature

    c_parts, q_parts = [], []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        sig = random_projection_signature(f"`{vec_col}`", planes)
        c_parts.append(
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("c_vec"),
                norm(F.col(vec_col)).alias("c_norm"),
                F.lit(t).alias("tbl"),
                sig.alias("bucket"),
            )
        )
        # two-step select: name the signature column FIRST, then build
        # the probe array from the named column — inlining `sig` into
        # every XOR probe copies the whole bits×dim expression tree
        # probes× per table and the analyzer pays for each copy
        probe_buckets = F.array(
            F.col("_sig"),
            *[
                F.col("_sig").bitwiseXOR(F.lit(1 << i))
                for i in range(min(probes - 1, bits))
            ],
        )
        q_parts.append(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("q_vec"),
                norm(F.col(vec_col)).alias("q_norm"),
                F.lit(t).alias("tbl"),
                sig.alias("_sig"),
            ).select(
                "query_id",
                "q_vec",
                "q_norm",
                "tbl",
                F.explode(probe_buckets).alias("bucket"),
            )
        )
    c = c_parts[0]
    for p in c_parts[1:]:
        c = c.unionByName(p)
    q = q_parts[0]
    for p in q_parts[1:]:
        q = q.unionByName(p)

    scored = (
        c.join(F.broadcast(q), ["tbl", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _cos_prenormed(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def embedding_near_dup_lsh(
    corpus: DataFrame,
    threshold: float = 0.4,
    bits: int | None = None,
    tables: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int = 500,
    target_bucket_size: int = 64,
) -> DataFrame:
    """Near-duplicate pairs (id_a, id_b, cosine >= threshold) via
    multi-table hyperplane-LSH bucketing + exact cosine verify — the
    100 TB-shaped primary for embedding near-dup (the exact O(n²)
    pairwise form is its small-sf oracle twin, `dedup_embedding_cosine`).

    Same verify pattern as MinHash-LSH text dedup
    (`operators/dedup.py:minhash_lsh_pairs`): candidates come from a
    per-(table, bucket) self-join — cost ≈ Σ bucket² bounded by
    ``max_bucket_size`` — then every candidate pair is scored exactly
    and thresholded, so precision is 1.0 and only recall is
    approximate. Recall per pair at angle θ is 1-(1-p^bits)^tables
    with p = 1-θ/π: more tables buy recall, more bits cut candidate
    volume. Oversized buckets (near-isotropic regions) are dropped
    before the join — a true near-dup pair collides in several tables,
    so a single dropped bucket rarely loses it.

    ``bits=None`` (the registered-query default) derives the bucket
    count from the corpus size so average bucket ≈
    ``target_bucket_size``: bits = log2(n / target). Fixed bits do NOT
    survive corpus growth — at 10× the data every bucket is 10× the
    rows, the Σ bucket² join turns quadratic, and once buckets blow
    past ``max_bucket_size`` they get dropped wholesale (recall
    collapse). Auto-bits keeps candidate volume ≈ n·target·tables/2 —
    linear in n — at the cost of per-table recall on low-cosine pairs;
    genuine near-dups (cosine ≥ ~0.8) keep multi-table recall high.
    The one extra count() job is a metadata-only scan on parquet.
    """
    import math

    from data_pipeline_001_spark.functions.vectors import random_projection_signature

    if bits is None:
        n = corpus.count()
        bits = max(4, min(16, math.ceil(math.log2(max(n, 2) / target_bucket_size))))

    # one small projection per table, unioned — NOT a single scan with
    # an exploded array of all tables' signatures: measured 4x slower
    # that way (16 tables x bits x 64-dim dot in one projection is a
    # giant expression tree that falls out of whole-stage codegen,
    # same pathology as unrolling the dot product)
    parts = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        sig = random_projection_signature(f"`{vec_col}`", planes)
        parts.append(
            corpus.select(
                F.col(id_col).alias("id"),
                F.lit(t).alias("tbl"),
                sig.alias("bucket"),
            )
        )
    banded = parts[0]
    for p in parts[1:]:
        banded = banded.unionByName(p)

    if max_bucket_size:
        wb = Window.partitionBy("tbl", "bucket")
        banded = (
            banded.withColumn("_bsz", F.count("*").over(wb))
            .where(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )

    # round-11 measured-and-kept: converting this window-cap +
    # self-join to the minhash-style collect_list + positional pair
    # expansion was a WASH here (16.0 vs 16.4 s best-of-3 at sf1) —
    # AQE ReusedExchange already dedups the banded derivation across
    # the two join sides at runtime, and with buckets capped at 500
    # the interpreted transform/slice pair expansion loses to the
    # codegen'd join on the ~6M pre-distinct candidates. The cost of
    # this operator is candidate VOLUME (tables × bucket²), a recall
    # parameter, not a plan defect.
    candidates = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.tbl") == F.col("r.tbl"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )

    vecs = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("n"),
    )
    cos = _cos_prenormed(F.col("va"), F.col("vb"), F.col("na"), F.col("nb"))
    return (
        candidates.join(
            vecs.select(
                F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
            ),
            "id_a",
        )
        .join(
            vecs.select(
                F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
            ),
            "id_b",
        )
        .where(cos >= threshold)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iters: int = 5,
    sample: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
):
    """Deterministic mini k-means on a driver-side sample → centroid
    list (the IVF coarse quantizer). The sample is bounded (``sample``
    rows) and taken in ``id_col`` order — a bare limit() is
    partition-layout-dependent and would make centroids differ between
    environments; Lloyd iterations run in NumPy on the driver. At
    100 TB the sample is still a tiny fixed-size sketch of the corpus
    — the centroids ship to executors as literals.
    """
    import numpy as np

    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1, norms)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=k, replace=len(mat) < k)]
    for _ in range(iters):
        sims = mat @ centroids.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                centroids[c] = v / (n if n else 1)
    return centroids.tolist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: assign corpus rows to their nearest
    centroid (inverted lists); each query scores only the rows in its
    ``nprobe`` nearest lists.

    The centroid id is the partition/join key — candidates per query ≈
    corpus · nprobe / n_centroids, and the corpus assignment is
    computed once and reusable across query batches (the classic IVF
    trade: one cheap coarse quantization pass buys a bounded fine
    search).
    """
    import numpy as np

    cents = kmeans_centroids(corpus, k=n_centroids, seed=seed, vec_col=vec_col)
    cmat = np.array(cents)

    def nearest_centroids(df: DataFrame, out_col: str, n: int) -> DataFrame:
        out_schema = f"{id_col} long, {out_col} array<int>"

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
                norms = np.linalg.norm(mat, axis=1, keepdims=True)
                mat = mat / np.where(norms == 0, 1, norms)
                sims = mat @ cmat.T
                top = np.argsort(-sims, axis=1)[:, :n].astype("int32")
                yield pd.DataFrame(
                    {id_col: pdf[id_col].to_numpy(), out_col: list(top)}
                )

        return df.select(id_col, vec_col).mapInPandas(assign, out_schema)

    c_assign = nearest_centroids(corpus, "lists", 1).select(
        F.col(id_col).alias("neighbor_id"), F.explode("lists").alias("list_id")
    )
    q_assign = nearest_centroids(queries, "probes", nprobe).select(
        F.col(id_col).alias("query_id"), F.explode("probes").alias("list_id")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    ).join(c_assign, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    ).join(q_assign, "query_id")
    scored = (
        c.join(F.broadcast(q), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(
                _cos_prenormed(
                    F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")
                ),
                6,
            ),
        )
        .select("query_id", "neighbor_id", "cosine")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def numpy_topk_batches(
    corpus: DataFrame,
    query_vectors: list[tuple[int, list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched exact top-k: per-partition NumPy matmul, then a
    global top-k reduction. ``query_vectors`` ship with the closure
    (broadcast by value) — the corpus never shuffles; only per-batch
    partial top-k rows (batches · queries · k) hit the final reduce.
    """
    import numpy as np

    qids = [q[0] for q in query_vectors]
    qmat = np.array([q[1] for q in query_vectors], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qmat = qmat / np.where(qnorm == 0, 1, qnorm)

    out_schema = "query_id long, neighbor_id long, cosine double"

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms == 0, 1, norms)
            sims = qmat @ mat.T  # queries × batch
            ids = pdf[id_col].to_numpy()
            rows = []
            for qi, qid in enumerate(qids):
                order = np.argsort(-sims[qi])[: k + 1]
                for j in order:
                    if ids[j] != qid:
                        rows.append((qid, int(ids[j]), float(sims[qi, j])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cosine"])

    partial = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )


def pq_train_codebooks(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 4,
    iters: int = 8,
    sample: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
):
    """Product-quantization codebooks (Jégou et al., TPAMI 2011): the
    (normalized) vector space is split into ``m`` subspaces and each
    gets its own 2^nbits-centroid k-means codebook, trained on a
    bounded driver-side sample — at 100 TB the sample is still a
    fixed-size sketch and the m×2^nbits×dsub codebook ships to
    executors as a broadcast literal. Returns a numpy array of shape
    (m, 2**nbits, dsub).

    The sample is the first ``sample`` rows BY ``id_col`` — a bare
    limit() is partition-layout-dependent, which would make codebooks
    (and every downstream PQ ranking) differ between environments.
    When the sample holds fewer than 2^nbits vectors, seeding falls
    back to choice-with-replacement (duplicate seeds collapse during
    Lloyd iterations; empty clusters keep their seed)."""
    import numpy as np

    rows = (
        corpus.select(id_col, vec_col).orderBy(id_col).limit(sample).collect()
    )
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    mat = mat / np.where(norms == 0, 1, norms)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub, ncodes = dim // m, 1 << nbits
    rng = np.random.RandomState(seed)
    books = np.empty((m, ncodes, dsub))
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        cent = sub[
            rng.choice(len(sub), size=ncodes, replace=len(sub) < ncodes)
        ].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ncodes):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code: array<smallint>) — each vector's m nearest-centroid
    subspace codes. This is the stored representation: m bytes instead
    of dim floats (32× smaller at dim=64/m=8), which is what makes a
    100 TB corpus scannable from memory. Arrow-batched mapInPandas."""
    import numpy as np

    books = np.asarray(codebooks)
    m, ncodes, dsub = books.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms == 0, 1, norms)
            codes = np.empty((len(mat), m), dtype="int16")
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d2 = ((sub[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "code": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        encode, "id long, code array<smallint>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    nbits: int = 4,
    rerank: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """PQ/ADC approximate top-k with exact rerank:

    1. train codebooks on a bounded sample (driver);
    2. encode the corpus to m-byte codes (mapInPandas — stored once,
       reused across query batches in production);
    3. ADC scan: each query precomputes an m×2^nbits lookup table of
       subspace inner products; a corpus code's approximate cosine is
       m LUT gathers + a sum — no float vector is touched. Each Arrow
       batch emits only its local top-(rerank·k) per query, so the
       shuffle carries candidates, not the corpus;
    4. exact rerank: the rerank·k survivors join back to their true
       vectors for exact cosine, then the final per-query top-k.

    Returns (query_id, neighbor_id, cosine, rn) — cosine is EXACT for
    returned rows (approximation only affects which rows survive to
    rerank, i.e. recall, tested against brute force)."""
    import numpy as np

    books = pq_train_codebooks(
        corpus, m=m, nbits=nbits, vec_col=vec_col, seed=seed
    )
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)

    q_rows = queries.select(id_col, vec_col).collect()  # bounded query batch
    qids = np.array([r[id_col] for r in q_rows])
    qmat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qnorms = np.linalg.norm(qmat, axis=1, keepdims=True)
    qmat = qmat / np.where(qnorms == 0, 1, qnorms)
    ncodes, dsub = books.shape[1], books.shape[2]
    # LUT[q, j, c] = <query_sub_j, codebook_j[c]>
    lut = np.einsum(
        "qjd,jcd->qjc", qmat.reshape(len(qmat), m, dsub), books
    )
    n_local = rerank * k

    def adc_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cmat = np.array(pdf["code"].tolist(), dtype=np.int64)  # B × m
            ids = pdf["id"].to_numpy()
            # approx[q, b] = Σ_j LUT[q, j, cmat[b, j]]
            approx = lut[:, np.arange(m)[None, :], cmat].sum(axis=2)
            top = min(n_local, approx.shape[1])
            idx = np.argpartition(-approx, top - 1, axis=1)[:, :top]
            out_q = np.repeat(qids, top)
            out_n = ids[idx].ravel()
            out_s = np.take_along_axis(approx, idx, axis=1).ravel()
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "adc": out_s}
            )

    cand = (
        codes.mapInPandas(
            adc_scan, "query_id long, neighbor_id long, adc double"
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("adc").desc(), F.col("neighbor_id").asc()
    )
    survivors = (
        cand.withColumn("rn", F.row_number().over(w_adc))
        .where(F.col("rn") <= n_local)
        .select("query_id", "neighbor_id")
    )
    vecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    qdf = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_norm"),
    )
    cos = _cos_prenormed(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        survivors.join(vecs, "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .withColumn("cosine", F.round(cos, 6))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine", "rn")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int | None = None,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_cluster_size: int = 2_000,
    target_cluster_size: int = 500,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space coarsely, then find
    near-duplicate groups by exact cosine WITHIN each cluster only and
    keep one representative per group.

    Scale shape — the cluster is what makes the quadratic tractable:
    pairwise comparison is confined to same-cluster (and same
    sub-bucket, below) rows, so candidate volume is Σ(cluster²)
    instead of corpus²; the cluster id is the shuffle key.
    ``n_clusters=None`` (the registered-query default) derives the
    cluster count from the corpus size so the average cluster ≈
    ``target_cluster_size`` rows — a FIXED count does not survive
    corpus growth (at 1000× the data every cluster is 1000× the rows
    and Σ cluster² turns quadratic; the first sweep of this operator
    at sf1 demonstrated exactly that and hung). Clusters still larger
    than ``max_cluster_size`` (dense regions) are subdivided by a hash
    of the id into ⌈size/max⌉ sub-buckets before pairing — the same
    bounded-bucket discipline as MinHash-LSH's bucket caps, trading a
    documented recall miss class (duplicates straddling a sub-bucket
    or cluster boundary — the paper's cluster-granularity knob) for a
    hard upper bound on any single task's work.

    Returns (vec_id, cluster_id, group_id, keep): ``group_id`` is the
    min id of the near-dup component (null when the row has no
    near-dup), ``keep`` marks the component's canonical survivor
    (min id — deterministic, unlike the paper's centroid-distance
    rule, so re-runs and engines agree).
    """
    import numpy as np

    from data_pipeline_001_spark.operators.dedup import connected_components

    if n_clusters is None:
        n = corpus.count()  # one cheap count job, driver-side scalar
        # ceiling 4096 = what the driver-side NumPy Lloyd loop trains
        # comfortably; a cluster deployment swaps kmeans_centroids for
        # a distributed trainer (the assignment map stays as-is) and
        # raises it — the sub-bucket cap below bounds the work either
        # way.
        n_clusters = max(8, min(4096, n // target_cluster_size))
    cents = kmeans_centroids(
        corpus,
        k=n_clusters,
        sample=max(2000, min(8 * n_clusters, 16384)),
        vec_col=vec_col,
        id_col=id_col,
        seed=seed,
    )
    cmat = np.array(cents)

    out_schema = f"{id_col} long, cluster_id int"

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms == 0, 1, norms)
            best = np.argmax(mat @ cmat.T, axis=1).astype("int32")
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cluster_id": best}
            )

    assigned = corpus.select(id_col, vec_col).mapInPandas(assign, out_schema)
    base = corpus.select(id_col, vec_col).join(assigned, id_col)

    # bounded sub-buckets inside oversized clusters (crc32 of the id —
    # deterministic and engine-independent)
    sizes = base.groupBy("cluster_id").agg(F.count("*").alias("_csz"))
    sub = F.when(
        F.col("_csz") > max_cluster_size,
        F.pmod(
            F.crc32(F.col(id_col).cast("string")),
            F.ceil(F.col("_csz") / F.lit(max_cluster_size)).cast("long"),
        ),
    ).otherwise(F.lit(0))
    # within-cluster exact cosine as a grouped BLAS matmul: the pair
    # volume is bounded (Σ bucket² with bucket ≤ max_cluster_size),
    # but evaluating a 64-term higher-order dot per PAIR runs
    # interpreted (HOFs sit outside whole-stage codegen) — the
    # earlier self-join shape spent its time there. Shipping each
    # ≤2k-row bucket through Arrow once and letting NumPy compute the
    # bucket's full similarity matrix is the shape SemDeDup itself
    # runs (per-cluster matmul); each task's work stays hard-bounded
    # by max_cluster_size² regardless of corpus size.
    #
    # Float-order note: BLAS accumulation order differs from a
    # sequential fold, so a pair within ~1 ulp of `threshold` could
    # classify differently than an expression dot would. The
    # CONTRACT this operator is gated on is invariant to that: the
    # planted-copy oracle checks identical vectors (cosine exactly
    # 1.0, margin 0.07 over the threshold), and same_component /
    # not_both_kept hold under any boundary-pair merge or split of
    # the surrounding component.
    grouped = base.join(F.broadcast(sizes), "cluster_id").select(
        id_col, "cluster_id", sub.cast("int").alias("_sub"), vec_col
    )

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        ids = pdf[id_col].to_numpy()
        mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        ia, ib = np.where(np.triu(mat @ mat.T >= threshold, k=1))
        a, b = ids[ia], ids[ib]
        return pd.DataFrame(
            {"id_a": np.minimum(a, b), "id_b": np.maximum(a, b)}
        )

    pairs = grouped.groupBy("cluster_id", "_sub").applyInPandas(
        bucket_pairs, "id_a long, id_b long"
    )
    comps = connected_components(pairs).select(
        F.col("doc_id").alias(id_col), F.col("cluster_id").alias("group_id")
    )
    return (
        assigned.join(comps, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            "group_id",
            (
                F.col("group_id").isNull()
                | (F.col("group_id") == F.col(id_col))
            ).alias("keep"),
        )
    )
