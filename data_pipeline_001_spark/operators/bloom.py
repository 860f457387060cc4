"""Broadcast Bloom-filter membership and incremental corpus dedup.

Scale posture (the whole point of the operator): admitting a new
batch against a 100 TB corpus must not shuffle the corpus.

* ``bloom_bits`` builds an m-bit Bloom filter over the corpus
  fingerprint column with per-partition NumPy bitmap partials
  (``mapInPandas``): each partition collapses to ONE ``m/8``-byte
  packed row, so the driver receives P bounded arrays (32 × 128 KB
  for m=1M bits) and ORs them — the same tree-aggregation shape as
  ``vector_stats.covariance_matrix``. The corpus is scanned, never
  shuffled.
* ``bloom_probe`` tests membership with the two xxhash64 hashes
  computed JVM-side and a vectorized Arrow-batched double-hash probe
  (Kirsch–Mitzenmacher: idx_i = h1 + i·h2 mod m) against the
  broadcast bit array.
* ``dedup_incremental_bloom`` composes them into the exact batch
  admission: bloom-negative rows are DEFINITELY new (no false
  negatives — admitted with zero joins); bloom-positive candidate
  fingerprints (a bounded, fpp-shrunk set) broadcast into a semi-join
  that extracts the verified corpus hits, and the batch anti-joins
  that small hit set. False positives cost one extra broadcast row,
  never correctness — the result is EXACTLY ``batch ∖ corpus`` and is
  oracle-checked against a DuckDB anti-join.

Behavior contract vs the reference's staged-dedup loads (
``pipeline_logic/transfer_logic.py``'s exists-check before insert):
same admit-if-absent semantics, re-expressed as a candidate-bounded
distributed plan instead of per-window DB probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

_SEED2 = 0x9E3779B9  # second-hash salt (golden-ratio constant)


def _check_m_bits(m_bits: int) -> None:
    """Fail fast on filter sizes the double-hash math cannot honor:
    ``(h1 + i*h2)`` wraps mod 2**64 BEFORE the ``% m_bits``, which is
    only distribution-exact when m_bits divides 2**64 (a power of
    two); and the packed array is ``m_bits // 8`` bytes, so a
    non-multiple-of-8 silently truncates and indexes past the array
    inside the executor. Raising here turns that executor-side
    IndexError into an immediate, explainable error."""
    if m_bits <= 0 or (m_bits & (m_bits - 1)) != 0 or m_bits % 8 != 0:
        raise ValueError(
            f"m_bits must be a power of two and a multiple of 8, "
            f"got {m_bits}"
        )


def _hash_cols(df: DataFrame, fp_col: str) -> DataFrame:
    """Two independent 64-bit hashes, computed JVM-side (codegen) so
    build and probe agree bit-for-bit."""
    return df.withColumn("_h1", F.xxhash64(F.col(fp_col))).withColumn(
        "_h2", F.xxhash64(F.col(fp_col), F.lit(_SEED2))
    )


def _indices(h1, h2, m_bits: int, k: int):
    """k double-hashed bit positions as a (n, k) uint64 array."""
    import numpy as np

    u1 = h1.to_numpy(dtype="int64").view("uint64")[:, None]
    u2 = h2.to_numpy(dtype="int64").view("uint64")[:, None]
    i = np.arange(k, dtype="uint64")[None, :]
    return (u1 + i * u2) % np.uint64(m_bits)


def bloom_bits(
    df: DataFrame, fp_col: str, m_bits: int = 1 << 20, k: int = 7
):
    """Build the packed Bloom bit array (NumPy uint8, length m/8) over
    ``df[fp_col]``. One scan, per-partition partials, driver OR of P
    bounded arrays (the only collect — P × m/8 bytes, documented)."""
    import numpy as np

    _check_m_bits(m_bits)
    hashed = _hash_cols(df, fp_col).select("_h1", "_h2")
    nbytes = m_bits // 8

    def build(batches):
        import numpy as np
        import pandas as pd

        bits = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            seen = True
            idx = _indices(pdf["_h1"], pdf["_h2"], m_bits, k).ravel()
            np.bitwise_or.at(
                bits, (idx >> np.uint64(3)).astype(np.int64),
                np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8),
            )
        if seen:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    partials = hashed.mapInPandas(build, schema="bits binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in partials:
        out |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


#: one Spark broadcast per distinct bit-array payload per SparkContext
#: (keyed by content digest): repeated bloom_probe calls against the
#: same filter must not leak a fresh executor-side copy each time
_BC_CACHE: dict = {}


def _broadcast_bits(spark, payload: bytes):
    import hashlib

    sc = spark.sparkContext
    # keyed by applicationId, not id(sc): CPython can reuse a dead
    # context's id, which would hand a probe a destroyed broadcast.
    # Entries from other (stopped) applications are evicted so the
    # module-level cache never pins a dead context's payloads alive.
    app_id = sc.applicationId
    for k in [k for k in _BC_CACHE if k[0] != app_id]:
        try:
            _BC_CACHE[k].destroy()
        except Exception:
            pass  # owning context already stopped
        del _BC_CACHE[k]
    key = (app_id, hashlib.md5(payload).hexdigest())
    bc = _BC_CACHE.get(key)
    if bc is None:
        bc = _BC_CACHE[key] = sc.broadcast(payload)
    return bc


def clear_broadcast_cache() -> None:
    """Release every cached bit-array broadcast (executor + driver
    copies). Safe to call between pipelines; in-flight lazy plans
    holding a cleared broadcast must not be re-executed afterwards."""
    for bc in _BC_CACHE.values():
        try:
            bc.unpersist(blocking=False)
            bc.destroy()
        except Exception:
            pass  # context already stopped
    _BC_CACHE.clear()


def bloom_probe(
    df: DataFrame,
    fp_col: str,
    bits,
    m_bits: int,
    k: int = 7,
    flag_col: str = "_maybe_in_corpus",
) -> DataFrame:
    """Add a boolean ``flag_col``: False ⇒ definitely absent from the
    set the filter was built over; True ⇒ candidate (verify exactly).
    The bit array ships to executors once via a Spark broadcast; the
    broadcast is cached per bit-array content (``_BC_CACHE``), so
    repeated probes against the same filter in one session reuse one
    executor-side copy instead of accumulating new broadcasts. The
    plan is lazy, so the broadcast cannot be destroyed here — call
    :func:`clear_broadcast_cache` after the last action against a
    filter to release executor memory."""
    _check_m_bits(m_bits)
    spark = df.sparkSession
    bc = _broadcast_bits(spark, bits.tobytes())

    @F.pandas_udf(BooleanType())
    def probe(h1, h2):
        import numpy as np
        import pandas as pd

        b = np.frombuffer(bc.value, dtype=np.uint8)
        idx = _indices(h1, h2, m_bits, k)
        hit = (
            b[(idx >> np.uint64(3)).astype(np.int64)]
            >> (idx & np.uint64(7)).astype(np.uint8)
        ) & np.uint8(1)
        return pd.Series(hit.all(axis=1))

    return (
        _hash_cols(df, fp_col)
        .withColumn(flag_col, probe("_h1", "_h2"))
        .drop("_h1", "_h2")
    )


def dedup_incremental_bloom(
    corpus: DataFrame,
    batch: DataFrame,
    fp_col: str,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """Exact ``batch ∖ corpus`` on ``fp_col`` without shuffling the
    corpus: corpus-Bloom → probe batch → broadcast the candidate
    fingerprints → semi-join extracts verified hits → batch anti-joins
    the (small) hit set. NULL fingerprints are admitted on both
    engines (no equality match). Rows of ``batch`` come back with
    their original columns."""
    bits = bloom_bits(corpus, fp_col, m_bits, k)
    probed = bloom_probe(batch, fp_col, bits, m_bits, k)
    cand_fps = (
        probed.where(F.col("_maybe_in_corpus"))
        .select(fp_col)
        .where(F.col(fp_col).isNotNull())
        .distinct()
    )
    hits = (
        corpus.join(F.broadcast(cand_fps), fp_col, "left_semi")
        .select(fp_col)
        .distinct()
    )
    return batch.join(F.broadcast(hits), fp_col, "left_anti")
