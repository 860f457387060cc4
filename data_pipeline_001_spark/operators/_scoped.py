"""Bounded-intermediate materialization with a session-bounded
lifetime (guide §5 "unpersist when done").

Round-11's aged-session finding: operator-level ``persist()`` entries
accumulate in the CacheManager for the SESSION lifetime — a 308-query
sweep measured up to 3.5x degradation on late queries purely from
cache pressure, because ``CacheManager`` holds a strong reference to
every cached relation until someone calls ``unpersist`` and the
operators return lazy frames, so no operator can safely unpersist
after "its" action (the action belongs to the caller).

``localCheckpoint(eager=False)`` gives the same one-materialization
semantics (the first action computes the subtree once; every later
reference reads the stored blocks) with the lifetime tied to the
DataFrame reference instead of the session: when the caller drops the
frame, the JVM GC + ContextCleaner release the blocks. That is how
pagerank's adjacency already works (round 11 measured persist vs
localCheckpoint equivalent there, 10.3 vs 10.1 s). Lazy (not eager)
so plan CONSTRUCTION stays job-free — the static plan gate explains
every registry query at sf1 and an eager checkpoint would execute the
subtree at sf1 sizes inside explain (the round-8 70-CPU-minute
pathology).

``USE_CHECKPOINT`` exists for the round-12 A/B harness
(tools/ab_cache_r12.py) to time both forms through the same code
path; production default is the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

USE_CHECKPOINT = True


def bounded_intermediate(df: DataFrame) -> DataFrame:
    """Materialize-once semantics for a bounded operator intermediate
    that several plan branches reference (per-doc signature tables,
    gram tables, oriented edge lists). See module docstring for why
    this is a local checkpoint rather than a persist."""
    if USE_CHECKPOINT:
        return df.localCheckpoint(eager=False)
    return df.persist(StorageLevel.MEMORY_AND_DISK)
