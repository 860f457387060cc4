"""Sequence packing: assign documents to fixed-token-budget packs
(context windows) for training-data assembly (§2.13 extension — no
reference analogue; the reference never parses payloads).

Distributed design: a driver-side greedy bin-pack over N documents
would serialize the whole corpus. Instead:

1. bucket documents by a salt of their key → each bucket is small and
   processed independently on an executor (``applyInPandas``);
2. inside a bucket, first-fit-decreasing over token counts — the
   classic 11/9·OPT + 1 bound applies per bucket;
3. pack ids are (bucket, local_pack) pairs, so ids are globally
   unique without any cross-partition coordination.

The trade-off vs a global FFD is slightly more slack per pack
(buckets can't share tails); at corpus scale that slack is bounded by
one document per bucket and the win is full parallelism — the same
bucket-local-then-merge posture the dedup/LSH operators use.

Token counts come in as a column (use text.token_count or the BPE-ish
regex counter) so packing composes with any tokenizer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("pack_id", T.StringType()),
        T.StructField("pack_slot", T.IntegerType()),
    ]
)


def pack_documents(
    docs: DataFrame,
    budget: int,
    key_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_buckets: int = 64,
) -> DataFrame:
    """Greedy first-fit-decreasing packing within hash buckets.

    Documents longer than ``budget`` get a singleton pack (callers
    truncate downstream; dropping silently would lose data). Returns
    one row per document with its pack assignment.
    """

    def pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(tokens_col, ascending=False).reset_index(drop=True)
        bucket = int(pdf["bucket"].iloc[0])
        packs: list[int] = []  # remaining capacity per open pack
        assign: list[int] = []
        slots: list[int] = []
        counts: list[int] = []  # docs per pack, for slot numbering
        for tok in pdf[tokens_col]:
            tok = int(tok)
            placed = False
            if tok <= budget:
                # first fit over open packs (FFD: input sorted desc)
                for i, cap in enumerate(packs):
                    if tok <= cap:
                        packs[i] = cap - tok
                        assign.append(i)
                        slots.append(counts[i])
                        counts[i] += 1
                        placed = True
                        break
            if not placed:
                # new pack (oversized docs get capacity 0 → singleton)
                packs.append(max(budget - tok, 0))
                counts.append(1)
                assign.append(len(packs) - 1)
                slots.append(0)
        pdf = pdf.assign(
            pack_id=[f"{bucket}-{a}" for a in assign], pack_slot=slots
        )
        return pdf[["doc_id", "n_tokens", "bucket", "pack_id", "pack_slot"]]

    bucketed = docs.select(
        F.col(key_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.crc32(F.col(key_col).cast("string")), F.lit(n_buckets))
        .cast("int")
        .alias("bucket"),
    )
    return bucketed.groupBy("bucket").applyInPandas(pack_bucket, PACK_SCHEMA)


def pack_utilization(packed: DataFrame, budget: int) -> DataFrame:
    """Pack-level audit: fill rate distribution (mean fill is the
    curation KPI — wasted budget = wasted training compute)."""
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens"),
        F.count("*").alias("n_docs"),
    )
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.round(F.avg(F.col("pack_tokens") / budget), 4).alias("mean_fill"),
        F.max("pack_tokens").alias("max_pack_tokens"),
        F.max("n_docs").alias("max_docs_per_pack"),
    )
