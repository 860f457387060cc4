"""Multimodal column plumbing (SURVEY.md §2.13).

Images/audio/video ride through the engine as opaque ``binary``
columns with typed metadata. The decode/feature steps that need
codec libraries (PIL, ffmpeg, torchaudio — not in this container) are
STUBBED behind ``decode_stub``; the Spark-side contract — schema,
Arrow batch shape, ``mapInPandas`` partitioning — is real and tested.

At 100 TB the pattern matters more than the codec: binary payloads
stay columnar (parquet binary + page-level compression), metadata
predicates prune before any decode, and decode parallelism equals
input partitions with no shuffle.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, media_type string, "
    "byte_len long, crc32 long, sha256 string"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test fixture builder: wrap each document's UTF-8 bytes as an
    opaque media payload with typed metadata (deterministic fake)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(payload).cast("long").alias("byte_len"),
        F.crc32(payload).alias("crc32"),
        F.sha2(payload, 256).alias("sha256"),
    )


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Placeholder for the real decoder (PIL / ffmpeg frame sampling).

    The container has no codec libraries; a real deployment swaps this
    single function. Raising keeps misuse loud."""
    raise NotImplementedError(
        "media decode requires codec libraries not present in this environment"
    )


def extract_features(media: DataFrame, use_decoder: bool = False) -> DataFrame:
    """``mapInPandas`` feature extraction over binary payloads.

    With ``use_decoder=False`` (default) computes deterministic
    byte-level features (entropy proxy via compression ratio, hashes)
    so the full Arrow round-trip of binary columns is exercised
    without codecs. ``use_decoder=True`` calls ``decode_stub`` and is
    expected to raise until a decoder is installed.
    """
    out_schema = (
        "media_id long, byte_len long, compressed_len long, "
        "compression_ratio double, head_hex string, sha256 string"
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r["payload"])
                if use_decoder:
                    decode_stub(raw, r["media_type"])
                comp = len(zlib.compress(raw, 6))
                rows.append(
                    (
                        int(r["media_id"]),
                        len(raw),
                        comp,
                        comp / max(len(raw), 1),
                        raw[:8].hex(),
                        hashlib.sha256(raw).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "byte_len",
                    "compressed_len",
                    "compression_ratio",
                    "head_hex",
                    "sha256",
                ],
            )

    return media.mapInPandas(featurize, out_schema)
