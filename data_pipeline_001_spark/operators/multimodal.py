"""Multimodal column plumbing (SURVEY.md §2.13).

Images/audio/video ride through the engine as opaque ``binary``
columns with typed metadata. Three real dependency-free decoders are
implemented by pure struct/zlib parsing — uncompressed 24-bit BMP
(pixel channel statistics), 8-bit truecolor PNG (zlib inflate +
filter-predictor reversal), and PCM WAV (format/duration/RMS) —
dispatched by ``decode_media``. Formats that need codec libraries
(JPEG, MP3, video — not in this container) still raise via
``decode_stub``; a real deployment swaps that one function.

At 100 TB the pattern matters more than the codec: binary payloads
stay columnar (parquet binary + page-level compression), metadata
predicates prune before any decode, and decode parallelism equals
input partitions with no shuffle.
"""

from __future__ import annotations

import hashlib
import math
import struct
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
    """Placeholder for codec-library decoders (PIL / ffmpeg frame
    sampling). BMP, PNG, and WAV decode natively via ``decode_media``;
    this raises for everything else so misuse stays loud."""
    raise NotImplementedError(
        f"decoding {media_type!r} requires codec libraries not present "
        "in this environment (BMP/PNG/WAV decode natively)"
    )


# -- deterministic media fixtures -------------------------------------
#
# Pixel/sample values are CLOSED-FORM functions of the id, so an
# independent engine can predict the decoded statistics analytically:
# pixel (x,y) of image d is (r,g,b) = (d%100 + x + y, 2d%100 + x,
# 3d%100 + y) — all < 256, no modulo wrap — giving
# mean_r = d%100 + (w-1)/2 + (h-1)/2 exactly (halves are exact
# doubles). That turns "did the decoder read the bytes right?" into a
# hash-checkable cross-engine oracle with no codec on the other side.


def make_bmp(doc_id: int, brightness: int = 0) -> bytes:
    """Uncompressed 24-bit bottom-up BMP, 4-byte row padding; size
    4–8 × 3–5 px derived from ``doc_id``. ``brightness`` adds a
    uniform offset to every channel (still < 256 for offsets ≤ 100):
    the classic exposure-shift near-duplicate, used to plant pairs
    that perceptual hashes must treat as identical."""
    w, h = 4 + doc_id % 5, 3 + doc_id % 3
    br = doc_id % 100 + brightness
    bg = (2 * doc_id) % 100 + brightness
    bb = (3 * doc_id) % 100 + brightness
    pad = (-3 * w) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # BMP stores rows bottom-up
        for x in range(w):
            body += bytes((bb + y, bg + x, br + x + y))  # BGR on disk
        body += b"\x00" * pad
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    off = 14 + 40
    return struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off) + info + bytes(body)


def make_wav(doc_id: int) -> bytes:
    """Mono 16-bit PCM WAV; rate/length/waveform derived from
    ``doc_id`` (integer sawtooth — deterministic across platforms)."""
    rate = 8000 + (doc_id % 3) * 4000
    n = 500 + doc_id % 250
    step = 1 + doc_id % 7
    samples = [((i * step) % 2048) - 1024 for i in range(n)]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG spec §9.4): pick whichever of left /
    up / upper-left is closest to a+b-c, ties resolving left→up→UL."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def make_png(doc_id: int, brightness: int = 0) -> bytes:
    """8-bit truecolor non-interlaced PNG of the SAME closed-form pixel
    field as ``make_bmp`` (pixel (x,y) = (d%100+x+y, 2d%100+x,
    3d%100+y), size 4–8 × 3–5), so the analytic channel-mean oracle is
    shared. Row y is filtered with predictor (doc_id + y) % 5 — across
    the corpus every PNG filter type (None/Sub/Up/Average/Paeth) is
    exercised, making a green decode a proof of all five reversals."""
    w, h = 4 + doc_id % 5, 3 + doc_id % 3
    br = doc_id % 100 + brightness
    bg = (2 * doc_id) % 100 + brightness
    bb = (3 * doc_id) % 100 + brightness
    rows = [
        bytes(v for x in range(w) for v in (br + x + y, bg + x, bb + y))
        for y in range(h)
    ]
    raw = bytearray()
    prior = bytes(3 * w)
    for y, cur in enumerate(rows):
        ft = (doc_id + y) % 5
        raw.append(ft)
        for i in range(3 * w):
            left = cur[i - 3] if i >= 3 else 0
            up = prior[i]
            ul = prior[i - 3] if i >= 3 else 0
            if ft == 0:
                v = cur[i]
            elif ft == 1:
                v = cur[i] - left
            elif ft == 2:
                v = cur[i] - up
            elif ft == 3:
                v = cur[i] - (left + up) // 2
            else:
                v = cur[i] - _paeth(left, up, ul)
            raw.append(v & 0xFF)
        prior = cur

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Decode an 8-bit truecolor (color type 2) non-interlaced PNG:
    chunk walk with per-chunk CRC verification, zlib inflate, per-row
    filter-predictor reversal (None/Sub/Up/Average/Paeth), per-channel
    pixel means. Pure zlib + struct — no codec library; the subset
    covers what the deterministic fixtures emit, and anything else
    (palette, alpha, 16-bit, interlaced) raises loudly."""
    if bytes(payload[:8]) != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w, h = 8, None, None
    idat = bytearray()
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = bytes(payload[pos + 4 : pos + 8])
        data = bytes(payload[pos + 8 : pos + 8 + ln])
        if len(data) != ln or pos + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + ln)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise NotImplementedError(
                    "only 8-bit truecolor non-interlaced PNG "
                    f"(depth={depth}, color_type={ctype}, "
                    f"interlace={interlace})"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    stride = 3 * w
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT stream is {len(raw)} bytes, expected {h * (stride + 1)}"
        )
    sr = sg = sb = 0
    prior = bytes(stride)
    at = 0
    for _y in range(h):
        ft = raw[at]
        line = bytearray(raw[at + 1 : at + 1 + stride])
        at += 1 + stride
        if ft == 1:  # Sub
            for i in range(3, stride):
                line[i] = (line[i] + line[i - 3]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prior[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                line[i] = (line[i] + (left + prior[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - 3] if i >= 3 else 0
                ul = prior[i - 3] if i >= 3 else 0
                line[i] = (line[i] + _paeth(left, prior[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        for x in range(w):
            sr += line[3 * x]
            sg += line[3 * x + 1]
            sb += line[3 * x + 2]
        prior = bytes(line)
    n = w * h
    return {
        "width": w,
        "height": h,
        "mean_r": sr / n,
        "mean_g": sg / n,
        "mean_b": sb / n,
    }


def decode_bmp(payload: bytes) -> dict:
    """Parse an uncompressed 24-bit BMP: dimensions + per-channel
    pixel means. Pure struct parsing — no codec library."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14
    )
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    sr = sg = sb = 0
    for row in range(h):
        base = off + row * stride
        for x in range(w):
            i = base + 3 * x
            sb += payload[i]
            sg += payload[i + 1]
            sr += payload[i + 2]
    n = w * h
    return {
        "width": w,
        "height": h,
        "mean_r": sr / n,
        "mean_g": sg / n,
        "mean_b": sb / n,
        "top_down": top_down,
    }


def decode_wav(payload: bytes) -> dict:
    """Walk RIFF chunks of a PCM WAV: format, duration, RMS
    amplitude. Pure struct parsing — no codec library."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError("only 16-bit PCM WAV")
    n = len(data) // block_align
    # round-11 (guide §4.2): the square sum runs vectorized in int64 —
    # EXACT integer arithmetic, so the value is bit-identical to the
    # former per-sample Python fold (samples ≤ 2^15, counts ≤ 2^32 →
    # no overflow); the python loop was ~35 µs per payload
    import numpy as np

    samples = np.frombuffer(
        data[: n * block_align][: n * channels * 2], dtype="<i2"
    ).astype(np.int64)
    total = int((samples * samples).sum())
    rms = math.sqrt(total / max(samples.size, 1))
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_samples": n,
        "duration_ms": n * 1000.0 / rate,
        "rms": rms,
    }


def decode_media(payload: bytes, media_type: str) -> dict:
    """Dispatch to the native decoder for the payload's type; raises
    ``NotImplementedError`` (via ``decode_stub``) for formats needing
    codec libraries."""
    if media_type == "image/bmp":
        return decode_bmp(payload)
    if media_type == "image/png":
        return decode_png(payload)
    if media_type in ("audio/wav", "audio/x-wav"):
        return decode_wav(payload)
    return decode_stub(payload, media_type)


def attach_media_fixtures(docs: DataFrame) -> DataFrame:
    """Deterministic BMP/WAV payloads per document (even ``doc_id`` →
    image, odd → audio), built executor-side in Arrow batches — the
    distributed binary-ingest shape with analytically predictable
    content."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # round-11 (guide §4.5): the fixtures are pure functions of a
        # small residue — make_bmp of doc_id % 300 (w,h,channels:
        # lcm(5,3,100)), make_wav of doc_id % 5250 (rate,len,step:
        # lcm(3,250,7)) — so each distinct payload is built ONCE per
        # task by the real builder and reused (bit-identical by
        # construction; per-task memo, not cross-run caching — the
        # decode side still walks every payload)
        bmp_cache, wav_cache = {}, {}
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads = []
            for d in ids:
                d = int(d)
                if d % 2 == 0:
                    key = d % 300
                    p = bmp_cache.get(key)
                    if p is None:
                        p = bmp_cache[key] = make_bmp(d)
                else:
                    key = d % 5250
                    p = wav_cache.get(key)
                    if p is None:
                        p = wav_cache[key] = make_wav(d)
                payloads.append(p)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload": payloads,
                    "media_type": [
                        "image/bmp" if d % 2 == 0 else "audio/wav"
                        for d in ids
                    ],
                }
            )

    src = docs.select("doc_id")
    # single-file parallelism guard (same as char_kgram_hashes): one
    # scan partition would serialize the build through one worker
    target = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(
        build, "media_id long, payload binary, media_type string"
    )


DECODED_SCHEMA = (
    "media_id long, media_type string, width long, height long, "
    "mean_r double, mean_g double, mean_b double, sample_rate long, "
    "n_samples long, duration_ms double, rms double"
)


def decode_features(media: DataFrame) -> DataFrame:
    """Real decode via ``mapInPandas``: one row per media item with
    modality-specific columns (NULL for the other modality). No
    shuffle — decode parallelism is the input partitioning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over columns, not iterrows(): ~100 µs/row of Series
            # construction for an operator whose decode is ~10 µs
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                d = decode_media(bytes(payload), mtype)
                rows.append(
                    (
                        int(mid),
                        mtype,
                        d.get("width"),
                        d.get("height"),
                        d.get("mean_r"),
                        d.get("mean_g"),
                        d.get("mean_b"),
                        d.get("sample_rate"),
                        d.get("n_samples"),
                        d.get("duration_ms"),
                        d.get("rms"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "width", "height",
                    "mean_r", "mean_g", "mean_b", "sample_rate",
                    "n_samples", "duration_ms", "rms",
                ],
            )

    return media.mapInPandas(run, DECODED_SCHEMA)


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


# -- resize / frame-sample (the remaining brief verbs) -----------------

def resize_bmp_nearest(payload: bytes, tw: int, th: int) -> dict:
    """Nearest-neighbor thumbnail of a 24-bit BMP: sample pixel
    (tx·w//tw, ty·h//th) per target cell — the standard integer NN
    mapping, so the result is an exact function of the source pixels
    (no interpolation arithmetic to drift cross-platform). Returns
    thumbnail dimensions and per-channel means over the sampled grid."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    _hs, w, h, _p, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    sr = sg = sb = 0
    for ty in range(th):
        sy = ty * h // th
        # logical row sy lives at file row h-1-sy in the (default)
        # bottom-up layout — decode_bmp's whole-image means are
        # orientation-blind, but a SAMPLER must flip
        file_row = sy if top_down else h - 1 - sy
        base = off + file_row * stride
        for tx in range(tw):
            i = base + 3 * (tx * w // tw)
            sb += payload[i]
            sg += payload[i + 1]
            sr += payload[i + 2]
    n = tw * th
    return {
        "thumb_w": tw,
        "thumb_h": th,
        "thumb_mean_r": sr / n,
        "thumb_mean_g": sg / n,
        "thumb_mean_b": sb / n,
    }


def wav_frame_energy(payload: bytes, frame_samples: int = 100) -> dict:
    """Frame-sampled audio features: split the PCM stream into
    fixed-length frames (last frame ragged) and compute per-frame RMS
    energy — the audio analogue of video frame sampling. Returns the
    frame count plus max/mean frame RMS."""
    meta = decode_wav(payload)
    n, rate = meta["n_samples"], meta["sample_rate"]
    data_off = None  # re-walk chunks for the sample data
    pos = 12
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            data_off = (pos + 8, size)
        pos += 8 + size + (size & 1)
    start, size = data_off
    # round-11: per-frame square sums vectorized in exact int64 (same
    # bit-identity argument as decode_wav), then the max/mean folds
    # run over the same python float list as before
    import numpy as np

    samples = np.frombuffer(
        payload[start : start + size // 2 * 2], dtype="<i2"
    ).astype(np.int64)
    n_full = samples.size // frame_samples
    sq = samples * samples
    sums = []
    if n_full:
        sums.extend(
            sq[: n_full * frame_samples]
            .reshape(n_full, frame_samples)
            .sum(axis=1)
            .tolist()
        )
    tail = samples.size - n_full * frame_samples
    if tail:
        sums.append(int(sq[n_full * frame_samples :].sum()))
    lens = [frame_samples] * n_full + ([tail] if tail else [])
    rms = [math.sqrt(s / ln) for s, ln in zip(sums, lens)]
    return {
        "n_frames": len(rms),
        "frame_samples": frame_samples,
        # a valid WAV with an empty data chunk has no frames: report
        # NULL energies rather than crashing the whole Arrow batch
        "max_frame_rms": max(rms) if rms else None,
        "mean_frame_rms": sum(rms) / len(rms) if rms else None,
        "duration_ms": meta["duration_ms"],
    }


SAMPLED_SCHEMA = (
    "media_id long, media_type string, thumb_w long, thumb_h long, "
    "thumb_mean_r double, thumb_mean_g double, thumb_mean_b double, "
    "n_frames long, frame_samples long, max_frame_rms double, "
    "mean_frame_rms double"
)


def sampled_features(
    media: DataFrame, tw: int = 2, th: int = 2, frame_samples: int = 100
) -> DataFrame:
    """Resize/frame-sample over binary payloads via ``mapInPandas`` —
    same no-shuffle decode shape as ``decode_features``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, mt in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                raw = bytes(payload)
                # same dispatch contract as decode_media: unsupported
                # types raise the documented NotImplementedError, not
                # a misleading parse error from the wrong decoder
                if mt == "image/bmp":
                    d = resize_bmp_nearest(raw, tw, th)
                elif mt in ("audio/wav", "audio/x-wav"):
                    d = wav_frame_energy(raw, frame_samples)
                else:
                    decode_stub(raw, mt)
                rows.append(
                    (
                        int(mid), mt,
                        d.get("thumb_w"), d.get("thumb_h"),
                        d.get("thumb_mean_r"), d.get("thumb_mean_g"),
                        d.get("thumb_mean_b"), d.get("n_frames"),
                        d.get("frame_samples"), d.get("max_frame_rms"),
                        d.get("mean_frame_rms"),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "thumb_w", "thumb_h",
                    "thumb_mean_r", "thumb_mean_g", "thumb_mean_b",
                    "n_frames", "frame_samples", "max_frame_rms",
                    "mean_frame_rms",
                ],
            )

    return media.mapInPandas(run, SAMPLED_SCHEMA)


# -- perceptual hashing (image near-dup over the binary column) --------


def _bmp_gray_grid(payload: bytes):
    """(h, w) int32 array of per-pixel channel sums (r+g+b) in
    top-down logical order — the integer 'grayscale' perceptual
    hashes operate on (sum instead of mean: monotone-equivalent,
    no division, exactly brightness-shift-covariant)."""
    import numpy as np

    if bytes(payload[:2]) != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    _hs, w, h, _p, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP")
    top_down = h < 0
    h = abs(h)
    stride = (3 * w + 3) // 4 * 4
    rows = (
        np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=off)
        .reshape(h, stride)[:, : 3 * w]
        .reshape(h, w, 3)
        .astype(np.int32)
        .sum(axis=2)
    )
    return rows if top_down else rows[::-1]


def _nn_resize(grid, th: int, tw: int):
    """Integer nearest-neighbor resample (source index ti*src//tgt —
    identical mapping to ``resize_bmp_nearest``)."""
    import numpy as np

    h, w = grid.shape
    ys = (np.arange(th) * h) // th
    xs = (np.arange(tw) * w) // tw
    return grid[np.ix_(ys, xs)]


def _pack_bits(flat_bool) -> int:
    """64 bools (MSB first) → signed int64 (bit 63 wraps negative)."""
    import numpy as np

    v = np.uint64(0)
    for b in flat_bool:
        v = np.uint64(v << np.uint64(1)) | np.uint64(bool(b))
    return int(np.int64(v))


def ahash64(payload: bytes) -> int:
    """Average hash: 8×8 NN-resampled gray cells, bit = cell > mean.
    Exactly invariant under uniform brightness shifts (mean shifts
    with the cells)."""
    cells = _nn_resize(_bmp_gray_grid(payload), 8, 8)
    return _pack_bits((cells > cells.mean()).ravel())


def dhash64(payload: bytes) -> int:
    """Difference hash: 8 rows × 9 cols NN-resampled, bit = right
    neighbor > left. Brightness-shift invariant (differences cancel
    the offset)."""
    cells = _nn_resize(_bmp_gray_grid(payload), 8, 9)
    return _pack_bits((cells[:, 1:] > cells[:, :-1]).ravel())


def bmp_perceptual_hashes(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """(id, ahash, dhash) via ``mapInPandas`` NumPy decode — no
    shuffle; hash parallelism is the input partitioning."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "ahash": [
                        ahash64(bytes(p)) for p in pdf[payload_col]
                    ],
                    "dhash": [
                        dhash64(bytes(p)) for p in pdf[payload_col]
                    ],
                }
            )

    return media.mapInPandas(
        run, "media_id long, ahash long, dhash long"
    )


def phash_near_dup_pairs(
    hashes: DataFrame,
    hash_col: str = "dhash",
    max_hamming: int = 3,
    band_bits: int = 16,
    max_bucket_size: int = 500,
) -> DataFrame:
    """(id_a, id_b, hamming ≤ max_hamming) via banded exact-match
    buckets — the SimHash rotation trick
    (``operators/dedup.py:simhash_near_duplicates``) applied to a
    perceptual hash: 4 × 16-bit bands of the 64-bit hash; by
    pigeonhole any pair within Hamming ≤ 3 agrees exactly on at
    least one band, so candidates come from per-(band, key)
    self-joins (Σ bucket², skew-capped) and are then verified with
    ``bit_count(xor)`` — precision 1.0, NEVER an all-pairs product.
    Oversized buckets (degenerate hash collisions) are dropped, the
    same cap discipline as every other LSH path here."""
    from pyspark.sql import Window

    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    banded = hashes.select(
        F.col("media_id").alias("id"),
        F.col(hash_col).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(hash_col, i * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")
    if max_bucket_size:
        wb = Window.partitionBy("band", "key")
        banded = (
            banded.withColumn("_bsz", F.count("*").over(wb))
            .where(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .distinct()
        .where(ham <= max_hamming)
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
    )


# ---------------------------------------------------------------------
# Spectral analysis over the audio column (round-6 extension)
# ---------------------------------------------------------------------


def make_tone_wav(doc_id: int) -> bytes:
    """Mono 16-bit PCM WAV carrying ONE quantized sine placed exactly
    at DFT bin k = 3 + doc_id % 40 of a 512-sample window (amplitude
    12000 ≫ the ±0.5 quantization noise, which spreads ~white across
    bins). Because the tone is bin-aligned, the window's DFT magnitude
    peaks at k with no leakage — the dominant bin is a closed-form
    function of ``doc_id`` the SQL oracle predicts without any signal
    processing on its side."""
    rate = 8000 + (doc_id % 3) * 4000
    n = 512
    k = 3 + doc_id % 40
    samples = [
        int(round(12000.0 * math.sin(2.0 * math.pi * k * i / n)))
        for i in range(n)
    ]
    data = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _wav_pcm(payload: bytes):
    """(sample_rate, samples) of a mono 16-bit PCM WAV — the chunk
    walk of ``decode_wav`` returning the raw samples."""
    meta = decode_wav(payload)
    pos, data = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("no data chunk")
    n = len(data) // 2
    return meta["sample_rate"], struct.unpack(f"<{n}h", data[: n * 2])


def wav_spectrum(payload: bytes) -> dict:
    """Frequency-domain features of a PCM WAV: dominant non-DC DFT bin
    (NumPy rfft — vectorized, no codec library), its frequency in Hz,
    and the magnitude-weighted spectral centroid. ``dominant_hz`` is
    bin·rate/n — with n a power of two the division is exact in
    float64, so the value is bit-identical to the oracle's closed
    form."""
    import numpy as np

    rate, samples = _wav_pcm(payload)
    n = len(samples)
    x = np.asarray(samples, dtype=np.float64)
    mag = np.abs(np.fft.rfft(x))
    # skip DC: bin 0 carries the (tiny) quantization-offset sum
    k = int(np.argmax(mag[1:])) + 1
    freqs = np.arange(1, mag.shape[0]) * (rate / n)
    msum = float(mag[1:].sum())
    centroid = float((mag[1:] * freqs).sum() / msum) if msum > 0 else None
    return {
        "sample_rate": rate,
        "n_samples": n,
        "dominant_bin": k,
        "dominant_hz": k * rate / n,
        "spectral_centroid_hz": centroid,
    }


SPECTRUM_SCHEMA = (
    "media_id long, sample_rate long, n_samples long, "
    "dominant_bin long, dominant_hz double, spectral_centroid_hz double"
)


def spectral_features(media: DataFrame) -> DataFrame:
    """Distributed spectral decode: ``mapInPandas`` over binary WAV
    payloads, no shuffle (decode parallelism = input partitions), same
    scale posture as ``decode_features``.

    Round-11 (guide §4.2): the RIFF walk stays per row (it IS the
    decode under test), but everything bulk is batched — samples come
    out via ``np.frombuffer`` instead of ``struct.unpack`` per short,
    equal-shape rows are stacked and rfft'd as ONE matrix per
    (n, rate) group, and argmax/centroid run vectorized over the
    group. Per-row values are bit-identical to the scalar
    ``wav_spectrum`` (pocketfft transforms rows independently; the
    axis reduction is the same pairwise sum as the 1D form), pinned by
    `tests/test_er_wave.py::test_spectral_features_batched_matches_scalar`.
    The former shape called one Python rfft + built one dict per ROW
    (~320 µs/row); end-to-end query measured 11.7 → 1.0 s at sf1."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["media_id"].to_numpy()
            m = len(ids)
            rates = np.empty(m, dtype=np.int64)
            waves = []
            for j, payload in enumerate(pdf["payload"]):
                p = bytes(payload)
                meta = decode_wav(p)
                pos, data = 12, None
                while pos + 8 <= len(p):
                    cid = p[pos : pos + 4]
                    size = struct.unpack_from("<I", p, pos + 4)[0]
                    if cid == b"data":
                        data = p[pos + 8 : pos + 8 + size]
                    pos += 8 + size + (size & 1)
                if data is None:
                    raise ValueError("no data chunk")
                n = len(data) // 2
                rates[j] = meta["sample_rate"]
                waves.append(
                    np.frombuffer(data[: n * 2], dtype="<i2")
                )
            lens = np.array([w.size for w in waves], dtype=np.int64)
            dom_bin = np.zeros(m, dtype=np.int64)
            dom_hz = np.zeros(m, dtype=np.float64)
            centroid = np.full(m, np.nan)
            for n in np.unique(lens):
                sel = np.nonzero(lens == n)[0]
                x = np.stack([waves[j] for j in sel]).astype(np.float64)
                mag = np.abs(np.fft.rfft(x, axis=1))
                k = np.argmax(mag[:, 1:], axis=1) + 1
                dom_bin[sel] = k
                dom_hz[sel] = k * rates[sel] / int(n)
                msum = mag[:, 1:].sum(axis=1)
                for rate in np.unique(rates[sel]):
                    rsel = np.nonzero(rates[sel] == rate)[0]
                    freqs = np.arange(1, mag.shape[1]) * (int(rate) / int(n))
                    num = (mag[rsel, 1:] * freqs).sum(axis=1)
                    ok = msum[rsel] > 0
                    centroid[sel[rsel[ok]]] = num[ok] / msum[rsel][ok]
            yield pd.DataFrame(
                {
                    "media_id": ids.astype(np.int64),
                    "sample_rate": rates,
                    "n_samples": lens,
                    "dominant_bin": dom_bin,
                    "dominant_hz": dom_hz,
                    "spectral_centroid_hz": centroid,
                }
            )

    return media.mapInPandas(run, SPECTRUM_SCHEMA)


# ---------------------------------------------------------------------
# Video: multi-frame container + stride frame sampling (round-6)
# ---------------------------------------------------------------------

MBMP_MAGIC = b"MBMP"


def make_mbmp(doc_id: int) -> bytes:
    """Deterministic multi-frame video fixture: ``MBMP`` magic +
    uint32 frame count + per-frame (uint32 size, BMP payload). Frame f
    is ``make_bmp(doc_id, brightness=(f*11) % 50)`` — a slow exposure
    ramp, so every sampled frame's channel means have the same closed
    form the BMP decode oracle uses, shifted by the frame's
    brightness. Frame count is 6 + doc_id % 5."""
    n = 6 + doc_id % 5
    out = bytearray(MBMP_MAGIC)
    out += struct.pack("<I", n)
    for f in range(n):
        frame = make_bmp(doc_id, brightness=(f * 11) % 50)
        out += struct.pack("<I", len(frame))
        out += frame
    return bytes(out)


def mbmp_frame_features(payload: bytes, stride: int = 3) -> list[dict]:
    """Parse the MBMP container and decode every ``stride``-th frame
    (the FRAME-SAMPLE verb for video: decoding every frame of a 100 TB
    video corpus is pointless and the sampled subset is the standard
    input to dedup/quality models). Returns one dict per sampled
    frame: frame index, dimensions, channel means."""
    if payload[:4] != MBMP_MAGIC:
        raise ValueError("not an MBMP payload")
    (n,) = struct.unpack_from("<I", payload, 4)
    pos = 8
    out = []
    for f in range(n):
        (size,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        if f % stride == 0:
            d = decode_bmp(payload[pos:pos + size])
            out.append(
                {
                    "n_frames": n,
                    "frame_idx": f,
                    "width": d["width"],
                    "height": d["height"],
                    "mean_r": d["mean_r"],
                    "mean_g": d["mean_g"],
                    "mean_b": d["mean_b"],
                }
            )
        pos += size
    return out


VIDEO_FRAME_SCHEMA = (
    "media_id long, n_frames int, frame_idx int, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def video_frame_features(docs: DataFrame, stride: int = 3) -> DataFrame:
    """Distributed video frame sampling: build the deterministic MBMP
    payload per document and emit one row per sampled frame, all
    inside ``mapInPandas`` Arrow batches (payloads never cross the
    shuffle; output rows scale with sampled frames, not frames).
    Same scale posture as ``decode_features``: decode parallelism =
    input partitions, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "media_id", "n_frames", "frame_idx", "width", "height",
            "mean_r", "mean_g", "mean_b",
        ]
        # round-11: the MBMP container is a pure function of
        # doc_id % 300 (frame count: %5; per-frame BMP: %300) — memo
        # per task, payloads still built by the real make_mbmp; every
        # payload is still container-walked and frame-decoded below
        cache = {}
        for pdf in batches:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                key = did % 300
                payload = cache.get(key)
                if payload is None:
                    payload = cache[key] = make_mbmp(did)
                for row in mbmp_frame_features(payload, stride):
                    out.append({"media_id": did, **row})
            yield pd.DataFrame(out, columns=cols)

    src = docs.select("doc_id")
    target = docs.sparkSession.sparkContext.defaultParallelism
    if src.rdd.getNumPartitions() < target:
        src = src.repartition(target)
    return src.mapInPandas(run, VIDEO_FRAME_SCHEMA)
