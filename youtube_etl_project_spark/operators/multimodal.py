"""Multimodal column convention + Arrow-batched processing (SURVEY §2b X5).

Convention: an opaque ``payload binary`` column plus a typed ``meta`` struct
(kind/mime/n_bytes/checksum — schemas.MULTIMODAL_META_SCHEMA). Parquet
stores binaries natively; the metadata struct prunes independently, so
queries that never touch bytes never read them (column pruning does the
heavy lifting at 100 TB — a metadata-only scan reads ~1% of the data).

Decode / feature-extraction runs as Arrow-batched ``mapInPandas``.
``_decode_image_bytes`` REALLY parses the container formats whose layout
is pure structure — BMP, PNG, GIF (frame-counted by block walk), WAV —
with stdlib ``struct``/``wave`` only (tests/test_multimodal_decode.py
feeds it genuine files built byte-by-byte). Compressed codecs the
container has no libraries for (JPEG entropy decode, MP4/H.264) fall to a
deterministic fake derived from payload size, clearly marked; a real
deployment swaps only that fallback for PIL/ffmpeg.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "doc_id long, width int, height int, n_frames int"


def attach_payload(df: DataFrame, text_col: str, kind: str = "image") -> DataFrame:
    """Wrap a source column as the multimodal (payload, meta) pair. In a real
    ingest the payload bytes come from the object store; here the fixture
    text stands in as the byte source."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit(f"{kind}/fake").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.md5(payload).alias("checksum"),
        ),
    )


def _decode_image_bytes(buf: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from real container parsing where the
    format is structural, deterministic fake otherwise.

    * PNG  — IHDR width/height (bytes 16..24, big-endian).
    * BMP  — BITMAPINFOHEADER width/height (offset 18, little-endian;
             height may be negative = top-down → abs).
    * GIF  — logical-screen dims (offset 6, little-endian) + frame count
             by walking the block structure (image descriptors 0x2C,
             skipping extensions and sub-block chains) — animated GIFs
             report their true frame count.
    * WAV  — RIFF/WAVE: width/height 0, n_frames = sample frames from the
             fmt/data chunks (stdlib-grade parse, no audio lib).
    * anything else (JPEG/MP4/... — entropy-coded, needs PIL/ffmpeg which
      this container lacks) — deterministic fake from payload size, so
      pipelines and oracles stay testable; swap THIS branch in a real
      deployment.
    """
    if buf[:8] == b"\x89PNG\r\n\x1a\n" and len(buf) >= 24:
        w, h = struct.unpack(">II", buf[16:24])
        return int(w), int(h), 1
    if buf[:2] == b"BM" and len(buf) >= 26:
        w, h = struct.unpack("<ii", buf[18:26])
        return int(w), abs(int(h)), 1
    if buf[:6] in (b"GIF87a", b"GIF89a") and len(buf) >= 10:
        w, h = struct.unpack("<HH", buf[6:10])
        return int(w), int(h), _gif_frame_count(buf)
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return 0, 0, _wav_frame_count(buf)
    n = len(buf)
    return n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1


def _gif_frame_count(buf: bytes) -> int:
    """Count image descriptors by walking GIF blocks (real parse, not a
    0x2C byte scan — pixel data is sub-block framed, so scanning would
    over-count)."""
    i = 10
    # skip global color table if flagged
    packed = buf[10]
    i = 13 + (3 * (2 << (packed & 0x07)) if packed & 0x80 else 0)
    frames = 0
    n = len(buf)
    while i < n:
        b = buf[i]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            i += 2
            while i < n and buf[i] != 0:
                i += 1 + buf[i]
            i += 1
        elif b == 0x2C:  # image descriptor
            frames += 1
            if i + 10 > n:
                break
            lpacked = buf[i + 9]
            i += 10 + (3 * (2 << (lpacked & 0x07)) if lpacked & 0x80 else 0)
            i += 1  # LZW min code size
            while i < n and buf[i] != 0:
                i += 1 + buf[i]
            i += 1
        else:  # corrupt — stop at what we counted
            break
    return max(frames, 1)


def _wav_frame_count(buf: bytes) -> int:
    """Sample frames = data-chunk bytes / block align, from the RIFF chunk
    walk (the same arithmetic the stdlib ``wave`` module does)."""
    i, n = 12, len(buf)
    block_align, data_size = 0, 0
    while i + 8 <= n:
        cid = buf[i : i + 4]
        size = struct.unpack("<I", buf[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            block_align = struct.unpack("<H", buf[i + 20 : i + 22])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    return data_size // block_align if block_align else 0


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) → per-item
    measurements. Batches arrive as pandas DataFrames (vectorized transfer);
    per-item decode happens inside the batch loop — the correct shape for a
    CPU-bound decode at scale (repartition upstream to spread batches)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_image_bytes(b) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_frames": [d[2] for d in decoded],
                }
            )

    # Production note: with a real (CPU-bound) decoder, repartition first
    # (operators.dedup.spread) so batches spread across executors; for the
    # stub the extra payload shuffle costs more than the decode.
    return df.select(id_col, "payload").mapInPandas(batches, DECODE_SCHEMA)
