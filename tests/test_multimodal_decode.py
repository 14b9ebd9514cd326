"""Real-format decode kernel: genuine PNG/BMP/GIF/WAV files built
byte-by-byte (stdlib only) must decode to their true dimensions / frame
counts, end-to-end through the Arrow mapInPandas path."""

from __future__ import annotations

import io
import struct
import wave
import zlib

from youtube_etl_project_spark.operators import multimodal


def make_png(w: int, h: int) -> bytes:
    def chunk(tag: bytes, data: bytes) -> bytes:
        raw = tag + data
        return (
            struct.pack(">I", len(data))
            + raw
            + struct.pack(">I", zlib.crc32(raw) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    scanlines = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def make_bmp(w: int, h: int) -> bytes:
    row = (b"\x00\x00\xff" * w + b"\x00" * 3)[: (w * 3 + 3) & ~3]
    pixels = row * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 0, 0, 0, 0)
    return header + pixels


def make_gif(w: int, h: int, frames: int) -> bytes:
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80, 0, 0)
    out += b"\x00\x00\x00\xff\xff\xff"  # 2-entry global color table
    for _ in range(frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += b"\x02" + b"\x02\x4c\x01" + b"\x00"  # minimal LZW data
    return out + b"\x3b"


def make_wav(n_frames: int) -> bytes:
    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(2)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(b"\x00\x01\x02\x03" * n_frames)
    return bio.getvalue()


def test_kernel_parses_real_formats():
    assert multimodal._decode_image_bytes(make_png(640, 360)) == (640, 360, 1)
    assert multimodal._decode_image_bytes(make_bmp(17, 9)) == (17, 9, 1)
    assert multimodal._decode_image_bytes(make_gif(32, 16, 4)) == (32, 16, 4)
    w, h, n = multimodal._decode_image_bytes(make_wav(123))
    assert (w, h, n) == (0, 0, 123)


def test_kernel_falls_back_deterministically_on_unknown():
    jpegish = b"\xff\xd8\xff\xe0" + b"x" * 100
    out1 = multimodal._decode_image_bytes(jpegish)
    out2 = multimodal._decode_image_bytes(jpegish)
    assert out1 == out2
    assert all(v >= 1 for v in out1)


def test_decode_features_end_to_end_real_bytes(spark):
    rows = [
        (1, make_png(100, 50)),
        (2, make_bmp(8, 4)),
        (3, make_gif(20, 10, 3)),
        (4, make_wav(55)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, r.n_frames)
        for r in multimodal.decode_features(df).collect()
    }
    assert got == {
        1: (100, 50, 1),
        2: (8, 4, 1),
        3: (20, 10, 3),
        4: (0, 0, 55),
    }


# -- real PCM audio decode --------------------------------------------------

def test_wav_roundtrip_exact():
    import numpy as np

    from youtube_etl_project_spark.operators.multimodal import (
        decode_samples,
        encode_wav,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    rate, ch, arr = decode_samples(encode_wav(samples, sample_rate=16000))
    assert (rate, ch) == (16000, 1)
    assert arr.ravel().tolist() == samples
    assert arr.dtype == np.dtype("<i2") or arr.dtype == np.int16

    # stereo: frames x 2 shape, interleave preserved
    inter = [10, -10, 20, -20, 30, -30]
    rate2, ch2, arr2 = decode_samples(
        encode_wav(inter, sample_rate=8000, n_channels=2)
    )
    assert (rate2, ch2) == (8000, 2)
    assert arr2.shape == (3, 2)
    assert arr2[:, 0].tolist() == [10, 20, 30]
    assert arr2[:, 1].tolist() == [-10, -20, -30]


def test_wav_decode_rejects_non_pcm_and_garbage():
    from youtube_etl_project_spark.operators.multimodal import (
        decode_samples,
        encode_wav,
    )

    assert decode_samples(b"not a wav at all") is None
    # flip the audio-format tag to 2 (ADPCM) — compressed must quarantine
    buf = bytearray(encode_wav([1, 2, 3]))
    fmt_at = buf.find(b"fmt ") + 8
    buf[fmt_at : fmt_at + 2] = (2).to_bytes(2, "little")
    assert decode_samples(bytes(buf)) is None


def test_synth_audio_formula_matches_decode():
    from youtube_etl_project_spark.operators.multimodal import (
        decode_samples,
        synthesize_audio,
    )

    for doc_id in (0, 1, 57, 499):
        rate, ch, arr = decode_samples(synthesize_audio(doc_id))
        n = 200 + doc_id % 101
        assert (rate, ch, len(arr)) == (8000, 1, n)
        want = [((doc_id * 37 + i * 13) % 4096) - 2048 for i in range(n)]
        assert arr.ravel().tolist() == want


def test_video_frame_near_dup_classes(spark, sf_dir):
    """Round 11 frame-level video dedup: every duplicated-frame class
    spans >1 distinct video, class members share one exact ahash, the
    representative is the lowest (doc, frame) pair, and dedupe-before-
    decode holds — the Arrow kernel sees only DISTINCT frame keys."""
    from youtube_etl_project_spark.registry import load_all_plans

    rows = (
        load_all_plans()["multimodal_video_frame_near_dup"]
        .fn(spark, sf_dir)
        .collect()
    )
    assert rows
    for r in rows:
        assert r.n_docs > 1
        assert r.n_frames >= r.n_docs
        assert len(r.ahash) == 32 and set(r.ahash) <= {"0", "1"}
        assert 0 <= r.rep_frame < 30  # n_frames stub is <= 30
