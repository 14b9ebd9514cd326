"""Real pixel decoding (operators/multimodal.decode_pixels).

Every assertion is byte-exact against numpy ground truth: round-trips
through the three encoders, BMP's padding/row-direction traps, PNG's five
filter types (hand-built scanline stream, not our encoder), and the
quarantine path for undecodable payloads.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from youtube_etl_project_spark.operators import multimodal as mm


def _img(w: int, h: int, seed: int = 7) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("w,h", [(1, 1), (5, 3), (16, 8), (13, 7)])
def test_ppm_round_trip(w, h):
    img = _img(w, h)
    out = mm.decode_pixels(mm.encode_ppm(w, h, img.tobytes()))
    assert np.array_equal(out, img)


def test_ppm_with_comment_header():
    img = _img(4, 2)
    buf = b"P6\n# a comment\n4 2\n255\n" + img.tobytes()
    assert np.array_equal(mm.decode_pixels(buf), img)


@pytest.mark.parametrize("w,h", [(1, 1), (4, 4), (5, 3), (13, 7)])
def test_bmp_round_trip_includes_row_padding(w, h):
    # w=5,13 exercise non-zero 4-byte row padding; encoder writes
    # bottom-up BGR — decoder must undo both
    img = _img(w, h)
    out = mm.decode_pixels(mm.encode_bmp(w, h, img.tobytes()))
    assert np.array_equal(out, img)


def test_bmp_top_down_negative_height():
    img = _img(5, 3)
    buf = bytearray(mm.encode_bmp(5, 3, img.tobytes()))
    # flip to top-down: negate height, reverse stored row order
    stride = (5 * 3 + 3) & ~3
    off = struct.unpack("<I", bytes(buf[10:14]))[0]
    rows = [bytes(buf[off + i * stride : off + (i + 1) * stride]) for i in range(3)]
    buf[off:] = b"".join(reversed(rows))
    buf[22:26] = struct.pack("<i", -3)
    assert np.array_equal(mm.decode_pixels(bytes(buf)), img)


def test_png_round_trip():
    img = _img(16, 8)
    out = mm.decode_pixels(mm.encode_png(16, 8, img.tobytes()))
    assert np.array_equal(out, img)


def _png_from_scanlines(w, h, ctype, scan: bytes) -> bytes:
    def chunk(tag, data):
        raw = tag + data
        return struct.pack(">I", len(data)) + raw + struct.pack(
            ">I", zlib.crc32(raw) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_reconstruct():
    """Hand-filter each row with a different filter type (Sub/Up/Average/
    Paeth/None) and require exact reconstruction — the part a header-only
    parser can't fake."""
    img = _img(6, 5, seed=11)
    stride = 6 * 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    rows = img.reshape(5, stride).astype(np.int32)
    scan = bytearray()
    for y, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = rows[y]
        prev = rows[y - 1] if y else np.zeros(stride, np.int32)
        enc = np.zeros(stride, np.int32)
        for i in range(stride):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            pred = {0: 0, 1: a, 2: b, 3: (a + b) // 2, 4: paeth(a, b, c)}[ftype]
            enc[i] = (cur[i] - pred) % 256
        scan += bytes([ftype]) + bytes(enc.astype(np.uint8))
    out = mm.decode_pixels(_png_from_scanlines(6, 5, 2, bytes(scan)))
    assert np.array_equal(out, img)


def test_png_gray_and_rgba_normalize_to_rgb():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    scan = b"".join(b"\x00" + gray[y].tobytes() for y in range(3))
    out = mm.decode_pixels(_png_from_scanlines(4, 3, 0, scan))
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))

    rgba = _img(4, 3, seed=3)
    with_alpha = np.dstack([rgba, np.full((3, 4), 200, np.uint8)])
    scan = b"".join(b"\x00" + with_alpha[y].tobytes() for y in range(3))
    out = mm.decode_pixels(_png_from_scanlines(4, 3, 6, scan))
    assert np.array_equal(out, rgba)


def test_undecodable_payloads_return_none():
    assert mm.decode_pixels(b"") is None
    assert mm.decode_pixels(b"\xff\xd8\xff\xe0 jpeg-ish") is None
    assert mm.decode_pixels(b"P6\n4 2\n65535\n" + b"\x00" * 24) is None  # 16-bit
    assert mm.decode_pixels(b"BM" + b"\x00" * 60) is None  # bpp=0
    truncated_png = mm.encode_png(4, 2, _img(4, 2).tobytes())[:20]
    assert mm.decode_pixels(truncated_png) is None


def test_synthesized_images_decode_to_formula():
    """The registered query's contract: for every container rotation the
    decoded pixels equal the (id*31+i)%256 formula exactly."""
    for doc_id in range(9):
        w, h = 8 + doc_id % 7, 4 + doc_id % 5
        expect = np.array(
            [(doc_id * 31 + i) % 256 for i in range(w * h * 3)], np.uint8
        ).reshape(h, w, 3)
        out = mm.decode_pixels(mm.synthesize_image(doc_id))
        assert np.array_equal(out, expect), f"doc_id={doc_id}"


def test_pixel_stats_dataframe_path(spark):
    """End-to-end through the Arrow kernel: stats + canonical-array CRC32,
    and the quarantine row shape for a bad payload."""
    rows = [(i, mm.synthesize_image(i)) for i in range(4)] + [
        (99, b"not an image")
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in mm.pixel_stats(df).collect()}
    for i in range(4):
        w, h = 8 + i % 7, 4 + i % 5
        img = mm.decode_pixels(mm.synthesize_image(i))
        assert got[i]["fmt"] == ["ppm", "bmp", "png"][i % 3]
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        assert got[i]["pixel_crc32"] == zlib.crc32(img.tobytes()) & 0xFFFFFFFF
        assert got[i]["mean_r"] == round(float(img[:, :, 0].mean()), 6)
    assert got[99]["fmt"] == "unknown" and got[99]["width"] is None
