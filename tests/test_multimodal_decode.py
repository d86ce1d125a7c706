"""Real image decode tests — no codec library anywhere.

The PNG unfilter paths (filter types 0-4) are checked against an
INDEPENDENT forward-filter implementation written here in the test:
we filter known pixels per the PNG spec, deflate them into a handmade
IDAT, and assert the module's decoder recovers the original bytes.
BMP/PPM/PGM are built byte-by-byte from their specs.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mbai_gdb_spark.ops.multimodal import (
    _bmp_decode,
    _png_decode,
    _ppm_decode,
    byte_features,
    decode_image,
    decode_payload_bytes,
    encode_png,
    resize_image,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    body = typ + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def _png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Forward-filter ``pixels`` (h, w, ch) row-by-row per the PNG spec —
    deliberately a separate implementation from the decoder's unfilter."""
    h, w, ch = pixels.shape
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    for y, ft in zip(range(h), filters):
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        filtered = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = row[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filtered[i] = (row[i] - pred) & 0xFF
        raw.append(ft)
        raw.extend(int(v) for v in filtered)
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_encode_decode_roundtrip(channels):
    rng = np.random.default_rng(7 + channels)
    pixels = rng.integers(0, 256, size=(5, 4, channels), dtype=np.uint8)
    blob = encode_png(4, 5, channels, pixels.tobytes())
    w, h, ch, out = _png_decode(blob)
    assert (w, h, ch) == (4, 5, channels)
    assert out == pixels.tobytes()


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_unfilter_each_type(ft):
    rng = np.random.default_rng(ft)
    pixels = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    blob = _png_with_filters(pixels, [ft] * 6)
    w, h, ch, out = _png_decode(blob)
    assert (w, h, ch) == (5, 6, 3)
    assert out == pixels.tobytes()


def test_png_mixed_filters_per_row():
    rng = np.random.default_rng(42)
    pixels = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
    blob = _png_with_filters(pixels, [0, 1, 2, 3, 4])
    assert _png_decode(blob)[3] == pixels.tobytes()


def test_png_palette_expansion():
    # 2x2 indexed image over a 3-colour palette → RGB.
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w, h, ch, out = _png_decode(blob)
    assert (w, h, ch) == (2, 2, 3)
    assert out == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 0, 0])


def _bmp(pixels: np.ndarray) -> bytes:
    """24-bit bottom-up BMP with row padding, built from the spec."""
    h, w, _ = pixels.shape
    stride = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # RGB → BGR
        body.extend(row + b"\x00" * (stride - len(row)))
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return header + bytes(body)


def test_bmp_decode():
    rng = np.random.default_rng(3)
    pixels = rng.integers(0, 256, size=(3, 3, 3), dtype=np.uint8)  # odd width → padding
    w, h, ch, out = _bmp_decode(_bmp(pixels))
    assert (w, h, ch) == (3, 3, 3)
    assert out == pixels.tobytes()


def test_ppm_and_pgm_decode():
    pixels = bytes(range(2 * 2 * 3))
    blob = b"P6\n# a comment\n2 2\n255\n" + pixels
    assert _ppm_decode(blob) == (2, 2, 3, pixels)
    gray = bytes(range(6))
    assert _ppm_decode(b"P5 3 2 255\n" + gray) == (3, 2, 1, gray)


def test_decode_payload_dispatch_and_garbage():
    pixels = bytes(range(12))
    assert decode_payload_bytes(encode_png(2, 2, 3, pixels))[0] == "png"
    assert decode_payload_bytes(b"P6 2 2 255\n" + pixels)[0] == "ppm"
    assert decode_payload_bytes(b"absolutely not an image") is None
    assert decode_payload_bytes(b"") is None
    # Truncated PNG: valid signature, bogus body → None, not an exception.
    assert decode_payload_bytes(b"\x89PNG\r\n\x1a\n" + b"\x00" * 10) is None


def test_decode_image_stage_mixed_inputs(spark):
    rng = np.random.default_rng(11)
    png_px = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_png(6, 4, 3, png_px.tobytes()))),
        (2, bytearray(b"P5 2 3 255\n" + bytes(6))),
        (3, bytearray(b"garbage payload")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_image(df).collect()}
    assert (got[1].format, got[1].width, got[1].height, got[1].channels) == (
        "png", 6, 4, 3,
    )
    assert bytes(got[1].pixels) == png_px.tobytes()
    assert (got[2].format, got[2].width, got[2].height) == ("ppm", 2, 3)
    assert got[3].format is None and got[3].pixels is None
    assert got[4].format is None


def test_resize_nearest_neighbor_semantics(spark):
    # 2x2 quadrant image → 4x4: each quadrant becomes a 2x2 block.
    q = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], dtype=np.uint8
    )
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(2, 2, 3, q.tobytes())))], "doc_id long, payload binary"
    )
    out = decode_image(resize_image(df, 4, 4)).collect()[0]
    arr = np.frombuffer(bytes(out.pixels), dtype=np.uint8).reshape(4, 4, 3)
    expect = q.repeat(2, axis=0).repeat(2, axis=1)
    assert (arr == expect).all()
    # Downscale back to 2x2 recovers the original quadrants.
    down = decode_image(resize_image(df, 2, 2)).collect()[0]
    assert bytes(down.pixels) == q.tobytes()


def test_decoded_pixels_feed_feature_extractor(spark):
    """decode → pixels → byte_features → array<float> (ANN-ready)."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(8, 8, 3, px.tobytes())))], "doc_id long, payload binary"
    )
    decoded = decode_image(df).select("doc_id", "pixels")
    feats = byte_features(decoded, dim=16, payload_col="pixels").collect()
    assert len(feats) == 1 and len(feats[0].embedding) == 16


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        ch=st.integers(1, 4),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_roundtrip_property(w, h, ch, seed):
        """decode(encode(x)) == x for arbitrary small images."""
        rng = np.random.default_rng(seed)
        pixels = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
        got = _png_decode(encode_png(w, h, ch, pixels))
        assert got == (w, h, ch, pixels)

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.integers(2, 10),
        h=st.integers(2, 10),
        seed=st.integers(0, 2**31 - 1),
        filters=st.lists(st.integers(0, 4), min_size=10, max_size=10),
    )
    def test_png_unfilter_property(w, h, seed, filters):
        """Unfilter inverts an arbitrary per-row filter assignment
        produced by the independent forward-filter implementation."""
        rng = np.random.default_rng(seed)
        pixels = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = _png_with_filters(pixels, filters[:h])
        assert _png_decode(blob)[3] == pixels.tobytes()

except ImportError:  # hypothesis is in the container, but stay import-safe
    pass


def test_decode_image_works_under_structured_streaming(spark, tmp_path):
    """The decode stage is a plain mapInPandas, so it must run unchanged
    over a readStream relation — streaming multimodal ingestion."""
    rng = np.random.default_rng(21)
    rows = []
    for i in range(12):
        px = rng.integers(0, 256, size=(3 + i % 3, 4, 3), dtype=np.uint8)
        rows.append((i, bytearray(encode_png(4, 3 + i % 3, 3, px.tobytes()))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    src = str(tmp_path / "payloads")
    df.coalesce(2).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        decode_image(stream)
        .writeStream.format("memory")
        .queryName("decoded_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        r.doc_id: (r.format, r.width, r.height, bytes(r.pixels))
        for r in spark.table("decoded_stream").collect()
    }
    batch = {
        r.doc_id: (r.format, r.width, r.height, bytes(r.pixels))
        for r in decode_image(df).collect()
    }
    assert streamed == batch and len(streamed) == 12


def test_corrupt_past_magic_yields_none_not_exception():
    """Payloads that pass the magic check but are corrupt beyond it
    must decode to None — one broken file cannot kill a stage."""
    # valid signature + IHDR, corrupt IDAT deflate stream
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad_idat = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", b"\x00not deflate\xff")
        + _chunk(b"IEND", b"")
    )
    assert decode_payload_bytes(bad_idat) is None
    # truncated inside IHDR
    assert decode_payload_bytes(b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", b"\x00\x01")) is None
    # palette not a multiple of 3
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", b"\x01\x02\x03\x04")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x01\x00\x02\x00"))
        + _chunk(b"IEND", b"")
    )
    assert decode_payload_bytes(blob) is None
    # malformed PPM headers
    assert decode_payload_bytes(b"P6 10 10 ") is None
    assert decode_payload_bytes(b"P6 aa bb cc\n") is None
