"""Hardening regression tests for the codec-free decode paths: the
three round-3 advisory findings.

1. Zero-dimension containers (PNG IHDR w/h = 0, ``P6 0 0 255``) used to
   decode to empty pixel buffers and then IndexError inside
   :func:`resize_image`'s numpy resample — killing the whole
   mapInPandas stage, contrary to the module's one-broken-file-cannot-
   kill-a-stage contract.  They must map to NULL.
2. The IDAT inflate was unbounded, so a small crafted payload could
   balloon to gigabytes before the length check ran (decompression
   bomb).  Inflate is now capped at the header-declared size.
3. ``audio_stats``'s order-weighted sum wrapped silently in int64 for
   clips past ~2^24 samples; it now switches to exact Python ints and
   NULLs values the int64 column cannot hold.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from mbai_gdb_spark.ops.multimodal import (
    _weighted_sum,
    decode_payload_bytes,
    encode_png,
    resize_image,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    body = typ + data
    return struct.pack(">I", len(data)) + body + struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )


def _png_raw(w: int, h: int, idat_plain: bytes) -> bytes:
    """Hand-build an RGB8 PNG with arbitrary (pre-compression) IDAT."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(idat_plain))
        + _chunk(b"IEND", b"")
    )


def test_zero_dim_png_rejected():
    assert decode_payload_bytes(_png_raw(0, 0, b"")) is None
    assert decode_payload_bytes(_png_raw(0, 4, b"\x00" * 4)) is None
    assert decode_payload_bytes(_png_raw(4, 0, b"")) is None


def test_zero_dim_ppm_rejected():
    assert decode_payload_bytes(b"P6 0 0 255\n") is None
    assert decode_payload_bytes(b"P5 0 5 255\n" + b"\x00" * 8) is None
    # sanity: a real 1x1 P6 still decodes
    assert decode_payload_bytes(b"P6 1 1 255\n\x01\x02\x03") == (
        "ppm", 1, 1, 3, b"\x01\x02\x03",
    )


def test_png_decompression_bomb_rejected():
    # 2x2 RGB declares 14 raw bytes; the IDAT inflates to 50 MB.  The
    # bounded inflate must stop at expected+1 bytes and reject, without
    # materializing the 50 MB.
    bomb = _png_raw(2, 2, b"\x00" * (50 * 1024 * 1024))
    assert decode_payload_bytes(bomb) is None


def test_png_overlong_idat_rejected_exact_length_accepted():
    rows = b"".join(b"\x00" + bytes(6) for _ in range(2))  # 2x2 RGB, filter 0
    assert decode_payload_bytes(_png_raw(2, 2, rows)) is not None
    assert decode_payload_bytes(_png_raw(2, 2, rows + b"\x00")) is None


def test_png_huge_declared_dims_rejected_cheaply():
    # Header declares ~17 GB of raw rows; must reject before allocating.
    assert decode_payload_bytes(_png_raw(65535, 65535, b"")) is None


def test_resize_survives_zero_dim_payload(spark):
    """The ADVICE repro: a zero-dim PNG in a resize batch killed the
    stage with IndexError.  Now: NULL for that row, others unaffected."""
    good = encode_png(2, 2, 3, bytes(range(12)))
    rows = [
        (1, bytearray(good)),
        (2, bytearray(_png_raw(0, 0, b""))),
        (3, bytearray(b"P6 0 0 255\n")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r.payload for r in resize_image(df, 4, 4).collect()}
    assert got[1] is not None and decode_payload_bytes(bytes(got[1]))[1:3] == (4, 4)
    assert got[2] is None
    assert got[3] is None


def test_weighted_sum_fallback_matches_vectorized_path():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32768, size=1000).astype(np.int64)
    fast = _weighted_sum(s)  # vectorized int64 path
    exact = _weighted_sum(s, int64_safe_size=1)  # forced Python-int path
    assert fast == exact == sum(int(v) * (i + 1) for i, v in enumerate(s))


def test_weighted_sum_overflow_yields_null_not_wraparound():
    # 3 samples crafted so the true weighted sum exceeds int64: use the
    # forced-fallback path with values outside PCM16 range to keep the
    # test tiny (the guard is on the RESULT, not the sample width).
    s = np.array([2**62, 2**62, 2**62], dtype=object)

    class _Arr:
        size = 3

        @staticmethod
        def tolist():
            return list(s)

    assert _weighted_sum(_Arr, int64_safe_size=1) is None
