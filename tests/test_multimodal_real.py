"""Multimodal plumbing tests: real container-header parsing (PNG / GIF /
JPEG built byte-by-byte — no codec involved), frame-sampling fan-out,
and the binary → feature → ANN integration."""

from __future__ import annotations

import struct
import zlib

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.multimodal import (
    byte_features,
    image_header_metadata,
    resize_image,
    sample_frames,
)


def _png(w: int, h: int) -> bytes:
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def test_image_header_parsing_real_formats(spark):
    rows = [
        (1, bytearray(_png(640, 480))),
        (2, bytearray(_gif(99, 77))),
        (3, bytearray(_jpeg(1920, 1080))),
        (4, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in image_header_metadata(df).collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("png", 640, 480)
    assert (got[2].format, got[2].width, got[2].height) == ("gif", 99, 77)
    assert (got[3].format, got[3].width, got[3].height) == ("jpeg", 1920, 1080)
    assert got[4].format is None and got[4].width is None


def test_frame_sampling_fanout(spark):
    # 10 "frames" of 4 bytes each; sample every 3rd → frames 0, 3, 6, 9.
    payload = bytes(range(40))
    df = spark.createDataFrame([(7, bytearray(payload))], "doc_id long, payload binary")
    got = sorted(sample_frames(df, frame_size=4, every=3).collect(),
                 key=lambda r: r.frame_idx)
    assert [r.frame_idx for r in got] == [0, 3, 6, 9]
    assert bytes(got[1].frame_bytes) == payload[12:16]
    assert all(len(r.frame_bytes) == 4 for r in got)


def test_byte_features_deterministic_and_ann_compatible(spark):
    from mbai_gdb_spark.ops.similarity import cosine_topk

    df = spark.createDataFrame(
        [(i, bytearray((b"payload-%d " % (i % 3)) * 20)) for i in range(30)],
        "vec_id long, payload binary",
    )
    feats = byte_features(df, dim=16, id_col="vec_id")
    a = {r.vec_id: r.embedding for r in feats.collect()}
    b = {r.vec_id: r.embedding for r in feats.collect()}
    assert a == b  # deterministic
    assert all(len(v) == 16 for v in a.values())

    # Identical payloads (same i % 3) → cosine 1.0 nearest neighbours.
    queries = feats.filter(F.col("vec_id") < 3)
    top = cosine_topk(feats, queries, k=5, id_col="vec_id").collect()
    for r in top:
        if r.rank == 1:
            assert r.vec_id % 3 == r.query_id % 3
            assert abs(r.cosine_sim - 1.0) < 1e-9


def test_resize_roundtrips_through_decode(spark):
    """resize is no longer a stub: payload→payload, decodable output."""
    from mbai_gdb_spark.ops.multimodal import decode_image, encode_png

    pixels = bytes(range(2 * 2 * 3))  # 2x2 RGB
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(2, 2, 3, pixels)))], "doc_id long, payload binary"
    )
    out = decode_image(resize_image(df, 4, 4)).collect()[0]
    assert (out.format, out.width, out.height, out.channels) == ("png", 4, 4, 3)
    assert len(bytes(out.pixels)) == 4 * 4 * 3
