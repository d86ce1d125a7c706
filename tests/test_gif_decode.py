"""GIF decoder: real LZW (dictionary growth + width increase) verified
against an independent compressor, plus container-level corruption
hardening — the GIF sibling of test_multimodal_real.py."""

from __future__ import annotations

import random
import struct

from mbai_gdb_spark.ops.multimodal import (
    decode_payload_bytes,
    encode_gif,
)


def lzw_compress_reference(indices: bytes, mcs: int) -> bytes:
    """Real GIF-LZW compressor (greedy longest-match, growing dict and
    code width) — written independently of the decoder."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out_codes: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(clear)}
    next_code, width = end + 1, mcs + 1
    out_codes.append((clear, width))
    cur = b""
    for byte in indices:
        nxt = cur + bytes([byte])
        if nxt in table:
            cur = nxt
            continue
        out_codes.append((table[cur], width))
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                # GIF encoders bump width when next_code EXCEEDS 2^width
                width += 1
        cur = bytes([byte])
    if cur:
        out_codes.append((table[cur], width))
    out_codes.append((end, width))
    acc = nacc = 0
    data = bytearray()
    for code, w in out_codes:
        acc |= code << nacc
        nacc += w
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    return bytes(data)


def gif_with_stream(width, height, palette, lzw_data, mcs):
    ncol = len(palette)
    depth = max(2, (ncol - 1).bit_length())
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    for j in range(1 << depth):
        r, g, b = palette[j] if j < ncol else (0, 0, 0)
        out += bytes((r, g, b))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out += bytes([mcs])
    for i in range(0, len(lzw_data), 255):
        chunk = lzw_data[i : i + 255]
        out += bytes([len(chunk)]) + bytes(chunk)
    out += b"\x00\x3b"
    return bytes(out)


def test_real_lzw_with_dictionary_growth():
    rng = random.Random(42)
    for trial in range(30):
        w, h = rng.randint(4, 40), rng.randint(4, 30)
        ncol = rng.choice([4, 8, 16])
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(ncol)
        ]
        # runs + repeats → the compressor actually grows its dictionary
        idx = bytearray()
        while len(idx) < w * h:
            v = rng.randrange(ncol)
            idx += bytes([v]) * rng.randint(1, 9)
        idx = bytes(idx[: w * h])
        mcs = max(2, (ncol - 1).bit_length())
        data = lzw_compress_reference(idx, mcs)
        g = gif_with_stream(w, h, pal, data, mcs)
        out = decode_payload_bytes(g)
        assert out is not None, trial
        fmt, ow, oh, ch, rgb = out
        assert (fmt, ow, oh, ch) == ("gif", w, h, 3)
        assert rgb == b"".join(bytes(pal[i]) for i in idx), trial


def test_gif_extension_blocks_are_skipped():
    pal = [(1, 2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12)]
    idx = bytes([0, 1, 2, 3, 2, 1])
    g = bytearray(encode_gif(3, 2, pal, idx))
    # splice a Graphic Control Extension right before the image separator
    sep = g.index(0x2C, 13)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    g2 = bytes(g[:sep]) + gce + bytes(g[sep:])
    out = decode_payload_bytes(g2)
    assert out is not None and out[0] == "gif"
    assert out[4] == b"".join(bytes(pal[i]) for i in idx)


def test_gif_corruption_yields_none_not_exception():
    pal = [(0, 0, 0), (255, 255, 255), (9, 9, 9), (1, 1, 1)]
    good = encode_gif(4, 3, pal, bytes(range(4)) * 3)
    assert decode_payload_bytes(good) is not None
    cases = [
        good[:10],                         # truncated header
        good[:-6],                         # truncated stream (no END)
        good.replace(b"GIF89a", b"GIF99a"),  # bad magic (falls through → None)
        bytes(good[:6]) + struct.pack("<HHBBB", 0, 0, 0x80, 0, 0) + good[13:],  # zero dims
    ]
    for i, c in enumerate(cases):
        assert decode_payload_bytes(c) is None, i
    # interlace flag set → None (documented unsupported)
    g = bytearray(good)
    sep = g.index(0x2C, 13)
    g[sep + 9] |= 0x40
    assert decode_payload_bytes(bytes(g)) is None


def test_gif_lzw_bomb_is_bounded():
    # Declared 2x2 image but the LZW stream encodes far more pixels:
    # decoder must return None, not materialize them.
    pal = [(0, 0, 0), (1, 1, 1), (2, 2, 2), (3, 3, 3)]
    idx = bytes([1, 2, 3, 0] * 100)  # 400 pixels
    data = lzw_compress_reference(idx, 2)
    g = gif_with_stream(2, 2, pal, data, 2)
    assert decode_payload_bytes(g) is None


def test_animated_gif_frames_and_sampling(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.multimodal import (
        encode_gif_animated,
        gif_frames,
        gif_sample_frames,
    )

    pal = [(j, 2 * j, 3 * j) for j in range(8)]
    frames = [bytes((f + i) % 8 for i in range(12)) for f in range(5)]  # 4x3, 5 frames
    g = encode_gif_animated(4, 3, pal, frames)
    got = gif_frames(g)
    assert len(got) == 5
    for f, (w, h, rgb) in enumerate(got):
        assert (w, h) == (4, 3)
        assert rgb == b"".join(bytes(pal[(f + i) % 8]) for i in range(12))

    df = spark.createDataFrame([(1, bytearray(g)), (2, bytearray(b"junk"))],
                               "doc_id long, payload binary")
    out = gif_sample_frames(df, every=2).collect()
    assert sorted((r.doc_id, r.frame_idx) for r in out) == [(1, 0), (1, 2), (1, 4)]
    for r in out:
        f = r.frame_idx
        assert bytes(r.pixels) == b"".join(bytes(pal[(f + i) % 8]) for i in range(12))


def test_first_frame_decode_skips_later_frames_lzw():
    """Single-image decode validates the whole container structurally
    but only LZW-decodes frame 1 — and still rejects structural
    truncation after frame 1."""
    from mbai_gdb_spark.ops.multimodal import _gif_iter_frames, encode_gif_animated

    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    frames = [bytes([i % 4] * 12) for i in range(5)]
    g = encode_gif_animated(4, 3, pal, frames)
    out = list(_gif_iter_frames(g, decode_pixels=1))
    assert len(out) == 5
    assert out[0][2] is not None and all(f[2] is None for f in out[1:])
    # full decode still yields pixels for all frames
    full = list(_gif_iter_frames(g))
    assert all(f[2] is not None for f in full)
    assert out[0][2] == full[0][2]
    # structural truncation after frame 1 is still rejected
    assert decode_payload_bytes(g) is not None
    assert decode_payload_bytes(g[:-1]) is None  # missing trailer
