"""JPEG baseline codec: real Huffman + DCT round-trips, restart
markers, corruption hardening — the lossy sibling of
test_gif_decode.py.  The encoder and decoder share only the constant
tables, so a near-lossless round-trip certifies both entropy coders
and both DCT directions against each other."""

from __future__ import annotations

import random

import numpy as np
import pytest

from mbai_gdb_spark.ops.multimodal import decode_payload_bytes, encode_jpeg


def _gray(out):
    fmt, w, h, ch, rgb = out
    assert (fmt, ch) == ("jpeg", 3)
    return np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)[:, :, 0].astype(int)


def test_jpeg_constant_blocks_roundtrip_exact():
    """Constant 8x8 blocks carry only a DC coefficient; with the flat
    quant table the whole pipeline (FDCT → quant → Huffman → dequant →
    IDCT) is bit-exact — the property the driver oracle leans on."""
    w, h = 24, 16
    px = np.zeros((h, w), dtype=np.uint8)
    vals = {}
    for by in range(h // 8):
        for bx in range(w // 8):
            v = (by * 3 + bx) * 41 % 256
            vals[(by, bx)] = v
            px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = v
    arr = _gray(decode_payload_bytes(encode_jpeg(w, h, px.tobytes(), channels=1)))
    for (by, bx), v in vals.items():
        assert (arr[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] == v).all(), (by, bx)


def test_jpeg_random_gray_near_lossless():
    rng = random.Random(5)
    for trial, (w, h) in enumerate([(8, 8), (24, 17), (33, 9)]):
        px = bytes(rng.randrange(256) for _ in range(w * h))
        arr = _gray(decode_payload_bytes(encode_jpeg(w, h, px, channels=1)))
        ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
        # Flat quant: the only loss is FDCT/IDCT float rounding.
        assert np.abs(arr - ref).max() <= 1, trial


def test_jpeg_color_near_lossless():
    rng = random.Random(11)
    w, h = 12, 10
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    fmt, ow, oh, ch, rgb = decode_payload_bytes(encode_jpeg(w, h, px, channels=3))
    assert (ow, oh, ch) == (w, h, 3)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    # YCbCr forward+inverse adds one more rounding step than gray.
    assert np.abs(arr - ref).max() <= 2


def test_jpeg_restart_markers():
    rng = random.Random(9)
    w, h = 40, 24  # 15 MCUs
    px = bytes(rng.randrange(256) for _ in range(w * h))
    b = encode_jpeg(w, h, px, channels=1, restart_interval=4)
    assert b"\xff\xdd" in b  # DRI present
    assert any(bytes((0xFF, 0xD0 + i)) in b for i in range(8))  # RSTn present
    arr = _gray(decode_payload_bytes(b))
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(arr - ref).max() <= 1


def test_jpeg_quantized_loss_is_bounded():
    rng = random.Random(3)
    w, h = 16, 16
    px = bytes(rng.randrange(256) for _ in range(w * h))
    arr = _gray(decode_payload_bytes(encode_jpeg(w, h, px, channels=1, quant=[16] * 64)))
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
    err = np.abs(arr - ref)
    assert err.max() <= 64  # well under gross corruption
    assert err.mean() <= 8  # and centered near the quant step


def test_jpeg_corruption_yields_none_not_exception():
    good = encode_jpeg(8, 8, bytes(range(64)), channels=1)
    assert decode_payload_bytes(good) is not None
    cases = [
        good[:20],  # truncated in headers
        good[:-10],  # truncated mid-scan
        good.replace(b"\xff\xc0", b"\xff\xc2"),  # progressive SOF
        good.replace(b"\xff\xc4", b"\xff\xcc", 1),  # DAC (arithmetic) marker
        b"\xff\xd8" + b"\x00" * 30,  # garbage after SOI
    ]
    for i, c in enumerate(cases):
        assert decode_payload_bytes(c) is None, i


def test_jpeg_dispatcher_format_tag():
    out = decode_payload_bytes(encode_jpeg(8, 8, bytes(64), channels=1))
    assert out[0] == "jpeg"


@pytest.mark.parametrize("w,h", [(1, 1), (7, 5), (9, 16)])
def test_jpeg_non_multiple_of_8_dims(w, h):
    rng = random.Random(w * 100 + h)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    arr = _gray(decode_payload_bytes(encode_jpeg(w, h, px, channels=1)))
    assert arr.shape == (h, w)
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(arr - ref).max() <= 1


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0: luma 2x2 blocks per MCU, chroma box-downsampled — the
    decoder's replication-upsample path.  On chroma-smooth images the
    subsampling is information-lossless, so the round-trip stays tight;
    max error 0 observed on a pure gradient."""
    w, h = 20, 14
    # Brightness gradient at constant hue: Cb/Cr are constant planes.
    px = bytes(
        min(255, x * 8 + y * 4) for y in range(h) for x in range(w) for _ in range(3)
    )
    b = encode_jpeg(w, h, px, channels=3, subsample=True)
    fmt, ow, oh, ch, rgb = decode_payload_bytes(b)
    assert (fmt, ow, oh, ch) == ("jpeg", w, h, 3)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(arr - ref).max() <= 2
    # The stream really is subsampled: SOF0 luma sampling byte is 0x22.
    sof = b.index(b"\xff\xc0")
    assert b[sof + 11] == 0x22


def test_jpeg_420_with_restarts():
    w, h = 48, 32  # 6 MCUs of 16x16
    px = bytes(
        (x * 5 + y * 3) % 256 for y in range(h) for x in range(w) for _ in range(3)
    )
    b = encode_jpeg(w, h, px, channels=3, subsample=True, restart_interval=2)
    fmt, ow, oh, ch, rgb = decode_payload_bytes(b)
    assert (ow, oh) == (w, h)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(arr - ref).max() <= 2


def test_jpeg_progressive_roundtrip_matches_baseline_bounds():
    """Full successive-approximation script (DC Al=1, banded AC Al=2,
    two AC refinement passes, DC refine): same round-trip bounds as
    the baseline path on identical content."""
    from mbai_gdb_spark.ops.multimodal import encode_jpeg_progressive

    rng = random.Random(41)
    for w, h, chn in [(8, 8, 1), (24, 17, 1), (12, 10, 3), (33, 9, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * chn))
        out = decode_payload_bytes(encode_jpeg_progressive(w, h, px, channels=chn))
        assert out is not None
        fmt, ow, oh, ch, rgb = out
        assert (fmt, ow, oh, ch) == ("jpeg", w, h, 3)
        arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
        if chn == 1:
            ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
            assert np.abs(arr[:, :, 0] - ref).max() <= 1, (w, h)
        else:
            ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
            assert np.abs(arr - ref).max() <= 2, (w, h)


def test_jpeg_progressive_eob_runs_across_blocks():
    """Constant regions make whole AC bands zero, so EOB runs span many
    blocks (eobrun > 1 → the EOBn + extension-bits path on both sides,
    possible only because the encoder ships a full AC table — Annex K
    tables lack the EOBn symbols)."""
    from mbai_gdb_spark.ops.multimodal import encode_jpeg_progressive

    w, h = 64, 40  # 40 blocks, mostly flat
    px = bytearray([77] * (w * h))
    px[0] = 200  # one block has AC energy
    b = encode_jpeg_progressive(w, h, bytes(px), channels=1)
    out = decode_payload_bytes(b)
    assert out is not None
    arr = np.frombuffer(out[4], dtype=np.uint8).reshape(h, w, 3)[:, :, 0].astype(int)
    ref = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(arr - ref).max() <= 1
    # Progressive stream really has multiple scans.
    assert b.count(b"\xff\xda") >= 6
    assert b"\xff\xc2" in b  # SOF2


def test_jpeg_progressive_quantized():
    """Lossy progressive (quant step 16) stays bounded like baseline."""
    from mbai_gdb_spark.ops.multimodal import encode_jpeg_progressive

    rng = random.Random(13)
    w, h = 16, 16
    px = bytes(rng.randrange(256) for _ in range(w * h))
    out = decode_payload_bytes(
        encode_jpeg_progressive(w, h, px, channels=1, quant=[16] * 64)
    )
    arr = np.frombuffer(out[4], dtype=np.uint8).reshape(h, w, 3)[:, :, 0].astype(int)
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
    base = decode_payload_bytes(encode_jpeg(w, h, px, channels=1, quant=[16] * 64))
    barr = np.frombuffer(base[4], dtype=np.uint8).reshape(h, w, 3)[:, :, 0].astype(int)
    # Progressive transmission reorders bits, not information: the
    # final coefficients are identical to baseline's, so decodes match.
    assert (arr == barr).all()


def test_jpeg_progressive_truncation_rejected():
    from mbai_gdb_spark.ops.multimodal import encode_jpeg_progressive

    b = encode_jpeg_progressive(16, 16, bytes(range(256)), channels=1)
    for cut in (30, len(b) // 2, len(b) - 5):
        assert decode_payload_bytes(b[:cut]) is None, cut


def test_jpeg_missing_eoi_rejected():
    """A stream cut at a CLEAN scan boundary (every byte of the scans
    present, only EOI gone) would reconstruct a partial-quality
    progressive preview — the strict stance rejects it, same rule as
    the GIF trailer."""
    from mbai_gdb_spark.ops.multimodal import encode_jpeg_progressive

    for enc in (
        lambda: encode_jpeg(16, 8, bytes(range(128)), channels=1),
        lambda: encode_jpeg_progressive(16, 8, bytes(range(128)), channels=1),
    ):
        b = enc()
        assert b[-2:] == b"\xff\xd9"
        assert decode_payload_bytes(b) is not None
        assert decode_payload_bytes(b[:-2]) is None
