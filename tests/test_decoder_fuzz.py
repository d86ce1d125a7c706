"""Decoder fuzzing: the one-broken-file-yields-None contract, under
adversarial inputs.  At 100 TB some payloads are ALWAYS corrupt; a
decoder that raises (or hangs, or allocates unboundedly) on one of
them kills the stage.  Property: for ANY byte string — random garbage,
or a valid container with random mutations — ``decode_payload_bytes``
and ``audio decode`` return a result or None, never raise.  Plus
property-based round-trip bounds for the JPEG codec at random dims."""

from __future__ import annotations

import random

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mbai_gdb_spark.ops.multimodal import (
    decode_payload_bytes,
    encode_gif,
    encode_jpeg,
    encode_png,
    gif_frames,
)


def _valid_payloads(seed: int) -> list[bytes]:
    rng = random.Random(seed)
    w, h = 4 + seed % 5, 3 + seed % 4
    gray = bytes(rng.randrange(256) for _ in range(w * h))
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    pal = [(i * 9 % 256, i * 5 % 256, i * 3 % 256) for i in range(4)]
    idx = bytes(rng.randrange(4) for _ in range(w * h))
    return [
        encode_png(w, h, 3, rgb),
        encode_gif(w, h, pal, idx),
        encode_jpeg(w, h, gray, channels=1),
        encode_jpeg(w, h, rgb, channels=3),
    ]


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.binary(min_size=0, max_size=400))
def test_random_garbage_never_raises(payload):
    out = decode_payload_bytes(payload)
    assert out is None or (isinstance(out, tuple) and len(out) == 5)
    assert gif_frames(payload) is None or payload[:6] in (b"GIF87a", b"GIF89a")


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=0, max_value=9),
    st.lists(
        st.tuples(st.integers(0, 4000), st.integers(0, 255)),
        min_size=1,
        max_size=8,
    ),
)
def test_mutated_valid_containers_never_raise(seed, mutations):
    """Start from a VALID container of each format and flip random
    bytes: the decoder must return a (possibly wrong-pixel) result or
    None — mutations inside pixel data legitimately decode to different
    pixels; mutations in structure must be caught, not crash."""
    for payload in _valid_payloads(seed):
        buf = bytearray(payload)
        for pos, val in mutations:
            buf[pos % len(buf)] = val
        out = decode_payload_bytes(bytes(buf))
        assert out is None or (isinstance(out, tuple) and len(out) == 5)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=0, max_value=9),
    st.integers(min_value=0, max_value=3),
    st.data(),
)
def test_truncated_valid_containers_never_raise(seed, which, data):
    payload = _valid_payloads(seed)[which]
    cut = data.draw(st.integers(min_value=0, max_value=len(payload)))
    out = decode_payload_bytes(payload[:cut])
    assert out is None or (isinstance(out, tuple) and len(out) == 5)


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=30),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_gray_roundtrip_property(w, h, seed):
    """For ANY dims (multiples of 8 or not) and ANY content, the
    flat-quant grayscale round-trip is within 1 LSB per pixel."""
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    out = decode_payload_bytes(encode_jpeg(w, h, px, channels=1))
    assert out is not None
    fmt, ow, oh, ch, rgb = out
    assert (fmt, ow, oh, ch) == ("jpeg", w, h, 3)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)[:, :, 0].astype(int)
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(arr - ref).max() <= 1


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=20),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.booleans(),
)
def test_jpeg_color_roundtrip_property(w, h, seed, use_rst):
    rng = random.Random(seed)
    px = bytes(rng.randrange(256) for _ in range(w * h * 3))
    out = decode_payload_bytes(
        encode_jpeg(w, h, px, channels=3, restart_interval=3 if use_rst else 0)
    )
    assert out is not None
    fmt, ow, oh, ch, rgb = out
    assert (ow, oh, ch) == (w, h, 3)
    arr = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(int)
    ref = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    err = np.abs(arr - ref)
    # Two colorspace conversions + quantized DCT stack up to ±3 on rare
    # single pixels even with the all-ones quant table (hypothesis found
    # w=17,h=8,seed=130: ONE pixel at 3 out of 408 — conformant lossy
    # behavior, not a defect).  The tight MEAN bound is what catches a
    # systematic decoder/encoder regression.
    assert err.max() <= 3
    assert err.mean() <= 0.75
