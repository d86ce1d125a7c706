"""Real WAV (RIFF PCM16) decode tests — no codec library, mirrors the
image-decode test strategy: containers built byte-by-byte from the
spec, plus encode/decode roundtrips."""

from __future__ import annotations

import struct

import numpy as np

from mbai_gdb_spark.ops.multimodal import (
    _wav_decode,
    audio_stats,
    decode_audio,
    encode_wav,
)


def test_wav_roundtrip_mono_and_stereo():
    for channels in (1, 2):
        rng = np.random.default_rng(channels)
        pcm = rng.integers(-32768, 32768, size=300 * channels, dtype=np.int16)
        blob = encode_wav(16000, channels, pcm.tobytes())
        rate, ch, data = _wav_decode(blob)
        assert (rate, ch) == (16000, channels)
        assert data == pcm.tobytes()


def test_wav_handbuilt_with_extra_chunk_and_odd_padding():
    """Chunk walk must skip unknown chunks and honor word alignment."""
    pcm = np.arange(-5, 5, dtype=np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    odd = b"x" * 3  # odd-length chunk → 1 byte padding
    blob = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rate, ch, data = _wav_decode(blob)
    assert (rate, ch, data) == (8000, 1, pcm)


def test_wav_rejects_non_pcm_and_garbage():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32 format
    blob = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    assert _wav_decode(blob) is None
    assert _wav_decode(b"not audio") is None
    assert _wav_decode(b"") is None


def test_decode_audio_stage_and_exact_stats(spark):
    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32768, size=128, dtype=np.int16)
    rows = [
        (1, bytearray(encode_wav(22050, 2, pcm.tobytes()))),
        (2, bytearray(b"garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in decode_audio(df).collect()}
    assert (got[1].sample_rate, got[1].channels, got[1].n_frames) == (22050, 2, 64)
    assert bytes(got[1].pcm) == pcm.tobytes()
    assert got[2].sample_rate is None and got[2].pcm is None

    s = pcm.astype(np.int64)
    stats = audio_stats(decode_audio(df).filter("pcm is not null")).collect()[0]
    assert stats.sample_sum == s.sum()
    assert stats.sample_abs_sum == np.abs(s).sum()
    assert (stats.sample_min, stats.sample_max) == (s.min(), s.max())
    assert stats.weighted_sum == (s * (np.arange(s.size) + 1)).sum()


def test_audio_stats_handles_null_and_empty_pcm(spark):
    """decode_audio -> audio_stats must survive undecodable payloads
    (NULL pcm -> NULL stats) and valid zero-length WAVs (empty sums, no
    extrema) without any caller-side filtering."""
    rows = [
        (1, bytearray(encode_wav(8000, 1, np.int16([3, -4, 5]).tobytes()))),
        (2, bytearray(b"garbage payload")),
        (3, bytearray(encode_wav(8000, 1, b""))),
        # RIFF magic but corrupt body: decoder must yield NULLs, not raise
        (4, bytearray(b"RIFF\x00\x00\x00\x00WAVEfmt \xff")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in audio_stats(decode_audio(df)).collect()}
    assert got[1].sample_sum == 4 and got[1].sample_abs_sum == 12
    assert (got[1].sample_min, got[1].sample_max) == (-4, 5)
    assert got[2].sample_sum is None and got[2].sample_min is None
    assert got[3].sample_sum == 0 and got[3].sample_min is None
    assert got[4].sample_sum is None
