"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with metadata structs;
decode / feature-extraction / resize / frame-sampling run as Arrow-
batched ``mapInPandas`` stages.  The actual media codecs are NOT
available in this environment, so the decode kernels are STUBBED with a
deterministic fake (documented below) behind the same Spark plumbing —
schema, partitioning, batch shape, and UDF signature are real and
tested; swapping the fake for PIL/ffmpeg is a one-function change.

Scale notes: mapInPandas streams record batches (no per-row Python), and
binary payloads never shuffle unless the caller repartitions; metadata
extraction is a map-only stage.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

BINARY_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("head_sum", T.LongType()),
    ]
)


def with_binary_payload(
    df: DataFrame, text_col: str = "text", out_col: str = "payload"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text —
    stands in for image/audio bytes in the fixtures)."""
    return df.withColumn(out_col, F.encode(F.col(text_col), "UTF-8"))


def binary_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched metadata extraction over a binary column.

    Deterministic fake decoder: byte length + sum of the first 16 byte
    values.  Real media decode (PIL image open, audio frame counts)
    plugs in here — same signature, same batch shape.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "head_sum": payloads.map(
                        lambda b: int(sum(bytes(b)[:16]))
                    ).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, BINARY_META_SCHEMA)


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Image decode stage — STUB.  The container ships no image codecs;
    the real implementation decodes to (height, width, channels) +
    feature vector via PIL inside the same mapInPandas pattern as
    :func:`binary_metadata`."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; see binary_metadata "
        "for the production mapInPandas pattern"
    )


# ---------------------------------------------------------------------------
# Real header parsing (no codecs needed), frame sampling, fake features
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def _parse_image_header(b: bytes) -> tuple[str | None, int | None, int | None]:
    """Width/height straight from container headers — pure byte
    unpacking, no codec: PNG IHDR (big-endian u32 pair at offset 16),
    GIF logical screen (little-endian u16 pair at offset 6), JPEG SOF0-3
    marker scan.  Unknown/truncated payloads → (None, None, None)."""
    import struct

    if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xC3:  # SOF0..SOF3: baseline/progressive
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seg_len
        return "jpeg", None, None
    return None, None, None


def image_header_metadata(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, format, width, height) from real container headers — this is
    NOT a stub: PNG/GIF/JPEG dimensions come from actual byte parsing
    (struct.unpack over the header), Arrow-batched via mapInPandas.
    Only pixel DECODE (which needs a codec) is stubbed elsewhere."""

    def extract(batches):
        for pdf in batches:
            fmts, ws, hs = [], [], []
            for b in pdf[payload_col]:
                fmt, w, h = _parse_image_header(bytes(b) if b is not None else b"")
                fmts.append(fmt)
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "format": fmts,
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, IMAGE_META_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_size: int,
    every: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling over a fixed-frame-size 'video' payload: emit every
    ``every``-th frame as its own row — the row-EXPLODING mapInPandas
    shape (one input row → many output rows) a real video pipeline uses.
    The fixed-size-frame container is the deterministic stand-in for a
    real demuxer (ffmpeg plugs into the same loop); the fan-out,
    batching, and schema are the production shape."""

    def explode_frames(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(b) if b is not None else b""
                n_frames = len(raw) // frame_size
                for i in range(0, n_frames, every):
                    ids.append(int(did))
                    idxs.append(i)
                    frames.append(raw[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(explode_frames, FRAME_SCHEMA)


def byte_features(
    df: DataFrame,
    dim: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    out_col: str = "embedding",
) -> DataFrame:
    """Deterministic fake feature extractor: binary payload → fixed-dim
    float vector (per-dimension byte-histogram projection with an LCG
    mix).  Stands in for a vision/audio encoder — the output column is a
    real ``array<float>`` that flows straight into the ANN operators
    (ops.similarity), so the binary → embed → index → search pipeline is
    wired end-to-end even though the encoder itself is a fake."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField(out_col, T.ArrayType(T.FloatType())),
        ]
    )

    def featurize(batches):
        for pdf in batches:
            vecs = []
            for b in pdf[payload_col]:
                raw = np.frombuffer(bytes(b) if b is not None else b"", dtype=np.uint8)
                if raw.size == 0:
                    vecs.append([0.0] * dim)
                    continue
                mixed = (raw.astype(np.int64) * 2654435761 + 97) % 2_147_483_647
                buckets = mixed % dim
                acc = np.zeros(dim, dtype=np.float64)
                np.add.at(acc, buckets, (mixed % 1000) / 1000.0)
                vecs.append((acc / raw.size).astype(np.float32).tolist())
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), out_col: vecs})

    return df.select(id_col, payload_col).mapInPandas(featurize, out_schema)


def resize_image(df: DataFrame, width: int, height: int) -> DataFrame:
    """Pixel resize stage — STUB (needs a codec to decode before
    resampling).  The production version decodes via PIL inside the
    :func:`binary_metadata` mapInPandas pattern, resizes, and re-encodes;
    header parsing (:func:`image_header_metadata`), frame fan-out
    (:func:`sample_frames`) and featurization (:func:`byte_features`)
    around it are real."""
    raise NotImplementedError(
        "image codecs unavailable in this environment; the mapInPandas "
        "plumbing around the decode step is implemented and tested"
    )
