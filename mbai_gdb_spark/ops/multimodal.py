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
