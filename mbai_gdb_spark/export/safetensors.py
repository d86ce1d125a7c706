"""safetensors-format shard export for embedding/tensor columns.

The training-loader counterpart of :mod:`export.shards`: instead of
parquet rows, each shard materializes as one ``.safetensors`` file —
the HuggingFace interchange container (8-byte little-endian u64 header
length, JSON header mapping tensor name → {dtype, shape,
data_offsets}, then one contiguous byte buffer) — which loaders mmap
with zero copies and no pickle surface.  The serializer and reader
here implement the public spec directly (no library dependency), and
the Spark sink streams each shard's rows through ``applyInPandas`` in
deterministic ``pos`` order, so re-exports are byte-identical.

Scale shape: one map-only hash projection (deterministic_shuffle), one
shuffle on shard, and one grouped-map pass that writes its shard's
file — each executor materializes only its own shard (N/S rows).  The
returned manifest is (shard, n_rows, n_bytes, ids_checksum) — bounded.
On a real cluster, point ``path`` at shared storage; the writer only
assumes a directory it can create files in.
"""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DTYPE_TAGS = {"F32": ("<f4", 4), "F64": ("<f8", 8), "I64": ("<i8", 8), "I32": ("<i4", 4)}


def safetensors_bytes(tensors: dict) -> bytes:
    """Serialize ``{name: (dtype_tag, shape, raw_le_bytes)}`` to the
    safetensors container.  Offsets are contiguous in insertion order;
    the header is padded with spaces to an 8-byte multiple per spec
    recommendation so the buffer starts aligned."""
    header = {}
    offset = 0
    blobs = []
    for name, (dtype, shape, raw) in tensors.items():
        if dtype not in _DTYPE_TAGS:
            raise ValueError(f"unsupported dtype {dtype}")
        itemsize = _DTYPE_TAGS[dtype][1]
        n = 1
        for d in shape:
            n *= d
        if len(raw) != n * itemsize:
            raise ValueError(f"tensor {name}: buffer/shape mismatch")
        header[name] = {
            "dtype": dtype,
            "shape": list(shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        offset += len(raw)
        blobs.append(raw)
    hjson = json.dumps(header, separators=(",", ":")).encode()
    pad = (8 - (len(hjson) % 8)) % 8
    hjson += b" " * pad
    return struct.pack("<Q", len(hjson)) + hjson + b"".join(blobs)


def read_safetensors(b: bytes) -> dict:
    """Parse a safetensors container → ``{name: (dtype, shape,
    np.ndarray)}``.  Strict: truncated buffers and overlapping or
    out-of-bounds offsets raise."""
    import numpy as np

    if len(b) < 8:
        raise ValueError("safetensors: truncated length prefix")
    (hlen,) = struct.unpack("<Q", b[:8])
    if len(b) < 8 + hlen:
        raise ValueError("safetensors: truncated header")
    header = json.loads(b[8 : 8 + hlen])
    buf = b[8 + hlen :]
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dtype, shape = meta["dtype"], meta["shape"]
        start, end = meta["data_offsets"]
        if not 0 <= start <= end <= len(buf):
            raise ValueError("safetensors: offsets out of bounds")
        np_dtype, itemsize = _DTYPE_TAGS[dtype]
        n = 1
        for d in shape:
            n *= d
        if end - start != n * itemsize:
            raise ValueError("safetensors: extent/shape mismatch")
        out[name] = (
            dtype,
            tuple(shape),
            np.frombuffer(buf[start:end], dtype=np_dtype).reshape(shape),
        )
    return out


def write_embedding_shards_safetensors(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Export (id, vector) rows as ``<path>/shard-<s>.safetensors``
    files, each holding ``ids`` (I64 [n]) and ``embeddings``
    (F32 [n, d]) in deterministic shuffled order.  Returns the manifest
    (shard, n_rows, n_bytes, ids_checksum); re-running the export
    produces byte-identical files (pinned in tests)."""
    import numpy as np
    import pandas as pd

    from mbai_gdb_spark.ops.sampling import deterministic_shuffle

    os.makedirs(path, exist_ok=True)
    sharded = deterministic_shuffle(
        df.select(id_col, vec_col), id_col, n_shards, seed=seed
    )

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        shard = int(pdf["shard"].iloc[0])
        ids = pdf[id_col].to_numpy(dtype="<i8")
        mat = np.stack(pdf[vec_col].to_numpy()).astype("<f4")
        blob = safetensors_bytes(
            {
                "ids": ("I64", (len(ids),), ids.tobytes()),
                "embeddings": ("F32", list(mat.shape), mat.tobytes()),
            }
        )
        fname = os.path.join(path, f"shard-{shard}.safetensors")
        tmp = fname + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, fname)  # atomic publish, crash leaves no torso
        ck = int((ids.astype(np.int64) * (np.arange(len(ids)) + 1)).sum() % 2_147_483_647)
        return pd.DataFrame(
            {
                "shard": [shard],
                "n_rows": [len(ids)],
                "n_bytes": [len(blob)],
                "ids_checksum": [ck],
            }
        )

    return sharded.groupBy("shard").applyInPandas(
        write_shard, "shard long, n_rows long, n_bytes long, ids_checksum long"
    )
