"""safetensors container + embedding shard export: spec round-trip,
deterministic byte-identical re-export, and content fidelity."""

from __future__ import annotations

import json
import pathlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.export.safetensors import (
    read_safetensors,
    safetensors_bytes,
    write_embedding_shards_safetensors,
)
from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_container_roundtrip_and_layout():
    ids = np.arange(5, dtype="<i8")
    mat = np.arange(15, dtype="<f4").reshape(5, 3)
    b = safetensors_bytes(
        {
            "ids": ("I64", (5,), ids.tobytes()),
            "embeddings": ("F32", (5, 3), mat.tobytes()),
        }
    )
    # spec: u64 header length, JSON header, aligned buffer
    (hlen,) = struct.unpack("<Q", b[:8])
    assert hlen % 8 == 0
    header = json.loads(b[8 : 8 + hlen])
    assert header["ids"]["data_offsets"] == [0, 40]
    assert header["embeddings"]["data_offsets"] == [40, 100]
    out = read_safetensors(b)
    assert (out["ids"][2] == ids).all()
    assert (out["embeddings"][2] == mat).all()
    assert out["embeddings"][1] == (5, 3)


def test_container_rejects_corruption():
    ids = np.arange(3, dtype="<i8")
    good = safetensors_bytes({"ids": ("I64", (3,), ids.tobytes())})
    with pytest.raises(ValueError):
        read_safetensors(good[:-4])  # truncated buffer → extent mismatch
    with pytest.raises(ValueError):
        read_safetensors(good[:6])  # truncated length prefix
    with pytest.raises(ValueError):
        safetensors_bytes({"x": ("I64", (4,), ids.tobytes())})  # shape lie
    with pytest.raises(ValueError):
        safetensors_bytes({"x": ("F16", (3,), ids.tobytes())})  # bad dtype


def test_shard_export_roundtrip_and_determinism(spark, tmp_path):
    emb = read_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "st")
    manifest = {
        r.shard: r for r in write_embedding_shards_safetensors(
            emb, path, n_shards=4
        ).collect()
    }
    assert set(manifest) == {0, 1, 2, 3}
    total = sum(r.n_rows for r in manifest.values())
    assert total == emb.count()

    src = {r.vec_id: np.array(r.embedding, dtype="<f4") for r in emb.collect()}
    seen = set()
    for s in range(4):
        f = pathlib.Path(path) / f"shard-{s}.safetensors"
        out = read_safetensors(f.read_bytes())
        ids = out["ids"][2]
        mat = out["embeddings"][2]
        assert mat.shape == (len(ids), 64)
        assert manifest[s].n_rows == len(ids)
        assert manifest[s].n_bytes == f.stat().st_size
        for i, vid in enumerate(ids):
            assert (mat[i] == src[int(vid)]).all()
            seen.add(int(vid))
    assert seen == set(src)

    # Byte-identical re-export (fresh directory).
    path2 = str(tmp_path / "st2")
    write_embedding_shards_safetensors(emb, path2, n_shards=4).collect()
    for s in range(4):
        a = (pathlib.Path(path) / f"shard-{s}.safetensors").read_bytes()
        b = (pathlib.Path(path2) / f"shard-{s}.safetensors").read_bytes()
        assert a == b, s
