"""Small-files compaction for incrementally maintained index layouts
(io.compact_partitioned): fragmented partition dirs collapse to one
file each, probes stay bit-identical, non-fragmented dirs are never
touched, and the op is content-preserving per directory (crash-safe
without a side-car protocol)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mbai_gdb_spark.io import compact_partitioned, read_table

SF_DIR = "/root/testdata/sf0.001"


def _parts(path: str, prefix: str) -> dict:
    out = {}
    for nm in os.listdir(path):
        if nm.startswith(prefix):
            d = os.path.join(path, nm)
            out[nm] = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
    return out


def test_bm25_compaction_preserves_probes(spark, tmp_path):
    from mbai_gdb_spark.ops.text import (
        bm25_index_append,
        bm25_index_persist,
        bm25_probe_persisted,
    )

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    path = str(tmp_path / "idx")
    thirds = [docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == i) for i in range(3)]
    bm25_index_persist(thirds[0], path, n_buckets=16)
    bm25_index_append(thirds[1], path)
    bm25_index_append(thirds[2], path)

    before_parts = _parts(path, "bucket=")
    assert any(len(v) > 1 for v in before_parts.values()), (
        "appends must fragment at least one bucket"
    )
    qs = spark.createDataFrame(
        [("q1", "the data model"), ("q2", "stream quality")],
        "query_id string, qtext string",
    )
    before = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_before = spark.read.parquet(path + "/_meta").first()

    compacted = compact_partitioned(spark, path, "bucket")
    assert compacted, "fragmented buckets must be reported"
    after_parts = _parts(path, "bucket=")
    for nm, files in after_parts.items():
        b = int(nm.split("=")[1])
        if b in compacted:
            assert len(files) == 1
        else:
            # untouched dirs keep their exact files
            assert files == before_parts[nm]
    assert not os.path.exists(os.path.join(path, "_compact_staging"))

    after = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_after = spark.read.parquet(path + "/_meta").first()
    assert after == before and len(after) > 0
    assert (m_after["n_docs"], m_after["total_toks"]) == (
        m_before["n_docs"],
        m_before["total_toks"],
    )

    # Second pass: already compact, nothing to do.
    assert compact_partitioned(spark, path, "bucket") == []


def test_ivfpq_compaction_preserves_probes(spark, tmp_path):
    from mbai_gdb_spark.ops.similarity import (
        ivfpq_append,
        ivfpq_persist,
        ivfpq_probe_persisted,
    )

    emb = read_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    delta = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
    path = str(tmp_path / "idx")
    ivfpq_persist(base, path, centroid_stride=50, code_stride=7)
    ivfpq_append(delta, path)

    before_parts = _parts(path, "centroid_id=")
    assert any(len(v) > 1 for v in before_parts.values())
    queries = emb.filter(F.col("vec_id") < 5)
    before = sorted(
        map(
            tuple,
            ivfpq_probe_persisted(spark, path, queries, k=3, n_probe=2).collect(),
        )
    )

    compacted = compact_partitioned(spark, path, "centroid_id")
    assert compacted
    for nm, files in _parts(path, "centroid_id=").items():
        cid = int(nm.split("=")[1])
        if cid in compacted:
            assert len(files) == 1
        else:
            assert files == before_parts[nm]

    after = sorted(
        map(
            tuple,
            ivfpq_probe_persisted(spark, path, queries, k=3, n_probe=2).collect(),
        )
    )
    assert after == before and len(after) > 0
