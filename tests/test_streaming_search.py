"""Streaming BM25 index maintenance (foreachBatch → bm25_index_append)
must produce an index whose probes — and rows — are bit-identical to a
one-shot batch build over the drained corpus, across micro-batch
boundaries; replayed batches must be skipped, and a replay after a
lost marker must fail loudly instead of double-counting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = [
    ("q1", "the data model"),
    ("q2", "stream of events"),
    ("q3", "quality"),
]


def _docs(spark):
    return read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_streaming_index_equals_batch_build(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted
    from mbai_gdb_spark.streaming.search import (
        run_streaming_bm25_index_available_now,
    )

    docs = _docs(spark)
    src = str(tmp_path / "feed")
    # Hash-partitioned files: each micro-batch holds an arbitrary slice
    # of the doc-id space, so df/dl/meta arithmetic must hold across
    # every batch boundary, not just an ordered split.
    docs.repartition(4).write.parquet(src)

    inc_path = str(tmp_path / "inc_idx")
    run_streaming_bm25_index_available_now(
        spark, src, docs.schema, inc_path, n_buckets=16
    )

    full_path = str(tmp_path / "full_idx")
    bm25_index_persist(docs, full_path, n_buckets=16)

    qs = spark.createDataFrame(_QUERIES, "query_id string, qtext string")
    got = sorted(
        map(tuple, bm25_probe_persisted(spark, inc_path, qs, k=10).collect())
    )
    want = sorted(
        map(tuple, bm25_probe_persisted(spark, full_path, qs, k=10).collect())
    )
    assert got == want and len(got) > 0

    cols = ["term", "doc_id", "tf", "dl", "bucket"]
    inc_rows = sorted(
        map(tuple, spark.read.parquet(inc_path).select(cols).collect())
    )
    full_rows = sorted(
        map(tuple, spark.read.parquet(full_path).select(cols).collect())
    )
    assert inc_rows == full_rows


def test_batch_applier_skips_replayed_batches(spark, tmp_path):
    """Driving the applier directly: a replay of a recorded batch id is
    a no-op (exactly-once bookkeeping), while a NEW batch id carrying
    already-indexed docs trips the duplicate guard loudly."""
    from mbai_gdb_spark.ops.text import bm25_probe_persisted
    from mbai_gdb_spark.streaming.search import index_batch_applier

    docs = _docs(spark)
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    path = str(tmp_path / "idx")
    apply_batch = index_batch_applier(path, n_buckets=16)
    apply_batch(b0, 0)
    apply_batch(b1, 1)

    qs = spark.createDataFrame(_QUERIES, "query_id string, qtext string")
    before = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_before = spark.read.parquet(path + "/_meta").first()

    # Replays of both recorded batches: no-ops.
    apply_batch(b0, 0)
    apply_batch(b1, 1)
    after = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_after = spark.read.parquet(path + "/_meta").first()
    assert after == before
    assert (m_after["n_docs"], m_after["total_toks"]) == (
        m_before["n_docs"],
        m_before["total_toks"],
    )

    # Same docs under a NEW batch id = the lost-marker crash window:
    # the duplicate-doc_id guard must refuse rather than double-count.
    with pytest.raises(ValueError, match="already in the index"):
        apply_batch(b1, 2)


def test_batch_applier_empty_batch_never_builds(spark, tmp_path):
    """An empty FIRST batch must not create a degenerate empty index
    (its total_toks floor would skew every later append); the next
    non-empty batch builds instead."""
    import os

    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted
    from mbai_gdb_spark.streaming.search import index_batch_applier

    docs = _docs(spark)
    empty = docs.filter(F.lit(False))
    path = str(tmp_path / "idx")
    apply_batch = index_batch_applier(path, n_buckets=16)
    apply_batch(empty, 0)
    assert not os.path.isdir(os.path.join(path, "_meta"))
    apply_batch(docs, 1)

    full_path = str(tmp_path / "full_idx")
    bm25_index_persist(docs, full_path, n_buckets=16)
    qs = spark.createDataFrame(_QUERIES, "query_id string, qtext string")
    got = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    want = sorted(
        map(tuple, bm25_probe_persisted(spark, full_path, qs).collect())
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# IVF-PQ streaming twin: bootstrap batch fixes the quantizers, every
# later batch is a frozen-quantizer insert
# ---------------------------------------------------------------------------


def _staged_vector_feed(spark, tmp_path):
    """A feed dir with TWO parquet files whose processing order is
    pinned (FileStreamSource orders by modification time): the even
    half first (the bootstrap), the odd half second."""
    import glob
    import os
    import shutil
    import time

    emb = read_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    delta = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
    src = tmp_path / "feed"
    src.mkdir()
    now = time.time()
    for i, (df, nm) in enumerate([(base, "00_base"), (delta, "01_delta")]):
        stage = str(tmp_path / f"stage_{nm}")
        df.coalesce(1).write.parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = str(src / f"{nm}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (now + i, now + i))
        shutil.rmtree(stage)
    return emb, base, delta, str(src)


def test_streaming_ivfpq_equals_bootstrap_plus_append(spark, tmp_path):
    from mbai_gdb_spark.ops.similarity import (
        ivfpq_append,
        ivfpq_persist,
        ivfpq_probe_persisted,
    )
    from mbai_gdb_spark.streaming.search import (
        run_streaming_ivfpq_index_available_now,
    )

    emb, base, delta, src = _staged_vector_feed(spark, tmp_path)
    inc_path = str(tmp_path / "inc_idx")
    run_streaming_ivfpq_index_available_now(
        spark, src, emb.schema, inc_path, centroid_stride=50, code_stride=7
    )

    want_path = str(tmp_path / "want_idx")
    ivfpq_persist(base, want_path, centroid_stride=50, code_stride=7)
    ivfpq_append(delta, want_path)

    cols = ["vec_id", "sub_id", "code_id", "centroid_id"]
    got = sorted(map(tuple, spark.read.parquet(inc_path).select(cols).collect()))
    want = sorted(map(tuple, spark.read.parquet(want_path).select(cols).collect()))
    assert got == want and len(got) > 0
    # Every vector — bootstrap AND streamed — is indexed.
    assert len({r[0] for r in got}) == emb.count()

    queries = emb.filter(F.col("vec_id") < 5)
    got_p = sorted(
        map(
            tuple,
            ivfpq_probe_persisted(spark, inc_path, queries, k=3, n_probe=2).collect(),
        )
    )
    want_p = sorted(
        map(
            tuple,
            ivfpq_probe_persisted(spark, want_path, queries, k=3, n_probe=2).collect(),
        )
    )
    assert got_p == want_p and len(got_p) > 0


def test_vector_applier_replay_and_dup_guard(spark, tmp_path):
    from mbai_gdb_spark.streaming.search import vector_index_batch_applier

    emb = read_table(spark, SF_DIR, "embeddings")
    b0 = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    b1 = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
    path = str(tmp_path / "idx")
    apply_batch = vector_index_batch_applier(path, centroid_stride=50, code_stride=7)
    apply_batch(b0, 0)
    apply_batch(b1, 1)
    n = spark.read.parquet(path).count()

    # Replays of recorded batches: no-ops.
    apply_batch(b0, 0)
    apply_batch(b1, 1)
    assert spark.read.parquet(path).count() == n

    # Lost-marker crash window: a NEW batch id with already-inserted
    # vectors must refuse loudly.
    with pytest.raises(ValueError, match="already in the index"):
        apply_batch(b1, 2)


def test_streaming_compaction_tick_preserves_equivalence(spark, tmp_path):
    """The self-paying small-files tick (round 10): with
    compact_every=1 the drained index serves results bit-identical to a
    one-shot batch build AND every bucket directory holds exactly one
    parquet file — the O(appends)-files-per-probe debt is gone."""
    import glob
    import os

    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted
    from mbai_gdb_spark.streaming.search import (
        run_streaming_bm25_index_available_now,
    )

    docs = _docs(spark)
    src = str(tmp_path / "feed")
    docs.repartition(6).write.parquet(src)

    plain_path = str(tmp_path / "plain_idx")
    run_streaming_bm25_index_available_now(
        spark, src, docs.schema, plain_path, n_buckets=16
    )
    ticked_path = str(tmp_path / "ticked_idx")
    run_streaming_bm25_index_available_now(
        spark,
        src,
        docs.schema,
        ticked_path,
        n_buckets=16,
        compact_every=1,
        checkpoint=str(tmp_path / "ckpt2"),
    )

    # Fragmentation paid down: one file per bucket dir in the ticked
    # index; the un-ticked twin must be fragmented (or the fixture
    # proves nothing).
    def max_files(path):
        return max(
            len(glob.glob(os.path.join(path, d, "*.parquet")))
            for d in os.listdir(path)
            if d.startswith("bucket=")
        )

    assert max_files(plain_path) > 1
    assert max_files(ticked_path) == 1

    full_path = str(tmp_path / "full_idx")
    bm25_index_persist(docs, full_path, n_buckets=16)
    qs = spark.createDataFrame(_QUERIES, "query_id string, qtext string")
    ticked = sorted(
        map(tuple, bm25_probe_persisted(spark, ticked_path, qs, k=10).collect())
    )
    want = sorted(
        map(tuple, bm25_probe_persisted(spark, full_path, qs, k=10).collect())
    )
    assert ticked == want and len(ticked) > 0

    cols = ["term", "doc_id", "tf", "dl", "bucket"]
    got_rows = sorted(
        map(tuple, spark.read.parquet(ticked_path).select(cols).collect())
    )
    want_rows = sorted(
        map(tuple, spark.read.parquet(full_path).select(cols).collect())
    )
    assert got_rows == want_rows
