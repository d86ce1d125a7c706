"""Regression tests for the round-9 self-review findings on the
incremental-index code:

1. ivfpq_append derives PQ geometry (m_sub, sub_dim) from the persisted
   _codebook side-car and validates explicit overrides — a mismatch
   raises instead of silently inserting corrupt codes.
2. bm25_index_persist stores the TRUE total_toks (no floor), so a
   token-less build appends exactly; bm25_index_append tolerates a
   bucket-less index; bm25_probe_persisted probes one to empty.
3. The append leaves no staging residue (the pure insert needs none)
   and probes ignore hidden underscore-prefixed dirs.
4. The streaming runner refuses to drive an index from a different
   checkpoint than the one its ledger was built under.
5. A crash mid-append leaves the index without _meta (crash-evidence:
   meta is removed before the delta insert and rewritten after), so
   completeness checks fail loudly instead of serving partial postings
   under stale corpus scalars.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# 1. ivfpq geometry from the side-car
# ---------------------------------------------------------------------------


def _emb_halves(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    return (
        emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0),
        emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1),
    )


def test_ivfpq_append_derives_geometry_from_codebook(spark, tmp_path):
    """A non-default 4x16 index: append with NO geometry args must
    derive 4/16 from _codebook and produce rows identical to an append
    with the explicit (correct) values."""
    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    base, delta = _emb_halves(spark)
    a, b = str(tmp_path / "derived"), str(tmp_path / "explicit")
    for p in (a, b):
        ivfpq_persist(
            base, p, centroid_stride=50, m_sub=4, sub_dim=16,
            code_stride=7, vectorized=False,
        )
    ivfpq_append(delta, a, vectorized=False)  # geometry derived
    ivfpq_append(delta, b, m_sub=4, sub_dim=16, vectorized=False)
    cols = ["vec_id", "sub_id", "code_id", "centroid_id"]
    rows_a = sorted(map(tuple, spark.read.parquet(a).select(cols).collect()))
    rows_b = sorted(map(tuple, spark.read.parquet(b).select(cols).collect()))
    assert rows_a == rows_b and len(rows_a) > 0
    assert max(r[1] for r in rows_a) == 3  # 4 sub-quantizers, not 8


def test_ivfpq_append_rejects_geometry_mismatch(spark, tmp_path):
    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    base, delta = _emb_halves(spark)
    path = str(tmp_path / "idx")
    ivfpq_persist(
        base, path, centroid_stride=50, m_sub=4, sub_dim=16,
        code_stride=7, vectorized=False,
    )
    with pytest.raises(ValueError, match="does not match the persisted"):
        ivfpq_append(delta, path, m_sub=8, vectorized=False)
    with pytest.raises(ValueError, match="does not match the"):
        ivfpq_append(delta, path, sub_dim=8, vectorized=False)


# ---------------------------------------------------------------------------
# 2. token-less corpora: true totals, bucket-less tolerance
# ---------------------------------------------------------------------------


def test_bm25_persist_stores_true_totals(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_persist

    docs = spark.createDataFrame(
        [(1, "three tokens here"), (2, "two tokens"), (3, "")],
        "doc_id long, text string",
    )
    path = str(tmp_path / "idx")
    bm25_index_persist(docs, path, n_buckets=8)
    m = spark.read.parquet(path + "/_meta").first()
    assert (m["n_docs"], m["total_toks"]) == (3, 5)  # exact, no floor

    blank = spark.createDataFrame([(9, ""), (10, "  ")], "doc_id long, text string")
    bpath = str(tmp_path / "blank_idx")
    bm25_index_persist(blank, bpath, n_buckets=8)
    mb = spark.read.parquet(bpath + "/_meta").first()
    assert (mb["n_docs"], mb["total_toks"]) == (2, 0)
    assert not any(n.startswith("bucket=") for n in os.listdir(bpath))


def test_bm25_append_onto_bucketless_index_equals_rebuild(spark, tmp_path):
    """build(blank docs) + append(real docs) ≡ build(blank ∪ real):
    rows, meta, and probes all bit-identical — the blank docs' N
    contribution survives, and the append neither crashes on the
    bucket-less read nor double-counts."""
    from mbai_gdb_spark.ops.text import (
        bm25_index_append,
        bm25_index_persist,
        bm25_probe_persisted,
    )

    blank = spark.createDataFrame([(9, ""), (10, " ")], "doc_id long, text string")
    real = spark.createDataFrame(
        [(1, "the zebra sleeps"), (2, "zebra stripes"), (3, "rain all night")],
        "doc_id long, text string",
    )
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    bm25_index_persist(blank, inc, n_buckets=8)
    bm25_index_append(real, inc)
    bm25_index_persist(blank.unionByName(real), full, n_buckets=8)

    cols = ["term", "doc_id", "tf", "dl", "bucket"]
    rows_i = sorted(map(tuple, spark.read.parquet(inc).select(cols).collect()))
    rows_f = sorted(map(tuple, spark.read.parquet(full).select(cols).collect()))
    assert rows_i == rows_f and len(rows_i) > 0
    m_i = spark.read.parquet(inc + "/_meta").first()
    m_f = spark.read.parquet(full + "/_meta").first()
    assert (m_i["n_docs"], m_i["total_toks"]) == (
        m_f["n_docs"],
        m_f["total_toks"],
    ) == (5, 8)

    qs = spark.createDataFrame([("q", "zebra")], "query_id string, qtext string")
    got = sorted(map(tuple, bm25_probe_persisted(spark, inc, qs).collect()))
    want = sorted(map(tuple, bm25_probe_persisted(spark, full, qs).collect()))
    assert got == want and len(got) > 0


def test_bm25_probe_of_bucketless_index_is_empty(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted

    blank = spark.createDataFrame([(9, "")], "doc_id long, text string")
    path = str(tmp_path / "idx")
    bm25_index_persist(blank, path, n_buckets=8)
    qs = spark.createDataFrame([("q", "zebra")], "query_id string, qtext string")
    out = bm25_probe_persisted(spark, path, qs)
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "doc_id", "score"]


# ---------------------------------------------------------------------------
# 3. staging residue stays inside the tree and is scan-hidden
# ---------------------------------------------------------------------------


def test_append_leaves_no_staging_and_tolerates_hidden_dirs(spark, tmp_path):
    """The pure-insert append needs no staging at all; any leftover
    underscore-prefixed dir (e.g. from an older layout, or a foreign
    tool) is invisible to probes — hidden paths never reach the scan."""
    from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    delta = spark.createDataFrame([(3, "alpha gamma")], "doc_id long, text string")
    path = str(tmp_path / "idx")
    bm25_index_persist(docs, path, n_buckets=8)
    bm25_index_append(delta, path)
    assert not os.path.exists(os.path.join(path, "_append_staging"))
    assert not any(".append_staging" in n for n in os.listdir(tmp_path))

    junk = os.path.join(path, "_append_staging", "bucket=0")
    os.makedirs(junk)
    with open(os.path.join(junk, "garbage.txt"), "w") as f:
        f.write("not parquet")
    from mbai_gdb_spark.ops.text import bm25_probe_persisted

    qs = spark.createDataFrame([("q", "alpha")], "query_id string, qtext string")
    assert bm25_probe_persisted(spark, path, qs).count() > 0
    shutil.rmtree(os.path.join(path, "_append_staging"))


# ---------------------------------------------------------------------------
# 4. checkpoint ledger scoping
# ---------------------------------------------------------------------------


def test_streaming_runner_refuses_foreign_checkpoint(spark, tmp_path):
    from mbai_gdb_spark.streaming.search import (
        run_streaming_bm25_index_available_now,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    src = str(tmp_path / "feed")
    docs.repartition(2).write.parquet(src)
    idx = str(tmp_path / "idx")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    run_streaming_bm25_index_available_now(
        spark, src, docs.schema, idx, n_buckets=8, checkpoint=ck1
    )
    # Same checkpoint: resuming (no new files) is fine.
    run_streaming_bm25_index_available_now(
        spark, src, docs.schema, idx, n_buckets=8, checkpoint=ck1
    )
    # Different checkpoint: the ledger would misfire — refuse.
    with pytest.raises(ValueError, match="per-checkpoint"):
        run_streaming_bm25_index_available_now(
            spark, src, docs.schema, idx, n_buckets=8, checkpoint=ck2
        )


# ---------------------------------------------------------------------------
# 5. crash-evidence: no _meta while bucket swaps are in flight
# ---------------------------------------------------------------------------


def test_append_crash_window_leaves_no_meta(spark, tmp_path, monkeypatch):
    """Force a crash inside the delta insert (after _meta removal, the
    formerly silent window): the index must be left WITHOUT _meta, so
    completeness conventions report it incomplete instead of serving
    partial postings under stale corpus scalars."""
    import mbai_gdb_spark.ops.text as text_mod

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta delta")], "doc_id long, text string"
    )
    delta = spark.createDataFrame([(3, "alpha delta")], "doc_id long, text string")
    path = str(tmp_path / "idx")
    text_mod.bm25_index_persist(docs, path, n_buckets=8)
    assert os.path.isdir(os.path.join(path, "_meta"))

    from pyspark.sql.readwriter import DataFrameWriter

    orig_parquet = DataFrameWriter.parquet

    def exploding_parquet(self, p, *a, **k):
        if p == path:  # the delta insert targets the index root
            raise RuntimeError("injected crash during delta insert")
        return orig_parquet(self, p, *a, **k)

    monkeypatch.setattr(DataFrameWriter, "parquet", exploding_parquet)
    with pytest.raises(RuntimeError, match="injected crash"):
        text_mod.bm25_index_append(delta, path)
    assert not os.path.isdir(os.path.join(path, "_meta"))


# ---------------------------------------------------------------------------
# 6. round-9 second review pass: compaction swap safety + meta merge tag
# ---------------------------------------------------------------------------


def test_compaction_handles_escaped_partition_values(spark, tmp_path):
    """A string partition value whose directory name Spark escapes
    (here: '=' becomes %3D) used to be unstageable (r9 pinned a loud
    no-damage abort); since round 10 the dir names are unescaped for
    the filter and re-escaped by the staging write, so these values
    compact CORRECTLY — content preserved, one file per directory."""
    from mbai_gdb_spark.io import compact_partitioned

    df = spark.createDataFrame(
        [("a=b", 1), ("a=b", 2), ("plain", 3)], "k string, v long"
    )
    path = str(tmp_path / "layout")
    # Two writes so the escaped dir holds >1 file (fragmented).
    df.write.mode("overwrite").partitionBy("k").parquet(path)
    df.write.mode("append").partitionBy("k").parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    done = compact_partitioned(spark, path, "k")
    assert sorted(done) == ["a=b", "plain"]
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before  # nothing lost, nothing changed
    for d in ("k=a%3Db", "k=plain"):
        parts = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(parts) == 1


def test_compaction_leaves_no_aside_residue(spark, tmp_path):
    from mbai_gdb_spark.io import compact_partitioned
    from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    delta = spark.createDataFrame([(3, "alpha gamma")], "doc_id long, text string")
    path = str(tmp_path / "idx")
    bm25_index_persist(docs, path, n_buckets=4)
    bm25_index_append(delta, path)
    compacted = compact_partitioned(spark, path, "bucket")
    assert compacted
    assert not any(n.startswith("_compact_old_") for n in os.listdir(path))
    assert not os.path.exists(os.path.join(path, "_compact_staging"))


def test_bm25_append_tag_makes_replay_idempotent(spark, tmp_path):
    """The merge tag rides inside _meta: a second call with the same
    tag is a no-op — including for a TOKEN-LESS delta, the case the
    duplicate-doc_id guard cannot see (no postings to collide on)."""
    from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    bm25_index_persist(docs, path, n_buckets=4)

    blank = spark.createDataFrame([(7, ""), (8, "  ")], "doc_id long, text string")
    bm25_index_append(blank, path, tag="b1")
    m1 = spark.read.parquet(path + "/_meta").first()
    assert m1["n_docs"] == 4 and m1["last_tag"] == "b1"
    # Replay (lost marker): same tag -> no double count.
    bm25_index_append(blank, path, tag="b1")
    m2 = spark.read.parquet(path + "/_meta").first()
    assert (m2["n_docs"], m2["total_toks"]) == (m1["n_docs"], m1["total_toks"])

    # A genuinely new token-less batch under a NEW tag still counts.
    blank2 = spark.createDataFrame([(9, "")], "doc_id long, text string")
    bm25_index_append(blank2, path, tag="b2")
    m3 = spark.read.parquet(path + "/_meta").first()
    assert m3["n_docs"] == 5 and m3["last_tag"] == "b2"


def test_vector_applier_replay_after_lost_marker_is_loud(spark, tmp_path):
    """(Unchanged contract, re-pinned post-refactor): IVF-PQ has no
    _meta tag, but every vector batch writes code rows, so a replayed
    batch under a new id trips the duplicate guard."""
    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.streaming.search import vector_index_batch_applier

    emb = read_table(spark, SF_DIR, "embeddings")
    b0 = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    b1 = emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
    path = str(tmp_path / "idx")
    apply_batch = vector_index_batch_applier(path, centroid_stride=50, code_stride=7)
    apply_batch(b0, 0)
    apply_batch(b1, 1)
    with pytest.raises(ValueError, match="already in the index"):
        apply_batch(b1, 2)


def test_bm25_applier_replay_after_lost_marker_is_noop(spark, tmp_path):
    """With the meta tag, a BM25 batch replayed under a NEW marker
    state (marker file deleted = the lost-marker crash) is silently
    absorbed instead of erroring: the tag check inside _meta already
    covers it."""
    import os as _os

    from mbai_gdb_spark.ops.text import bm25_probe_persisted
    from mbai_gdb_spark.streaming.search import index_batch_applier

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma"), (3, "alpha gamma")],
        "doc_id long, text string",
    )
    b0 = docs.filter(F.col("doc_id") <= 2)
    b1 = docs.filter(F.col("doc_id") == 3)
    path = str(tmp_path / "idx")
    apply_batch = index_batch_applier(path, n_buckets=4)
    apply_batch(b0, 0)
    apply_batch(b1, 1)
    qs = spark.createDataFrame([("q", "alpha")], "query_id string, qtext string")
    before = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_before = spark.read.parquet(path + "/_meta").first()

    _os.remove(_os.path.join(path, "_applied_batch"))  # the lost marker
    apply_batch(b1, 1)  # replay: absorbed by the meta tag
    after = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    m_after = spark.read.parquet(path + "/_meta").first()
    assert after == before
    assert (m_after["n_docs"], m_after["total_toks"]) == (
        m_before["n_docs"],
        m_before["total_toks"],
    )
