"""Generation-managed indexes (mbai_gdb_spark.indexgen): atomic pointer
swaps, hardlink-cloned O(delta) mutations, and THE round-10 contract —
a probe issued while (or after) a mutation crashes returns the PREVIOUS
generation's exact results, for both index layouts, instead of the bare
layout's correct-but-unavailable refusal."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"

_QS = [("q1", "the data model"), ("q2", "stream of events")]


def _docs(spark):
    return read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _emb(spark):
    return read_table(spark, SF_DIR, "embeddings")


def _queries(spark):
    return spark.createDataFrame(_QS, "query_id string, qtext string")


def _probe(spark, root, k=10):
    return sorted(
        map(tuple, G.bm25_gen_probe(spark, root, _queries(spark), k=k).collect())
    )


# ---------------------------------------------------------------------------
# Lifecycle: build → append → delete, pointer always names a complete tree
# ---------------------------------------------------------------------------


def test_bm25_generations_lifecycle_matches_rebuilds(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted

    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs.filter(F.col("doc_id") % 2 == 0), root, n_buckets=16)
    G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root)
    G.bm25_gen_delete(docs.filter(F.col("doc_id") % 10 == 7), root)
    assert G.list_generations(root) == ["gen-000001", "gen-000002", "gen-000003"]
    assert G.current_generation_name(root) == "gen-000003"

    want_path = str(tmp_path / "rebuild")
    bm25_index_persist(
        docs.filter(F.col("doc_id") % 10 != 7), want_path, n_buckets=16
    )
    want = sorted(
        map(
            tuple,
            bm25_probe_persisted(spark, want_path, _queries(spark), k=10).collect(),
        )
    )
    assert _probe(spark, root) == want and len(want) > 0


def test_hardlink_clone_shares_posting_files(spark, tmp_path):
    """The clone must be metadata work, not a copy: every posting file
    of the appended generation that predates the append is the SAME
    inode as the previous generation's."""
    docs = _docs(spark)
    root = str(tmp_path / "root")
    g1 = G.bm25_gen_build(docs.filter(F.col("doc_id") % 2 == 0), root, n_buckets=16)
    g2 = G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root)
    shared = 0
    for cur, _dirs, files in os.walk(g1):
        for f in files:
            if not f.endswith(".parquet") or "_meta" in cur:
                continue
            old = os.path.join(cur, f)
            new = os.path.join(g2, os.path.relpath(old, g1))
            assert os.path.exists(new), "append must never drop a posting file"
            assert os.stat(old).st_ino == os.stat(new).st_ino
            shared += 1
    assert shared > 0


def test_mutate_without_build_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no published generation"):
        G.bm25_gen_append(_docs(spark), str(tmp_path / "root"))


def test_prune_keeps_current_and_history(spark, tmp_path):
    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs.filter(F.col("doc_id") % 4 == 0), root, n_buckets=8)
    for m in range(1, 4):
        G.bm25_gen_append(docs.filter(F.col("doc_id") % 4 == m), root)
    before = _probe(spark, root)
    removed = G.prune_generations(root, keep=2)
    assert removed == ["gen-000001", "gen-000002"]
    assert G.list_generations(root) == ["gen-000003", "gen-000004"]
    assert _probe(spark, root) == before


# ---------------------------------------------------------------------------
# Crash injection: probes mid-failed-mutation serve the previous generation
# ---------------------------------------------------------------------------


def test_bm25_crashed_append_serves_previous_generation(
    spark, tmp_path, monkeypatch
):
    """Inject a crash INSIDE bm25_index_append at the worst moment —
    postings already inserted, the post-insert _meta rewrite never
    lands — and verify the pointer still serves the pre-append results
    exactly, while the bare crashed tree (the unpublished clone)
    refuses."""
    import mbai_gdb_spark.ops.text as text_mod
    from mbai_gdb_spark.ops.text import bm25_probe_persisted

    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs.filter(F.col("doc_id") % 2 == 0), root, n_buckets=16)
    before = _probe(spark, root)

    real_meta_writer = text_mod._write_bm25_meta
    calls = {"n": 0}

    def exploding_meta_writer(*a, **kw):
        # First call inside the append is the post-insert rewrite;
        # dying here leaves inserted postings and NO _meta — the
        # maximal-damage window for the bare layout.
        calls["n"] += 1
        raise RuntimeError("injected crash: power loss mid-append")

    monkeypatch.setattr(text_mod, "_write_bm25_meta", exploding_meta_writer)
    with pytest.raises(RuntimeError, match="injected crash"):
        G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root)
    monkeypatch.setattr(text_mod, "_write_bm25_meta", real_meta_writer)
    assert calls["n"] == 1

    # Pointer unchanged: probes serve the previous generation exactly.
    assert G.current_generation_name(root) == "gen-000001"
    assert _probe(spark, root) == before
    # The crashed clone exists, is unpublished, and the bare probe
    # refuses it (missing _meta) — crash evidence confined to the
    # generation nobody serves.
    crashed = os.path.join(root, "_generations", "gen-000002")
    assert os.path.isdir(crashed)
    with pytest.raises(Exception):
        bm25_probe_persisted(spark, crashed, _queries(spark), k=10).collect()
    # Recovery is just the next successful mutation: a new clone of the
    # still-healthy current generation.
    G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root)
    assert G.current_generation_name(root) == "gen-000003"
    assert len(_probe(spark, root)) > 0


def test_bm25_crashed_delete_serves_previous_generation(
    spark, tmp_path, monkeypatch
):
    """Crash a delete between its partition-directory swaps (the
    _delete_inflight window): pointer-served probes are unaffected;
    the crashed clone refuses via the sentinel."""
    from mbai_gdb_spark.ops.text import bm25_probe_persisted

    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs, root, n_buckets=16)
    before = _probe(spark, root)

    real_replace = os.replace
    state = {"swaps": 0}

    def exploding_replace(src, dst):
        if "_compact_old_" in dst or "bucket=" in dst:
            state["swaps"] += 1
            if state["swaps"] >= 3:
                raise RuntimeError("injected crash: died mid-swap")
        return real_replace(src, dst)

    # text.py binds `os` inside the function body, so the module object
    # itself is patched; the filter confines the blast radius to the
    # delete's own partition-dir swaps.
    monkeypatch.setattr(os, "replace", exploding_replace)
    with pytest.raises(RuntimeError, match="injected crash"):
        G.bm25_gen_delete(docs.filter(F.col("doc_id") % 3 == 0), root)
    monkeypatch.setattr(os, "replace", real_replace)

    assert G.current_generation_name(root) == "gen-000001"
    assert _probe(spark, root) == before
    crashed = os.path.join(root, "_generations", "gen-000002")
    assert os.path.exists(os.path.join(crashed, "_delete_inflight"))
    with pytest.raises(RuntimeError, match="IN-FLIGHT physical delete"):
        bm25_probe_persisted(spark, crashed, _queries(spark), k=10)


def test_ivfpq_crashed_append_serves_previous_generation(
    spark, tmp_path, monkeypatch
):
    import mbai_gdb_spark.ops.similarity as sim_mod

    emb = _emb(spark)
    root = str(tmp_path / "root")
    G.ivfpq_gen_build(
        emb.filter(F.col("vec_id") % 2 == 0), root, vectorized=False
    )
    qv = emb.filter(F.col("vec_id") < 5)
    before = sorted(
        map(tuple, G.ivfpq_gen_probe(spark, root, qv, k=5, n_probe=2).collect())
    )

    real_append = sim_mod.ivfpq_append

    def exploding_append(new_vectors, path, **kw):
        # The WORST crash for a pointer-less layout: the whole insert
        # lands, then the process dies before anything can publish —
        # the new code rows exist only in the unpublished clone.
        real_append(new_vectors, path, **kw)
        raise RuntimeError("injected crash: executor lost mid-insert")

    monkeypatch.setattr(sim_mod, "ivfpq_append", exploding_append)
    with pytest.raises(RuntimeError, match="injected crash"):
        G.ivfpq_gen_append(
            emb.filter(F.col("vec_id") % 2 == 1), root, vectorized=False
        )
    monkeypatch.setattr(sim_mod, "ivfpq_append", real_append)

    assert G.current_generation_name(root) == "gen-000001"
    after = sorted(
        map(tuple, G.ivfpq_gen_probe(spark, root, qv, k=5, n_probe=2).collect())
    )
    assert after == before and len(after) > 0
    # Recovery: the next append succeeds from the healthy generation.
    G.ivfpq_gen_append(
        emb.filter(F.col("vec_id") % 2 == 1), root, vectorized=False
    )
    assert G.current_generation_name(root) == "gen-000003"


def test_ivfpq_crashed_delete_serves_previous_generation(
    spark, tmp_path, monkeypatch
):
    from mbai_gdb_spark.ops.similarity import ivfpq_probe_persisted

    emb = _emb(spark)
    root = str(tmp_path / "root")
    G.ivfpq_gen_build(emb, root, vectorized=False)
    qv = emb.filter(F.col("vec_id") < 5)
    before = sorted(
        map(tuple, G.ivfpq_gen_probe(spark, root, qv, k=5, n_probe=2).collect())
    )

    real_replace = os.replace
    state = {"swaps": 0}

    def exploding_replace(src, dst):
        if "centroid_id=" in dst or "_compact_old_" in dst:
            state["swaps"] += 1
            if state["swaps"] >= 2:
                raise RuntimeError("injected crash: died mid-swap")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", exploding_replace)
    with pytest.raises(RuntimeError, match="injected crash"):
        G.ivfpq_gen_delete(
            emb.filter(F.col("vec_id") % 5 == 2), root, vectorized=False
        )
    monkeypatch.setattr(os, "replace", real_replace)

    assert G.current_generation_name(root) == "gen-000001"
    after = sorted(
        map(tuple, G.ivfpq_gen_probe(spark, root, qv, k=5, n_probe=2).collect())
    )
    assert after == before
    crashed = os.path.join(root, "_generations", "gen-000002")
    assert os.path.exists(os.path.join(crashed, "_delete_inflight"))
    with pytest.raises(RuntimeError, match="IN-FLIGHT physical delete"):
        ivfpq_probe_persisted(spark, crashed, qv, k=5, n_probe=2)


# ---------------------------------------------------------------------------
# gen_compact: compaction with NO probe-visible window
# ---------------------------------------------------------------------------


def test_gen_compact_publishes_defragmented_generation(spark, tmp_path):
    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs.filter(F.col("doc_id") % 4 == 0), root, n_buckets=8)
    for m in range(1, 4):
        G.bm25_gen_append(docs.filter(F.col("doc_id") % 4 == m), root)
    before = _probe(spark, root)
    cur = G.current_generation(root)
    frag_before = max(
        sum(1 for f in os.listdir(os.path.join(cur, d)) if f.endswith(".parquet"))
        for d in os.listdir(cur)
        if d.startswith("bucket=")
    )
    assert frag_before > 1, "appends must fragment the fixture"

    done = G.gen_compact(spark, root, "bucket")
    assert done, "compaction must have found fragmented dirs"
    assert G.current_generation_name(root) == "gen-000005"
    cur = G.current_generation(root)
    for d in os.listdir(cur):
        if d.startswith("bucket="):
            parts = [
                f
                for f in os.listdir(os.path.join(cur, d))
                if f.endswith(".parquet")
            ]
            assert len(parts) == 1
    assert _probe(spark, root) == before

    # A no-op tick publishes nothing and leaves no clone behind.
    assert G.gen_compact(spark, root, "bucket") == []
    assert G.current_generation_name(root) == "gen-000005"
    assert G.list_generations(root)[-1] == "gen-000005"


# ---------------------------------------------------------------------------
# Single-writer contract is ENFORCED (round-10 verdict item #6)
# ---------------------------------------------------------------------------


def test_concurrent_writer_fails_loudly_in_process(tmp_path):
    """A second writer against a root whose intent lock is held fails
    with ConcurrentWriteError instead of interleaving numbering."""
    from mbai_gdb_spark.io import ConcurrentWriteError, _writer_lock

    root = str(tmp_path / "root")
    G.generation_build(root, lambda p: open(os.path.join(p, "x"), "w").close())
    with _writer_lock(root):
        with pytest.raises(ConcurrentWriteError):
            G.generation_mutate(root, lambda p: None)
        with pytest.raises(ConcurrentWriteError):
            G.generation_build(root, lambda p: None)
    # Lock released: mutations proceed again.
    G.generation_mutate(root, lambda p: None)
    assert G.current_generation_name(root) == "gen-000002"


def test_concurrent_writer_fails_loudly_two_processes(tmp_path):
    """TWO PROCESSES: while process A holds a mutation open on a
    generation root, process B's mutation must fail loudly."""
    import subprocess
    import sys
    import threading
    import time

    root = str(tmp_path / "root")
    G.generation_build(root, lambda p: open(os.path.join(p, "x"), "w").close())

    entered = threading.Event()
    release = threading.Event()

    def slow_mutation(p):
        entered.set()
        assert release.wait(timeout=60)

    holder = threading.Thread(
        target=lambda: G.generation_mutate(root, slow_mutation)
    )
    holder.start()
    try:
        assert entered.wait(timeout=60)
        # Process B: a real separate interpreter attempting a mutation.
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from mbai_gdb_spark import indexgen as G\n"
            "from mbai_gdb_spark.io import ConcurrentWriteError\n"
            "try:\n"
            "    G.generation_mutate(%r, lambda p: None)\n"
            "except ConcurrentWriteError:\n"
            "    print('REFUSED'); sys.exit(0)\n"
            "print('INTERLEAVED'); sys.exit(1)\n"
        ) % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), root)
        proc = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=120,
        )
        assert proc.returncode == 0 and "REFUSED" in proc.stdout, (
            proc.stdout,
            proc.stderr,
        )
    finally:
        release.set()
        holder.join(timeout=60)
    # Holder's mutation published; exactly one gen-000002 exists.
    assert G.current_generation_name(root) == "gen-000002"
    assert G.list_generations(root) == ["gen-000001", "gen-000002"]
