"""Round-12 regressions for the r11 ADVICE findings.

1. prune_manifests / prune_generations run under the root's writer
   intent lock — a concurrent GC can no longer collect the manifest an
   in-flight mutate is about to publish (the "pointer names a deleted
   manifest" race).
2. Crashed writers' pid-named ``_staging-*`` residue is swept by the
   NEXT writer (any pid) and by prune_manifests — no unbounded disk
   leak inside the root.
3. The _materialize copy fallback (hardlink refused → inode reuse
   defeated → whole-index re-ingest) is no longer silent: the mutation
   warns and the manifest records stats.copy_fallback; healthy
   mutations record reused/ingested counts proving O(delta) ingest.
4. lsh_index_append_bucketed(full_guard=True) catches a re-added id
   whose DIFFERENT text rebands outside the touched directories — the
   corruption the default O(delta) guard documents as out of scope.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark import indexman as M
from mbai_gdb_spark.io import ConcurrentWriteError, _writer_lock
from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    lsh_buckets_from_signature,
    lsh_index_append_bucketed,
    lsh_index_persist_bucketed,
    minhash_signature_array,
)
from mbai_gdb_spark.ops.text import (
    bm25_index_append,
    bm25_index_persist,
    tokens,
)

_ROWS = [
    (0, "zebra cat dog river"),
    (1, "moon data model stream"),
    (2, "event quality table scan"),
    (3, "sort merge batch night"),
    (4, "rain snow graph index"),
    (5, "zebra data table night"),
]


def _docs(spark, rows=_ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _man_build(spark, root, rows=_ROWS):
    return M.manifest_build(
        root, lambda p: bm25_index_persist(_docs(spark, rows), p, n_buckets=4)
    )


# ---------------------------------------------------------------------------
# 1. prune under the writer lock
# ---------------------------------------------------------------------------


def test_prune_manifests_fails_fast_under_live_writer(spark, tmp_path):
    root = str(tmp_path / "man")
    _man_build(spark, root)
    with _writer_lock(root):
        with pytest.raises(ConcurrentWriteError):
            M.prune_manifests(root, keep=1)
    # lock released: prune proceeds normally
    assert M.prune_manifests(root, keep=1) == {"manifests": [], "objects": 0}


def test_prune_generations_fails_fast_under_live_writer(spark, tmp_path):
    root = str(tmp_path / "gen")
    G.generation_build(
        root, lambda p: bm25_index_persist(_docs(spark), p, n_buckets=4)
    )
    with _writer_lock(root):
        with pytest.raises(ConcurrentWriteError):
            G.prune_generations(root, keep=1)
    assert G.prune_generations(root, keep=1) == []


# ---------------------------------------------------------------------------
# 2. stale-staging sweep
# ---------------------------------------------------------------------------


def _plant_residue(root: str) -> str:
    residue = os.path.join(root, "_staging-99999999")
    os.makedirs(os.path.join(residue, "bucket=0"), exist_ok=True)
    with open(os.path.join(residue, "bucket=0", "part-x.parquet"), "w") as f:
        f.write("crashed writer residue")
    return residue


def test_next_mutation_sweeps_foreign_staging_residue(spark, tmp_path):
    root = str(tmp_path / "man")
    _man_build(spark, root)
    residue = _plant_residue(root)
    M.manifest_mutate(
        root,
        lambda p: bm25_index_append(_docs(spark, [(10, "fresh words")]), p),
    )
    assert not os.path.exists(residue)
    # and the residue never leaked into the published manifest
    files = M.read_manifest(root, M.current_manifest_name(root))["files"]
    assert not any(rel.startswith("_staging") for rel in files)


def test_build_and_prune_sweep_foreign_staging_residue(spark, tmp_path):
    root = str(tmp_path / "man")
    os.makedirs(root)
    residue = _plant_residue(root)
    _man_build(spark, root)
    assert not os.path.exists(residue)
    residue = _plant_residue(root)
    M.prune_manifests(root, keep=1)
    assert not os.path.exists(residue)


def test_sweep_spares_live_foreign_writers_staging(spark, tmp_path):
    """A LIVE foreign pid's staging tree is an overrunning writer that
    lost a stale-lock takeover, not residue — sweeping it would let
    that writer publish an empty/truncated manifest (review find).
    pid 1 is always alive; an unparseable suffix is not ours to touch."""
    root = str(tmp_path / "man")
    _man_build(spark, root)
    live = os.path.join(root, "_staging-1")
    weird = os.path.join(root, "_staging-not-a-pid")
    os.makedirs(live)
    os.makedirs(weird)
    dead = _plant_residue(root)  # _staging-99999999
    M.manifest_mutate(
        root,
        lambda p: bm25_index_append(_docs(spark, [(12, "fresh night")]), p),
    )
    assert os.path.exists(live) and os.path.exists(weird)
    assert not os.path.exists(dead)


# ---------------------------------------------------------------------------
# 3. copy-fallback visibility + healthy-path stats
# ---------------------------------------------------------------------------


def test_manifest_stats_record_odelta_ingest(spark, tmp_path):
    root = str(tmp_path / "man")
    _man_build(spark, root)
    m0 = M.read_manifest(root, M.current_manifest_name(root))
    assert m0["stats"]["ingested"] == len(m0["files"])
    assert m0["stats"]["reused"] == 0
    M.manifest_mutate(
        root,
        lambda p: bm25_index_append(_docs(spark, [(10, "fresh words")]), p),
    )
    m1 = M.read_manifest(root, M.current_manifest_name(root))
    st = m1["stats"]
    assert st["copy_fallback"] == 0
    assert st["reused"] + st["ingested"] == len(m1["files"])
    # O(delta): the append reuses (almost) everything; only the delta's
    # new part files and the rewritten _meta are new objects
    assert st["reused"] > 0
    assert st["ingested"] < m0["stats"]["ingested"]


def test_copy_fallback_warns_and_is_recorded(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "man")
    _man_build(spark, root)

    def refuse_link(src, dst, **kw):
        raise OSError("cross-device link (simulated)")

    monkeypatch.setattr(M.os, "link", refuse_link)
    with pytest.warns(RuntimeWarning, match="copy_fallback"):
        M.manifest_mutate(
            root,
            lambda p: bm25_index_append(_docs(spark, [(11, "more words")]), p),
        )
    st = M.read_manifest(root, M.current_manifest_name(root))["stats"]
    assert st["copy_fallback"] > 0
    # inode reuse defeated: every staged file re-ingested as a new object
    assert st["reused"] == 0


# ---------------------------------------------------------------------------
# 4. LSH append full-id guard
# ---------------------------------------------------------------------------


def _buckets(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    with_sig = (
        docs.select("doc_id", F.array_distinct(tokens("text")).alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            minhash_signature_array(
                F.transform(F.col("t"), lambda x: char_poly_id(x)), n_hashes=16
            ).alias("signature"),
        )
    )
    return lsh_buckets_from_signature(with_sig, "doc_id", "signature", 4)


def test_lsh_full_guard_catches_rebanded_readd(spark, tmp_path):
    path = str(tmp_path / "lsh")
    lsh_index_persist_bucketed(_buckets(spark, _ROWS), path, n_buckets=8)
    # same id, DIFFERENT text → different signature → (generally)
    # different buckets; craft until the re-add's directories miss at
    # least one of the original's so the touched-only guard is blind
    readd = [(0, "completely different vocabulary entirely new tokens")]
    orig = {
        (r["band"], r["bucket"])
        for r in _buckets(spark, [_ROWS[0]]).collect()
    }
    new = {(r["band"], r["bucket"]) for r in _buckets(spark, readd).collect()}
    assert new != orig  # the hazard exists for this fixture
    with pytest.raises(ValueError, match="insert-only"):
        lsh_index_append_bucketed(
            _buckets(spark, readd), path, full_guard=True
        )
    # and a genuinely new id still appends fine under the full guard
    lsh_index_append_bucketed(
        _buckets(spark, [(100, "brand new doc about rivers and snow")]),
        path,
        full_guard=True,
    )
