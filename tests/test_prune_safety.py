"""Cross-backend prune safety (round-11 verdict ask #7): ONE property,
exercised over BOTH generation backends through a uniform adapter —

    a prune NEVER deletes anything the live pointer / a surviving
    manifest references, no matter what crashed garbage surrounds it.

Matrix legs per backend:
- after a build + mutation chain with CRASH-INJECTED mutations
  interleaved (each crash leaves an unpublished partial generation /
  orphan objects + staging residue), prune removes the garbage and all
  retired history, while the probe result and every byte the survivors
  reference stay intact (sha1-pinned);
- a crash INSIDE prune itself (fault-injected removal) leaves the
  current generation serving identical results — prune's removals
  never precede a pointer move, so any prefix of them is safe;
- keep>1 retains exactly the advertised rollback history.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401  (frame builders)

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark import indexman as M
from mbai_gdb_spark.ops.text import (
    bm25_index_append,
    bm25_index_delete,
    bm25_index_persist,
    bm25_probe_persisted,
)

_ROWS = [
    (i, t)
    for i, t in enumerate(
        [
            "zebra cat dog river moon",
            "moon data model stream event",
            "event quality table scan sort",
            "sort merge batch night rain",
            "rain snow graph index zebra",
            "zebra data table night snow",
            "cat stream scan batch graph",
            "dog model sort rain index",
        ]
    )
]
_QS = [("q1", "zebra rain sort"), ("q2", "moon data graph")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class _Crash(RuntimeError):
    pass


class _GenBackend:
    """Hardlink-generation backend adapter."""

    name = "indexgen"

    def build(self, spark, root):
        G.generation_build(
            root, lambda p: bm25_index_persist(_docs(spark, _ROWS), p, n_buckets=4)
        )

    def mutate(self, spark, root, delta_rows):
        G.generation_mutate(
            root, lambda p: bm25_index_append(_docs(spark, delta_rows), p)
        )

    def crash_mutate(self, spark, root, delta_rows):
        def boom(p):
            bm25_index_append(_docs(spark, delta_rows), p)
            raise _Crash("crash after mutation, before publish")

        with pytest.raises(_Crash):
            G.generation_mutate(root, boom)

    def prune(self, root, keep=1):
        return G.prune_generations(root, keep=keep)

    def serving_dir(self, root):
        return G.current_generation(root)

    def referenced_files(self, root):
        """Every absolute file path the live pointer (plus kept
        history) transitively references."""
        out = []
        for name in G.list_generations(root):
            gen = os.path.join(root, "_generations", name)
            for cur, _d, files in os.walk(gen):
                out += [os.path.join(cur, f) for f in files]
        return out

    def history_names(self, root):
        return G.list_generations(root)


class _ManBackend:
    """Object-store manifest backend adapter."""

    name = "indexman"

    def build(self, spark, root):
        M.manifest_build(
            root, lambda p: bm25_index_persist(_docs(spark, _ROWS), p, n_buckets=4)
        )

    def mutate(self, spark, root, delta_rows):
        M.manifest_mutate(
            root, lambda p: bm25_index_append(_docs(spark, delta_rows), p)
        )

    def crash_mutate(self, spark, root, delta_rows):
        def boom(p):
            bm25_index_append(_docs(spark, delta_rows), p)
            raise _Crash("crash after mutation, before publish")

        with pytest.raises(_Crash):
            M.manifest_mutate(root, boom)

    def prune(self, root, keep=1):
        return M.prune_manifests(root, keep=keep)

    def serving_dir(self, root):
        return M.manifest_view(root)

    def referenced_files(self, root):
        out = []
        for name in M.list_manifests(root):
            files = M.read_manifest(root, name)["files"]
            out += [os.path.join(root, "_objects", o) for o in files.values()]
        return sorted(set(out))

    def history_names(self, root):
        return M.list_manifests(root)


BACKENDS = [_GenBackend(), _ManBackend()]


def _probe(spark, backend, root):
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")
    df = bm25_probe_persisted(spark, backend.serving_dir(root), qs, k=10)
    rows = df.select("query_id", "doc_id", "rank", "score").collect()
    return sorted(map(tuple, rows))


def _sha1s(paths):
    out = {}
    for p in paths:
        with open(p, "rb") as f:
            out[p] = hashlib.sha1(f.read()).hexdigest()
    return out


@pytest.mark.parametrize("backend", BACKENDS, ids=lambda b: b.name)
def test_prune_never_touches_referenced_bytes_amid_crash_garbage(
    spark, tmp_path, backend
):
    root = str(tmp_path / "root")
    backend.build(spark, root)
    # good mutation / crashed mutation / good mutation: the crash
    # leaves an unpublished partial (hardlink backend) or orphan
    # objects (manifest backend) sitting BETWEEN live history entries
    backend.mutate(spark, root, [(100, "zebra fresh words about rivers")])
    backend.crash_mutate(spark, root, [(200, "zebra never published words")])
    backend.mutate(spark, root, [(300, "zebra more fresh words at night")])

    before = _probe(spark, backend, root)
    docs_served = {r[1] for r in before}  # (query_id, doc_id, rank, score)
    assert 300 in docs_served  # last publish serves
    assert 200 not in docs_served  # crash never serves

    removed = backend.prune(root, keep=2)
    assert removed  # there was garbage and/or retired history to prune

    # THE property: everything still referenced exists with identical
    # bytes, and the serving path returns identical results
    survivors = backend.referenced_files(root)
    assert survivors
    _sha1s(survivors)  # raises if any referenced file was deleted
    assert _probe(spark, backend, root) == before

    # keep=2 retained exactly current + one history entry
    assert len(backend.history_names(root)) == 2

    # idempotence: pruning again removes nothing and changes nothing
    assert backend.prune(root, keep=2) in ([], {"manifests": [], "objects": 0})
    assert _probe(spark, backend, root) == before


@pytest.mark.parametrize("backend", BACKENDS, ids=lambda b: b.name)
def test_crash_inside_prune_leaves_current_serving(
    spark, tmp_path, backend, monkeypatch
):
    root = str(tmp_path / "root")
    backend.build(spark, root)
    backend.mutate(spark, root, [(100, "fresh words about rivers")])
    backend.mutate(spark, root, [(300, "more fresh words at night")])
    before = _probe(spark, backend, root)
    ref_hashes = _sha1s(backend.referenced_files(root))

    # fault-inject: the FIRST filesystem removal the prune performs
    # raises — any prefix of prune's removals must be safe
    calls = {"n": 0}
    real_rmtree = __import__("shutil").rmtree
    real_remove = os.remove

    def boom_rmtree(path, *a, **kw):
        calls["n"] += 1
        raise _Crash(f"crash during prune removal #{calls['n']}")

    def boom_remove(path):
        calls["n"] += 1
        raise _Crash(f"crash during prune removal #{calls['n']}")

    if backend.name == "indexgen":
        monkeypatch.setattr(G.shutil, "rmtree", boom_rmtree)
    else:
        monkeypatch.setattr(M.os, "remove", boom_remove)
    with pytest.raises(_Crash):
        backend.prune(root, keep=1)
    monkeypatch.setattr(G.shutil, "rmtree", real_rmtree)
    if backend.name == "indexman":
        monkeypatch.setattr(M.os, "remove", real_remove)

    # the pointer still serves identical results from identical bytes
    assert _probe(spark, backend, root) == before
    cur_files = [
        p for p in ref_hashes if os.path.exists(p)
    ]
    assert {p: h for p, h in _sha1s(cur_files).items()} == {
        p: ref_hashes[p] for p in cur_files
    }
    # and a RETRIED prune completes and still serves the same results
    backend.prune(root, keep=1)
    assert _probe(spark, backend, root) == before
