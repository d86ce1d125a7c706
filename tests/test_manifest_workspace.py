"""manifest_mutate_cached / MutateWorkspace (r13 verdict ask #4).

The streaming drain's per-batch cost through the manifest backend was
two O(#files) passes (materialize + stat-walk ingest) — measured 1.5×
the generation runner's whole-drain wall.  The workspace keeps ONE
materialized tree across mutations and re-ingests only the delta.
These tests pin the cache's safety story: identical published bytes on
the fast path, fresh-materialize fallback on EVERY staleness source
(foreign publish, swept tree, crashed mutation), and the surrounding
sweep/prune machinery sparing a live workspace without un-sparing
dead residue.
"""

from __future__ import annotations

import json
import os

import pytest

from mbai_gdb_spark import indexman as M


def _build(root: str, files: dict[str, str]) -> str:
    def b(p):
        for rel, body in files.items():
            out = os.path.join(p, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(body)

    return M.manifest_build(root, b)


def _write(p: str, rel: str, body: str) -> None:
    out = os.path.join(p, rel)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        f.write(body)
    os.replace(tmp, out)  # never truncate through a pool hardlink


def _served(root: str) -> dict[str, str]:
    cur = M.current_manifest_name(root)
    files = M.read_manifest(root, cur)["files"]
    out = {}
    for rel, obj in files.items():
        with open(os.path.join(root, "_objects", obj)) as f:
            out[rel] = f.read()
    return out


def _stats(root: str) -> dict:
    return M.read_manifest(root, M.current_manifest_name(root))["stats"]


BASE = {"bucket=0/part-a": "aaaa", "bucket=1/part-b": "bbbb",
        "_meta/scalars": "n=2"}


def test_fast_path_reuses_tree_and_ingests_only_delta(tmp_path):
    root = str(tmp_path / "man")
    _build(root, BASE)
    ws = M.MutateWorkspace(root)
    M.manifest_mutate_cached(
        root, lambda p: (_write(p, "bucket=0/part-c", "cccc"),
                         _write(p, "_meta/scalars", "n=3")), ws)
    s1 = _stats(root)
    assert s1["ws_tree_reused"] == 0  # first call: fresh materialize
    assert s1["ingested"] == 2 and s1["reused"] == 2
    M.manifest_mutate_cached(
        root, lambda p: (_write(p, "bucket=1/part-d", "dddd"),
                         _write(p, "_meta/scalars", "n=4")), ws)
    s2 = _stats(root)
    assert s2["ws_tree_reused"] == 1  # tree kept between mutations
    assert s2["ingested"] == 2 and s2["reused"] == 3
    assert _served(root) == {
        "bucket=0/part-a": "aaaa", "bucket=1/part-b": "bbbb",
        "bucket=0/part-c": "cccc", "bucket=1/part-d": "dddd",
        "_meta/scalars": "n=4",
    }


def test_cached_equals_plain_mutate_bytes(tmp_path):
    ra, rb = str(tmp_path / "plain"), str(tmp_path / "cached")
    _build(ra, BASE)
    _build(rb, BASE)
    ws = M.MutateWorkspace(rb)
    for i in range(4):
        mut = lambda p, i=i: (_write(p, f"bucket=0/part-{i}", f"v{i}"),
                              _write(p, "_meta/scalars", f"n={i}"))
        M.manifest_mutate(ra, mut)
        M.manifest_mutate_cached(rb, mut, ws)
    assert _served(ra) == _served(rb)


def test_foreign_publish_invalidates_fast_path(tmp_path):
    root = str(tmp_path / "man")
    _build(root, BASE)
    ws = M.MutateWorkspace(root)
    M.manifest_mutate_cached(root, lambda p: _write(p, "x", "1"), ws)
    # another writer (plain path) publishes behind the workspace's back
    M.manifest_mutate(root, lambda p: _write(p, "foreign", "f"))
    M.manifest_mutate_cached(root, lambda p: _write(p, "y", "2"), ws)
    assert _stats(root)["ws_tree_reused"] == 0  # staleness detected
    got = _served(root)
    assert got["foreign"] == "f" and got["y"] == "2" and got["x"] == "1"


def test_swept_tree_falls_back_without_wrong_bytes(tmp_path):
    root = str(tmp_path / "man")
    _build(root, BASE)
    ws = M.MutateWorkspace(root)
    M.manifest_mutate_cached(root, lambda p: _write(p, "x", "1"), ws)
    import shutil

    shutil.rmtree(ws.tree)  # e.g. our own plain-path sweep took it
    M.manifest_mutate_cached(root, lambda p: _write(p, "y", "2"), ws)
    assert _stats(root)["ws_tree_reused"] == 0
    assert _served(root)["y"] == "2"


def test_crashed_mutation_invalidates_workspace(tmp_path):
    root = str(tmp_path / "man")
    _build(root, BASE)
    ws = M.MutateWorkspace(root)
    M.manifest_mutate_cached(root, lambda p: _write(p, "x", "1"), ws)
    before = M.current_manifest_name(root)

    def boom(p):
        _write(p, "half", "dirty")
        raise RuntimeError("crash mid-mutation")

    with pytest.raises(RuntimeError, match="crash mid-mutation"):
        M.manifest_mutate_cached(root, boom, ws)
    # pointer untouched; workspace dropped (a dirty tree is never reused)
    assert M.current_manifest_name(root) == before
    assert ws.basis is None and not os.path.isdir(ws.tree)
    M.manifest_mutate_cached(root, lambda p: _write(p, "y", "2"), ws)
    got = _served(root)
    assert "half" not in got and got["y"] == "2"


def test_deletions_drop_from_manifest(tmp_path):
    root = str(tmp_path / "man")
    _build(root, BASE)
    ws = M.MutateWorkspace(root)
    M.manifest_mutate_cached(
        root, lambda p: os.remove(os.path.join(p, "bucket=1/part-b")), ws)
    assert "bucket=1/part-b" not in _served(root)
    # and the fast path stays coherent afterwards
    M.manifest_mutate_cached(root, lambda p: _write(p, "z", "3"), ws)
    assert _stats(root)["ws_tree_reused"] == 1
    assert "bucket=1/part-b" not in _served(root)


def test_prune_spares_live_workspace_and_still_collects(tmp_path):
    root = str(tmp_path / "man")
    _build(root, BASE)
    ws = M.MutateWorkspace(root)
    M.manifest_mutate_cached(root, lambda p: _write(p, "x", "1"), ws)
    M.manifest_mutate_cached(root, lambda p: _write(p, "y", "2"), ws)
    res = M.prune_manifests(root, keep=1)
    # our own live workspace is neither residue nor a GC blocker
    assert os.path.isdir(ws.tree)
    assert "gc_deferred" not in res and res["manifests"]
    M.manifest_mutate_cached(root, lambda p: _write(p, "z", "3"), ws)
    assert _stats(root)["ws_tree_reused"] == 1
    assert _served(root)["z"] == "3"


def test_close_drops_tree(tmp_path):
    root = str(tmp_path / "man")
    _build(root, BASE)
    ws = M.MutateWorkspace(root)
    M.manifest_mutate_cached(root, lambda p: _write(p, "x", "1"), ws)
    assert os.path.isdir(ws.tree)
    ws.close()
    assert not os.path.isdir(ws.tree) and ws.basis is None


def test_sweep_spare_own_keeps_workspace_sweeps_dead(tmp_path):
    root = str(tmp_path / "man")
    os.makedirs(root)
    own = os.path.join(root, f"_staging-{os.getpid()}")
    dead = os.path.join(root, "_staging-999999999")  # no such pid
    os.makedirs(own)
    os.makedirs(dead)
    removed = M._sweep_staging(root, spare_own=True)
    assert os.path.isdir(own) and not os.path.isdir(dead)
    assert removed == ["_staging-999999999"]
    # default still clears our own name for callers about to recreate it
    assert M._sweep_staging(root) == [f"_staging-{os.getpid()}"]
    assert not os.path.isdir(own)


def test_workspace_scoped_to_its_root(tmp_path):
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    _build(ra, BASE)
    _build(rb, BASE)
    ws = M.MutateWorkspace(ra)
    with pytest.raises(ValueError, match="scoped to"):
        M.manifest_mutate_cached(rb, lambda p: None, ws)


def test_replayed_tag_survives_workspace_path(tmp_path):
    """The _gen_tag exactly-once object keeps working through the
    cached path: the staged tag is rewritten via tmp+replace (new
    inode), so each batch's tag ingests as a new object inside the
    published manifest."""
    root = str(tmp_path / "man")
    _build(root, {**BASE, "_gen_tag": "0"})
    ws = M.MutateWorkspace(root)
    for i in (1, 2):
        M.manifest_mutate_cached(
            root, lambda p, i=i: _write(p, "_gen_tag", str(i)), ws)
        assert _served(root)["_gen_tag"] == str(i)
    hist = json.dumps(sorted(M.list_manifests(root)))
    assert "man-000001" in hist and "man-000003" in hist
