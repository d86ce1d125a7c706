"""Object-store MANIFEST backend for generation-managed indexes.

The hardlink backend (:mod:`mbai_gdb_spark.indexgen`) publishes each
index generation as a directory tree cloned by hardlinks — the right
local-filesystem design, but object stores (S3/GCS/ABFS) have neither
hardlinks nor atomic directory renames.  What they DO have is an
atomic, durable single-object PUT — so the production-portable design
is Iceberg's: data files are IMMUTABLE objects written once, a
generation is a small MANIFEST object listing the files that compose
each partition directory, and publishing is one pointer PUT.  This
module implements that model, runnable on a local filesystem so the
whole crash-injection suite can exercise it (tests/test_indexman.py):

- ``<root>/_objects/obj-NNNNNNNN`` — the immutable data-file pool.
  Objects are never rewritten and names are never reused (max+1
  numbering over everything present, including orphans from crashed
  ingests — the same rule generation numbering follows).
- ``<root>/_manifests/man-NNNNNN.json`` — one JSON manifest per
  generation: ``{"files": {relative/path: object-name}}``.
- ``<root>/_current`` — the pointer, swapped by tmp+rename (the local
  stand-in for the atomic PUT; on a real object store the PUT is
  durable when it returns, so no sync step exists at all — the
  durability discussion in :func:`indexgen._publish` vanishes here by
  construction, which is the reason the verdict's design note calls
  the manifest variant the 100 TB endgame).

Mutations run the UNCHANGED bare-layout operators
(``bm25_index_append`` / ``..._delete`` / ``..._update``, the IVF and
LSH families) against a staging tree materialized from the current
manifest, then ingest only files whose bytes are NEW: a staged file
that is still the hardlink of its source object (same inode) keeps its
object reference without any copy — so an O(delta) append ingests
O(delta) objects, exactly the property the hardlink backend gets from
clones.  This works because every bare-layout mutation is add-file or
replace-directory, never write-into-file (the invariant
:func:`indexgen._clone_tree_hardlinks` already rests on, pinned by the
byte-immutability sha1 tests).

Crash story — the pointer swap is the ONLY commit point:
- crash inside the mutation: a partial staging tree, no new objects,
  no new manifest — the pointer serves the previous generation;
- crash during object ingestion or before the manifest/pointer write:
  orphan objects (or an unreferenced manifest) that
  :func:`prune_manifests` garbage-collects — the pointer still serves
  the previous generation;
- probes resolve the pointer to a manifest and read an immutable VIEW
  tree materialized once per manifest (hardlinks into the pool,
  published by atomic directory rename) — a crashed view build leaves
  a temp directory, never a half-visible view.

Single writer per root, enforced with the same ``io._writer_lock``
intent lock the hardlink backend uses; probes are lock-free.

Reference parity note: the reference engine (lorenzoliuzzo/MBAI-gdb)
has no index lifecycle at all — storage is delegated to Neo4j
(src/manager.py:26-52).  This module exists for the object-store leg
of the 100 TB serving story.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import warnings
from collections.abc import Callable

_OBJECTS = "_objects"
_MANIFESTS = "_manifests"
_CURRENT = "_current"
_OBJ_RE = re.compile(r"obj-(\d{8,})")
_MAN_RE = re.compile(r"man-(\d{6,})\.json")


def _objects_dir(root: str) -> str:
    return os.path.join(root, _OBJECTS)


def _manifests_dir(root: str) -> str:
    return os.path.join(root, _MANIFESTS)


def _num(rx: re.Pattern, name: str) -> int:
    return int(rx.fullmatch(name).group(1))


def _next_name(d: str, rx: re.Pattern, fmt: str) -> str:
    names = [n for n in os.listdir(d)] if os.path.isdir(d) else []
    nxt = 1 + max((_num(rx, n) for n in names if rx.fullmatch(n)), default=0)
    return fmt % nxt


def current_manifest_name(root: str) -> str | None:
    """The manifest ``_current`` points at, or None for a never-published
    root."""
    ptr = os.path.join(root, _CURRENT)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        name = f.read().strip()
    return name or None


def read_manifest(root: str, name: str) -> dict:
    with open(os.path.join(_manifests_dir(root), name)) as f:
        return json.load(f)


def list_manifests(root: str) -> list[str]:
    d = _manifests_dir(root)
    if not os.path.isdir(d):
        return []
    return sorted(
        (n for n in os.listdir(d) if _MAN_RE.fullmatch(n)),
        key=lambda n: _num(_MAN_RE, n),
    )


def _publish(root: str, name: str) -> None:
    """The atomic-PUT stand-in: tmp+fsync+rename of the pointer file.
    On a real object store this is a single PUT and the operation is
    durable when it returns — no directory fsync, no os.sync."""
    ptr = os.path.join(root, _CURRENT)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr)


def _write_manifest(
    root: str, files: dict[str, str], stats: dict | None = None
) -> str:
    d = _manifests_dir(root)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{os.getpid()}")
    doc = {"files": files}
    if stats is not None:
        doc["stats"] = stats
    with open(tmp, "w") as f:
        json.dump(doc, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    # No-clobber publication into the numbered sequence (r13 review
    # find, same stale-takeover race as the object pool): link fails on
    # a name a concurrent overrunning writer just claimed, so this
    # writer takes the next number instead of silently overwriting a
    # manifest that may already be (about to be) pointed at.  The
    # pid-keyed tmp never collides between processes.
    while True:
        name = _next_name(d, _MAN_RE, "man-%06d.json")
        try:
            os.link(tmp, os.path.join(d, name))
            os.unlink(tmp)
            break
        except FileExistsError:
            continue
        except OSError:
            # Hardlink-less filesystem: atomic move (the no-clobber
            # guarantee narrows to what the FS can express).
            os.replace(tmp, os.path.join(d, name))
            break
    return name


def _live_foreign_staging(root: str) -> list[str]:
    """``_staging-<pid>`` directories under ``root`` whose owning pid is
    a DIFFERENT process that is (or may be) still alive — i.e. exactly
    the trees :func:`_sweep_staging` spares.  A non-empty answer means a
    writer that overran the lock's ``stale_after`` may be mid-mutation
    right now, so "we hold the lock ⇒ nothing is in flight" is false
    and destructive passes (object GC) must stand down (advice find)."""
    live = []
    try:
        names = os.listdir(root)
    except OSError:
        return live
    for nm in names:
        if not nm.startswith("_staging-"):
            continue
        pid_part = nm[len("_staging-"):]
        if not pid_part.isdigit() or int(pid_part) == os.getpid():
            continue
        try:
            os.kill(int(pid_part), 0)
            live.append(nm)  # alive
        except ProcessLookupError:
            pass  # dead: sweepable residue, not live
        except OSError:
            live.append(nm)  # unknowable: treat as live (safe side)
    return live


def _sweep_staging(root: str, spare_own: bool = False) -> list[str]:
    """Remove ``_staging-<pid>`` residue of DEAD processes under
    ``root`` (an advice find: pid-named residue from a crashed process
    was never swept by a later process with a different pid, leaking
    the full materialized index size per crash).  Liveness is probed,
    not assumed from the lock: "we hold the lock ⇒ any staging is
    crashed" is FALSE in exactly one case — a writer that overran the
    lock's ``stale_after`` and lost it to a takeover is still alive and
    mid-mutation, and rmtree'ing its tree between materialize and
    ingest would let it publish an empty/truncated manifest (review
    find).  A live foreign pid's tree is left alone (it will either
    finish or die and be swept later); unprobeable pids are kept —
    leaking one directory beats destroying a live writer's staging.
    ``spare_own=True`` additionally leaves OUR pid's tree alone — for
    callers that are not about to recreate it (``prune_manifests``
    and the non-fresh :func:`manifest_mutate_cached` path, whose live
    drain WORKSPACE lives at exactly that name between batches).
    Returns the removed names."""
    removed = []
    try:
        names = os.listdir(root)
    except OSError:
        return removed
    for nm in names:
        if not nm.startswith("_staging-"):
            continue
        pid_part = nm[len("_staging-"):]
        if pid_part.isdigit() and int(pid_part) != os.getpid():
            try:
                os.kill(int(pid_part), 0)
                continue  # alive: an overrunning writer, not residue
            except ProcessLookupError:
                pass  # dead: crashed residue — sweep it
            except OSError:
                continue  # unknowable: keep (leak beats data loss)
        elif pid_part.isdigit():
            if spare_own:
                continue  # a live drain workspace, not residue
            pass  # our own pid: safe — the caller recreates it next
        else:
            continue  # unrecognized name: not ours to delete
        shutil.rmtree(os.path.join(root, nm), ignore_errors=True)
        removed.append(nm)
    return removed


def _ingest_tree(
    root: str, tree: str, prev_files: dict[str, str]
) -> tuple[dict[str, str], dict[str, int]]:
    """Move each file of ``tree`` into the object pool, REUSING the
    previous generation's object for any staged file that is still its
    hardlink (same inode) — unchanged data is never re-ingested, so the
    object-count growth of a mutation is exactly its delta (tested).
    New bytes are moved (atomic same-FS rename) under never-reused
    object names.  Returns the relpath → object-name map plus
    ``{"reused": n, "ingested": n}`` counts (recorded in the manifest's
    ``stats`` so a defeated reuse path — e.g. a copy-fallback
    materialization breaking inode identity — is visible, not silent)."""
    obj_dir = _objects_dir(root)
    os.makedirs(obj_dir, exist_ok=True)
    # inode → existing object name (for unchanged-file reuse)
    prev_ino: dict[int, str] = {}
    for rel, obj in prev_files.items():
        op = os.path.join(obj_dir, obj)
        try:
            prev_ino[os.stat(op).st_ino] = obj
        except OSError:
            continue
    # one listdir for the whole ingest, then a local counter — an
    # O(pool) scan per file would make big ingests quadratic
    nxt = 1 + max(
        (_num(_OBJ_RE, n) for n in os.listdir(obj_dir) if _OBJ_RE.fullmatch(n)),
        default=0,
    )
    files: dict[str, str] = {}
    stats = {"reused": 0, "ingested": 0}
    for cur, _dirs, names in os.walk(tree):
        for f in names:
            src = os.path.join(cur, f)
            rel = os.path.relpath(src, tree)
            ino = os.stat(src).st_ino
            reuse = prev_ino.get(ino)
            if reuse is not None:
                files[rel] = reuse
                stats["reused"] += 1
                continue
            # No-clobber allocation (r13 review find): under a
            # stale-lock takeover, the overrunning writer may still be
            # mid-ingest and racing this one for max+1 names — a plain
            # os.replace would silently overwrite its pool object and
            # corrupt whichever manifest wins the pointer.  link+unlink
            # is an atomic same-FS move that FAILS on collision, so the
            # loser just takes the next number; immutability holds for
            # every object that ever existed.
            while True:
                obj = "obj-%08d" % nxt
                nxt += 1
                dst = os.path.join(obj_dir, obj)
                try:
                    os.link(src, dst)
                    os.unlink(src)
                    break
                except FileExistsError:
                    continue  # claimed by a concurrent writer: next
                except OSError:
                    # Filesystem refuses hardlinks (the same condition
                    # that makes _materialize copy-fall-back): keep the
                    # atomic move; the no-clobber guarantee narrows to
                    # what such a filesystem can express.
                    os.replace(src, dst)
                    break
            files[rel] = obj
            stats["ingested"] += 1
    return files, stats


def _materialize(root: str, files: dict[str, str], dst: str) -> int:
    """Hardlink the manifest's objects into ``dst`` under their
    relative paths — the local-FS stand-in for remote GETs.  Falls back
    to a copy where the filesystem refuses links, and RETURNS the
    fallback count: a copied file loses inode identity with its source
    object, so :func:`_ingest_tree` cannot reuse it and the next
    mutation re-ingests it as a new object — O(index) pool growth per
    mutation instead of O(delta).  Callers surface the count (manifest
    ``stats`` + a warning) so that degradation is observable (advice
    find), instead of a silent 1000× ingest amplification at scale."""
    obj_dir = _objects_dir(root)
    n_copy = 0
    for rel, obj in files.items():
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        src = os.path.join(obj_dir, obj)
        try:
            os.link(src, out)
        except OSError:
            shutil.copy2(src, out)
            n_copy += 1
    return n_copy


def manifest_build(root: str, build_fn: Callable[[str], None]) -> str:
    """Build and publish the first (or a replacement full) generation:
    ``build_fn`` writes a complete index tree into a staging directory;
    its files are then ingested as immutable objects, a manifest is
    written, and the pointer swaps.  A crash anywhere before the swap
    leaves the pointer untouched (orphans are GC'd by
    :func:`prune_manifests`).  Returns the manifest name."""
    from mbai_gdb_spark.io import _writer_lock

    os.makedirs(root, exist_ok=True)
    with _writer_lock(root):
        _sweep_staging(root)  # residue of ANY crashed writer (we hold the lock)
        staging = os.path.join(root, f"_staging-{os.getpid()}")
        os.makedirs(staging)
        try:
            build_fn(staging)
            files, stats = _ingest_tree(root, staging, {})
            name = _write_manifest(root, files, stats)
            _publish(root, name)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    return name


def manifest_mutate(root: str, mutate_fn: Callable[[str], None]) -> str:
    """Run a bare-layout mutation against a staging tree materialized
    from the current manifest, ingest only the NEW bytes, publish a new
    manifest.  The pointer swap is the single commit point: a crash
    anywhere earlier leaves the previous generation serving (crash-
    injection tested).  Returns the new manifest name."""
    from mbai_gdb_spark.io import _writer_lock

    with _writer_lock(root):
        cur = current_manifest_name(root)
        if cur is None:
            raise ValueError(
                f"manifest_mutate: no published manifest at {root} — "
                "build one first (manifest_build)"
            )
        prev_files = read_manifest(root, cur)["files"]
        _sweep_staging(root)  # residue of ANY crashed writer (we hold the lock)
        staging = os.path.join(root, f"_staging-{os.getpid()}")
        os.makedirs(staging)
        try:
            n_copy = _materialize(root, prev_files, staging)
            mutate_fn(staging)
            files, stats = _ingest_tree(root, staging, prev_files)
            stats["copy_fallback"] = n_copy
            if n_copy:
                warnings.warn(
                    f"indexman.manifest_mutate({root}): {n_copy} staged "
                    "file(s) materialized by COPY (hardlink refused) — "
                    "inode reuse is defeated for them and this mutation "
                    "re-ingested unchanged bytes as new objects; see the "
                    "manifest's stats.copy_fallback",
                    RuntimeWarning,
                    stacklevel=2,
                )
            name = _write_manifest(root, files, stats)
            _publish(root, name)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
    return name


def _scan_inodes(tree: str) -> dict[str, int]:
    """relpath → inode for every file under ``tree``, read from the
    directory entries themselves (``DirEntry.inode()``) — no per-file
    ``stat``, so the whole pass is a handful of ``getdents`` batches
    even for a large materialized index."""
    out: dict[str, int] = {}
    stack = [tree]
    while stack:
        d = stack.pop()
        with os.scandir(d) as it:
            for e in it:
                if e.is_dir(follow_symlinks=False):
                    stack.append(e.path)
                else:
                    out[os.path.relpath(e.path, tree)] = e.inode()
    return out


def _materialize_indexed(
    root: str, files: dict[str, str], dst: str
) -> tuple[dict[str, tuple[int | None, str]], int]:
    """:func:`_materialize` that also returns the workspace index
    {rel: (inode, object)} for :func:`manifest_mutate_cached`.  A file
    that fell back to COPY records inode ``None``: a copy's inode is
    pinned only by the tree file itself, so a delete-then-recreate in
    one mutation could recycle it and a stale cache hit would map the
    rel to the OLD object's bytes — ``None`` never matches, which
    degrades those files to re-ingestion (exactly today's
    copy-fallback behavior on hardlink-less filesystems)."""
    obj_dir = _objects_dir(root)
    index: dict[str, tuple[int | None, str]] = {}
    n_copy = 0
    for rel, obj in files.items():
        out = os.path.join(dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        src = os.path.join(obj_dir, obj)
        try:
            os.link(src, out)
            index[rel] = (os.stat(out).st_ino, obj)
        except OSError:
            shutil.copy2(src, out)
            index[rel] = (None, obj)
            n_copy += 1
    return index, n_copy


def _ingest_tree_cached(
    root: str, tree: str, index: dict[str, tuple[int | None, str]]
) -> tuple[dict[str, str], dict[str, int], dict[str, tuple[int | None, str]]]:
    """The workspace flavor of :func:`_ingest_tree`: unchanged files
    are recognized against the CACHED {rel: (inode, object)} index
    from the previous publish instead of a fresh pool-wide stat pass,
    and newly ingested files are LINKED into the pool (the tree keeps
    its name as a pool hardlink) rather than moved — so the tree stays
    a complete materialized view of the new manifest and the next
    mutation applies its delta in place.  A cached inode is pinned by
    its live pool object (the basis manifest is always the current
    one, which GC never collects), so inode recycling cannot produce a
    false cache hit.  Returns (files, stats, new_index)."""
    obj_dir = _objects_dir(root)
    os.makedirs(obj_dir, exist_ok=True)
    nxt = 1 + max(
        (_num(_OBJ_RE, n) for n in os.listdir(obj_dir) if _OBJ_RE.fullmatch(n)),
        default=0,
    )
    files: dict[str, str] = {}
    stats = {"reused": 0, "ingested": 0}
    new_index: dict[str, tuple[int | None, str]] = {}
    n_copy = 0
    for rel, ino in _scan_inodes(tree).items():
        prev = index.get(rel)
        if prev is not None and prev[0] is not None and prev[0] == ino:
            files[rel] = prev[1]
            new_index[rel] = prev
            stats["reused"] += 1
            continue
        src = os.path.join(tree, rel)
        while True:
            obj = "obj-%08d" % nxt
            nxt += 1
            dst = os.path.join(obj_dir, obj)
            try:
                os.link(src, dst)  # tree file BECOMES the pool link
                new_index[rel] = (ino, obj)
                break
            except FileExistsError:
                continue  # claimed by a concurrent writer: next number
            except OSError:
                # Hardlink-less filesystem: atomic move into the pool,
                # then restore the tree copy so the workspace stays a
                # complete view (inode identity is lost — record None
                # so the next batch re-ingests rather than trusting a
                # recyclable inode).
                os.replace(src, dst)
                shutil.copy2(dst, src)
                new_index[rel] = (None, obj)
                n_copy += 1
                break
        files[rel] = obj
        stats["ingested"] += 1
    if n_copy:
        stats["ingest_copy_fallback"] = n_copy
    return files, stats, new_index


class MutateWorkspace:
    """A drain-scoped staging cache for :func:`manifest_mutate_cached`.

    The plain :func:`manifest_mutate` pays two O(#files) passes per
    call — materialize the whole current tree, then stat-walk it back
    into the pool — which measured 1.5× the hardlink-generation
    runner's whole-drain wall for streaming ingest (r13
    ``manifest_stream_ingest``).  A long-lived writer (a streaming
    drain) instead keeps ONE materialized tree between mutations and
    re-ingests only what each mutation touched; this object carries
    that tree plus the {rel: (inode, object)} index of the manifest it
    reflects.  It is a pure cache: any staleness (another writer
    published, our own plain-path mutation swept the tree, a crashed
    mutation dirtied it) is detected and answered with a fresh
    materialize, never with wrong bytes."""

    def __init__(self, root: str):
        self.root = root
        self.tree = os.path.join(root, f"_staging-{os.getpid()}")
        self.basis: str | None = None  # manifest name the tree reflects
        self.index: dict[str, tuple[int | None, str]] | None = None

    def invalidate(self) -> None:
        shutil.rmtree(self.tree, ignore_errors=True)
        self.basis = None
        self.index = None

    close = invalidate  # drop the tree when the drain finishes


def manifest_mutate_cached(
    root: str, mutate_fn: Callable[[str], None], ws: MutateWorkspace
) -> str:
    """:func:`manifest_mutate` for a long-lived writer: identical
    contract and crash windows (the pointer swap is still the single
    commit point; a crash before it leaves the previous generation
    serving and the workspace INVALIDATED, so the replay starts from a
    fresh materialize), but the staging tree persists across calls via
    ``ws`` and each call re-ingests only its delta — O(delta) link and
    stat work per mutation instead of O(#files) (r13 verdict ask #4).

    The workspace fast path engages only when the tree still reflects
    the CURRENT manifest (``ws.basis`` matches the pointer and the
    tree survived — our own plain-path mutations and ``_sweep_staging``
    may legitimately have destroyed it); anything else falls back to
    the fresh-materialize slow path.  The published manifest's stats
    carry ``ws_tree_reused`` (1 fast path / 0 fresh) so the cost model
    stays measurable (``tools/manifest_stream_experiment.py``)."""
    from mbai_gdb_spark.io import _writer_lock

    if os.path.abspath(ws.root) != os.path.abspath(root):
        raise ValueError(
            f"manifest_mutate_cached: workspace is scoped to {ws.root}, "
            f"not {root}"
        )
    with _writer_lock(root):
        cur = current_manifest_name(root)
        if cur is None:
            raise ValueError(
                f"manifest_mutate_cached: no published manifest at {root} "
                "— build one first (manifest_build)"
            )
        reused_tree = (
            ws.basis == cur
            and ws.index is not None
            and os.path.isdir(ws.tree)
        )
        n_copy = 0
        if not reused_tree:
            ws.invalidate()
            _sweep_staging(root, spare_own=False)  # we recreate our name
            prev_files = read_manifest(root, cur)["files"]
            os.makedirs(ws.tree)
            ws.index, n_copy = _materialize_indexed(root, prev_files, ws.tree)
        try:
            mutate_fn(ws.tree)
            files, stats, new_index = _ingest_tree_cached(
                root, ws.tree, ws.index or {}
            )
            stats["copy_fallback"] = n_copy
            stats["ws_tree_reused"] = 1 if reused_tree else 0
            if n_copy:
                warnings.warn(
                    f"indexman.manifest_mutate_cached({root}): {n_copy} "
                    "staged file(s) materialized by COPY (hardlink "
                    "refused) — inode reuse is defeated for them; see "
                    "the manifest's stats.copy_fallback",
                    RuntimeWarning,
                    stacklevel=2,
                )
            name = _write_manifest(root, files, stats)
            _publish(root, name)
        except BaseException:
            # The tree may hold a half-applied, unpublished mutation —
            # never reuse it (the replay re-materializes from the still
            # serving manifest).
            ws.invalidate()
            raise
        ws.basis = name
        ws.index = new_index
    return name


def manifest_view(root: str) -> str:
    """Absolute path of an immutable, probe-ready VIEW of the current
    generation — the tree named by the current manifest, materialized
    once per manifest under ``<root>/_views/<manifest>/`` and published
    by atomic directory rename (a crashed view build leaves only a temp
    directory).  Views hardlink immutable objects, so concurrent probes
    and later mutations never disturb them; on a real object store this
    layer is instead a manifest-aware reader (pass the manifest's file
    list straight to ``spark.read.parquet(*files)``)."""
    cur = current_manifest_name(root)
    if cur is None:
        raise ValueError(f"no published manifest at {root} — nothing to probe")
    view = os.path.join(root, "_views", cur[: -len(".json")])
    if os.path.isdir(view):
        return view
    files = read_manifest(root, cur)["files"]
    tmp = view + f".tmp-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    _materialize(root, files, tmp)
    os.makedirs(os.path.dirname(view), exist_ok=True)
    try:
        os.replace(tmp, view)  # atomic: a view is complete or absent
    except OSError:
        # lost a race to a concurrent prober that published the same
        # (identical, immutable) view — use theirs
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isdir(view):
            raise
    return view


# ---------------------------------------------------------------------------
# Layout wrappers: BM25 under the manifest backend — the same serving
# surface indexgen's bm25_gen_* exposes over hardlink generations, so a
# caller can swap backends without touching the bare-layout operators.
# ---------------------------------------------------------------------------


def bm25_man_build(docs, root: str, **kw) -> str:
    """Publish manifest 1 of a BM25 index (ops.text.bm25_index_persist
    kwargs pass through).  Returns the manifest name."""
    from mbai_gdb_spark.ops.text import bm25_index_persist

    return manifest_build(root, lambda p: bm25_index_persist(docs, p, **kw))


def bm25_man_append(docs, root: str, **kw) -> str:
    """O(delta) append published as a new manifest: unchanged posting
    files keep their object references by inode identity — only the
    delta's new part files and the rewritten ``_meta`` ingest."""
    from mbai_gdb_spark.ops.text import bm25_index_append

    return manifest_mutate(root, lambda p: bm25_index_append(docs, p, **kw))


def bm25_man_delete(docs, root: str, **kw) -> str:
    """Physical delete published as a new manifest (touched buckets
    rewritten in staging; untouched objects keep their references)."""
    from mbai_gdb_spark.ops.text import bm25_index_delete

    return manifest_mutate(root, lambda p: bm25_index_delete(docs, p, **kw))


def bm25_man_update(old_docs, new_docs, root: str, **kw) -> str:
    """FUSED document update (delete(old)+append(new) as ONE mutation,
    ops.text.bm25_index_update) published as a single new manifest —
    each touched bucket rewritten once, one pointer PUT."""
    from mbai_gdb_spark.ops.text import bm25_index_update

    return manifest_mutate(
        root, lambda p: bm25_index_update(old_docs, new_docs, p, **kw)
    )


def bm25_man_probe(spark, root: str, queries_df, **kw):
    """bm25_probe_persisted over the current manifest's immutable view
    — the serving path (on a real object store: a manifest-aware reader
    passing the file list straight to the parquet scan)."""
    from mbai_gdb_spark.ops.text import bm25_probe_persisted

    return bm25_probe_persisted(spark, manifest_view(root), queries_df, **kw)


def ivf_man_build(corpus, root: str, **kw) -> str:
    """Manifest 1 of a plain (raw-vector) IVF index."""
    from mbai_gdb_spark.ops.similarity import ivf_persist

    return manifest_build(root, lambda p: ivf_persist(corpus, p, **kw))


def ivf_man_append(vectors, root: str, **kw) -> str:
    """Frozen-centroid insert published as a new manifest."""
    from mbai_gdb_spark.ops.similarity import ivf_append

    return manifest_mutate(root, lambda p: ivf_append(vectors, p, **kw))


def ivf_man_delete(vectors, root: str, **kw) -> str:
    """Physical delete (stored-value-verified) as a new manifest."""
    from mbai_gdb_spark.ops.similarity import ivf_delete

    return manifest_mutate(root, lambda p: ivf_delete(vectors, p, **kw))


def ivf_man_update(old_vectors, new_vectors, root: str, **kw) -> str:
    """Fused raw-vector update as a single new manifest."""
    from mbai_gdb_spark.ops.similarity import ivf_update

    return manifest_mutate(
        root, lambda p: ivf_update(old_vectors, new_vectors, p, **kw)
    )


def ivf_man_probe(spark, root: str, queries, **kw):
    from mbai_gdb_spark.ops.similarity import ivf_probe_persisted

    return ivf_probe_persisted(spark, manifest_view(root), queries, **kw)


def ivfpq_man_build(corpus, root: str, **kw) -> str:
    """Manifest 1 of a residual IVF-PQ index."""
    from mbai_gdb_spark.ops.similarity import ivfpq_persist

    return manifest_build(root, lambda p: ivfpq_persist(corpus, p, **kw))


def ivfpq_man_append(vectors, root: str, **kw) -> str:
    """Frozen-quantizer insert published as a new manifest."""
    from mbai_gdb_spark.ops.similarity import ivfpq_append

    return manifest_mutate(root, lambda p: ivfpq_append(vectors, p, **kw))


def ivfpq_man_delete(vectors, root: str, **kw) -> str:
    """Physical delete (found-by-id in assigned lists) as a new
    manifest."""
    from mbai_gdb_spark.ops.similarity import ivfpq_delete

    return manifest_mutate(root, lambda p: ivfpq_delete(vectors, p, **kw))


def ivfpq_man_update(old_vectors, new_vectors, root: str, **kw) -> str:
    """Fused code update under frozen quantizers as a single new
    manifest."""
    from mbai_gdb_spark.ops.similarity import ivfpq_update

    return manifest_mutate(
        root, lambda p: ivfpq_update(old_vectors, new_vectors, p, **kw)
    )


def ivfpq_man_probe(spark, root: str, queries, **kw):
    from mbai_gdb_spark.ops.similarity import ivfpq_probe_persisted

    return ivfpq_probe_persisted(spark, manifest_view(root), queries, **kw)


def lsh_man_build(buckets, root: str, **kw) -> str:
    """Manifest 1 of a bucketed LSH near-dup index."""
    from mbai_gdb_spark.ops.dedup import lsh_index_persist_bucketed

    return manifest_build(
        root, lambda p: lsh_index_persist_bucketed(buckets, p, **kw)
    )


def lsh_man_append(buckets, root: str, **kw) -> str:
    """O(delta) bucket-row insert published as a new manifest."""
    from mbai_gdb_spark.ops.dedup import lsh_index_append_bucketed

    return manifest_mutate(
        root, lambda p: lsh_index_append_bucketed(buckets, p, **kw)
    )


def lsh_man_delete(buckets, root: str, **kw) -> str:
    """Physical delete (banding-verified) as a new manifest."""
    from mbai_gdb_spark.ops.dedup import lsh_index_delete_bucketed

    return manifest_mutate(
        root, lambda p: lsh_index_delete_bucketed(buckets, p, **kw)
    )


def lsh_man_update(old_buckets, new_buckets, root: str, **kw) -> str:
    """Fused banding update as a single new manifest."""
    from mbai_gdb_spark.ops.dedup import lsh_index_update_bucketed

    return manifest_mutate(
        root,
        lambda p: lsh_index_update_bucketed(old_buckets, new_buckets, p, **kw),
    )


def lsh_man_probe(spark, root: str, probe_buckets, **kw):
    from mbai_gdb_spark.ops.dedup import lsh_probe_bucketed

    return lsh_probe_bucketed(spark, probe_buckets, manifest_view(root), **kw)


def man_compact(
    spark, root: str, partition_col: str, max_files: int = 1
) -> list:
    """Compaction published as a new manifest — the manifest twin of
    :func:`indexgen.gen_compact`: ``io.compact_partitioned`` runs
    against a staging tree materialized from the current manifest, so
    probes (which read immutable per-manifest views) never observe a
    missing or partial partition directory.  Rewritten directories
    ingest as new objects; untouched directories keep their object
    references by inode identity — the mutation's pool growth is
    exactly the fragmented set it rewrote.

    The no-op pre-check reads the MANIFEST, not the filesystem: the
    manifest already lists every file of every partition directory, so
    an unfragmented index pays one small JSON read per tick, no
    materialization and no directory walk.  Returns the compacted
    partition values ([] for a no-op)."""
    from mbai_gdb_spark.io import compact_partitioned

    cur = current_manifest_name(root)
    if cur is None:
        raise ValueError(f"man_compact: no published manifest at {root}")
    files = read_manifest(root, cur)["files"]
    prefix = f"{partition_col}="
    counts: dict[str, int] = {}
    for rel in files:
        head, _, tail = rel.partition("/")
        if head.startswith(prefix) and tail.endswith(".parquet"):
            counts[head] = counts.get(head, 0) + 1
    if not any(v > max_files for v in counts.values()):
        return []
    done: list = []
    manifest_mutate(
        root,
        lambda p: done.extend(
            compact_partitioned(spark, p, partition_col, max_files)
        ),
    )
    return done


def prune_manifests(root: str, keep: int = 2) -> dict:
    """Retire old generations and garbage-collect the pool: keep the
    current manifest plus the ``keep - 1`` most recent others, remove
    the rest (and their views), then delete every object no surviving
    manifest references — including orphans from crashed ingests (and
    crashed writers' ``_staging-*`` residue).
    Returns {"manifests": [...removed...], "objects": n_removed}; when
    a LIVE foreign writer's staging tree is present the object-GC pass
    is deferred (``objects: 0`` plus a ``gc_deferred`` key naming the
    trees) — see :func:`_live_foreign_staging` — and so is retirement
    of any manifest numbered PAST the current pointer (advice r13: the
    live writer may have written-but-not-yet-published it; a
    ``retire_deferred`` key names the spared manifests).

    Runs under the root's writer intent lock (advice find): GC decides
    liveness from the manifest listing + pointer, so racing an
    in-flight ``manifest_mutate`` (manifest written, pointer not yet
    swapped) would collect the about-to-be-published manifest and its
    objects — ``_current`` would then name a deleted manifest.  The
    lock serializes prune with mutations; probes stay lock-free (they
    read via views that hardlink immutable objects)."""
    from mbai_gdb_spark.io import _writer_lock

    with _writer_lock(root):
        return _prune_manifests_locked(root, keep)


def _prune_manifests_locked(root: str, keep: int) -> dict:
    # spare_own: a live drain's mutate workspace lives at our pid's
    # staging name BETWEEN batches (manifest_mutate_cached) — pruning
    # after each batch must not destroy it, or every batch pays a full
    # re-materialize and the workspace optimization is a no-op.
    _sweep_staging(root, spare_own=True)
    # Crashed writers' pid-keyed manifest tmp files (one small JSON per
    # crashed pid) — same liveness discipline as the staging sweep.
    mdir = _manifests_dir(root)
    if os.path.isdir(mdir):
        for nm in os.listdir(mdir):
            if not nm.startswith(".tmp-"):
                continue
            pid_part = nm[len(".tmp-"):]
            if pid_part.isdigit() and int(pid_part) != os.getpid():
                try:
                    os.kill(int(pid_part), 0)
                    continue  # alive: mid-publish, not residue
                except ProcessLookupError:
                    pass
                except OSError:
                    continue
                try:
                    os.remove(os.path.join(mdir, nm))
                except OSError:
                    pass
    # Liveness-aware GC gate (advice find, mirroring the sweep's own
    # fix): a writer that overran the lock's stale_after and lost it to
    # a takeover may be mid-_ingest_tree RIGHT NOW — its freshly moved
    # pool objects are not yet referenced by any manifest, so the
    # unreferenced-object GC below would delete them and the writer's
    # subsequently published manifest would name missing objects.  If
    # the sweep spared any live (or unknowable) foreign staging tree,
    # the object-GC pass is DEFERRED to a later prune; manifest/view
    # retirement is still safe (the live writer only reads the current
    # manifest's objects, which GC never touches).
    live_staging = _live_foreign_staging(root)
    cur = current_manifest_name(root)
    mans = list_manifests(root)
    if cur is None or cur not in mans:
        return {"manifests": [], "objects": 0}
    keep_set = {cur}
    older = [n for n in mans if _num(_MAN_RE, n) < _num(_MAN_RE, cur)]
    keep_set.update(older[-max(keep - 1, 0):] if keep > 1 else [])
    cur_num = _num(_MAN_RE, cur)
    removed = []
    retire_deferred = []
    for n in mans:
        if n in keep_set:
            continue
        if live_staging and _num(_MAN_RE, n) > cur_num:
            # A live overrunning writer may have just _write_manifest'ed
            # this (numbered past the pointer) and not yet published it;
            # its staging tree persists through that window, so the
            # live-staging signal covers it.  Retiring it now would make
            # the writer's _publish point _current at a deleted file,
            # breaking every probe — defer, like the object-GC pass.
            retire_deferred.append(n)
            continue
        os.remove(os.path.join(_manifests_dir(root), n))
        shutil.rmtree(
            os.path.join(root, "_views", n[: -len(".json")]),
            ignore_errors=True,
        )
        removed.append(n)
    if live_staging:
        warnings.warn(
            f"indexman.prune_manifests({root}): object GC deferred — "
            f"live foreign staging present ({', '.join(live_staging)}); "
            "an overrunning writer may be mid-ingest and its new objects "
            "are not yet manifest-referenced.  Re-run prune after it "
            "finishes (or dies) to reclaim the pool.",
            RuntimeWarning,
            stacklevel=3,
        )
        out = {
            "manifests": removed,
            "objects": 0,
            "gc_deferred": list(live_staging),
        }
        if retire_deferred:
            out["retire_deferred"] = retire_deferred
        return out
    referenced = set()
    for n in keep_set:
        referenced.update(read_manifest(root, n)["files"].values())
    obj_dir = _objects_dir(root)
    n_obj = 0
    if os.path.isdir(obj_dir):
        for o in os.listdir(obj_dir):
            if _OBJ_RE.fullmatch(o) and o not in referenced:
                os.remove(os.path.join(obj_dir, o))
                n_obj += 1
    return {"manifests": removed, "objects": n_obj}
