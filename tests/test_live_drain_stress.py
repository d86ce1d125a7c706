"""Live reader/writer stress THROUGHOUT a streaming drain (r13 verdict
ask #6).

tests/test_live_serving_stress.py probes lock-free during N discrete
publishes; the streaming appliers publish through the same primitives
but with compaction ticks interleaved and keep=2 pruning after every
batch — this test probes from a second (spark-free) process for the
WHOLE of ``run_streaming_bm25_{manifests,generations}_available_now``
and asserts every observed snapshot is a complete single-version tree:

- the current manifest resolves and parses, every object it references
  exists in the pool, and its file list carries both the layout's
  ``_meta`` completeness tree and the exactly-once ``_gen_tag`` —
  while the manifest is still listed (a prune racing the read is
  discarded by the same keep>=2 discipline as the r12 stress);
- the hardlink-generation tree likewise holds ``_meta`` + ``_gen_tag``
  and every listed file stays readable while the generation is listed;
- the ``_gen_tag`` batch id never goes BACKWARD across observations
  (compaction re-publishes the same tag; appends increase it).
"""

from __future__ import annotations

import os
import subprocess
import sys

from mbai_gdb_spark.io import read_table

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

_READER = r"""
import json, os, sys
sys.path.insert(0, %(repo)r)
backend = %(backend)r
root = %(root)r
done_flag = %(done)r

from mbai_gdb_spark import indexman as M
from mbai_gdb_spark import indexgen as G

print("READY", flush=True)
probes = 0
tags = set()
last_tag = -1
violations = []


def observe_man():
    cur = M.current_manifest_name(root)
    if cur is None:
        return None
    try:
        man = M.read_manifest(root, cur)
    except (OSError, ValueError):
        if cur in M.list_manifests(root):
            return ("VIOLATION unreadable-current-manifest", cur)
        return None  # pruned under us
    files = man["files"]
    missing = [
        (rel, obj)
        for rel, obj in files.items()
        if not os.path.exists(os.path.join(root, "_objects", obj))
    ]
    if missing:
        if cur in M.list_manifests(root):
            return ("VIOLATION missing-objects", cur, missing[:3])
        return None
    rels = set(files)
    if "_gen_tag" not in rels or not any(r.startswith("_meta") for r in rels):
        if cur in M.list_manifests(root):
            return ("VIOLATION incomplete-tree", cur, sorted(rels)[:5])
        return None
    try:
        with open(os.path.join(root, "_objects", files["_gen_tag"])) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        if cur in M.list_manifests(root):
            return ("VIOLATION unreadable-tag", cur)
        return None


def observe_gen():
    tree = G.current_generation(root)
    if tree is None:
        return None
    name = os.path.basename(tree)

    def listed():
        return name in G.list_generations(root)

    try:
        entries = set(os.listdir(tree))
    except OSError:
        return ("VIOLATION vanished-current-generation", name) if listed() \
            else None
    if "_gen_tag" not in entries or "_meta" not in entries:
        return ("VIOLATION incomplete-tree", name, sorted(entries)[:5]) \
            if listed() else None
    try:
        with open(os.path.join(tree, "_gen_tag")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return ("VIOLATION unreadable-tag", name) if listed() else None


observe = observe_man if backend == "man" else observe_gen

while not os.path.exists(done_flag) or probes == 0:
    got = observe()
    if got is None:
        continue
    if isinstance(got, tuple):
        print(*got, flush=True)
        sys.exit(1)
    if got < last_tag:
        print("VIOLATION tag-backward", last_tag, "->", got, flush=True)
        sys.exit(1)
    last_tag = got
    tags.add(got)
    probes += 1

print("DONE probes=%%d tags=%%d" %% (probes, len(tags)), flush=True)
sys.exit(0)
"""


def _run_drain_stress(spark, tmp_path, backend: str):
    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    src = str(tmp_path / "feed")
    docs.repartition(8).write.parquet(src)
    root = str(tmp_path / "root")

    code = _READER % {
        "repo": _REPO,
        "backend": backend,
        "root": root,
        "done": str(tmp_path / "writer_done"),
    }
    reader = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        assert reader.stdout.readline().strip() == "READY"
        if backend == "man":
            from mbai_gdb_spark.streaming.search import (
                run_streaming_bm25_manifests_available_now as run,
            )

            run(
                spark, src, docs.schema, root, n_buckets=16,
                compact_every=3, keep_manifests=2, lock_patience=30.0,
            )
        else:
            from mbai_gdb_spark.streaming.search import (
                run_streaming_bm25_generations_available_now as run,
            )

            run(
                spark, src, docs.schema, root, n_buckets=16,
                compact_every=3, keep_generations=2, lock_patience=30.0,
            )
        with open(str(tmp_path / "writer_done"), "w"):
            pass
        out, err = reader.communicate(timeout=180)
    except BaseException:
        reader.kill()
        raise
    assert reader.returncode == 0, (out, err)
    done = [ln for ln in out.splitlines() if ln.startswith("DONE")]
    assert done and "VIOLATION" not in out, (out, err)
    probes = int(done[0].split("probes=")[1].split()[0])
    tags = int(done[0].split("tags=")[1])
    assert probes >= 10, out  # the loop genuinely interleaved
    assert tags >= 3, out  # across several distinct batch publishes


def test_drain_probes_never_torn_manifest_backend(spark, tmp_path):
    _run_drain_stress(spark, tmp_path, "man")


def test_drain_probes_never_torn_generation_backend(spark, tmp_path):
    _run_drain_stress(spark, tmp_path, "gen")
