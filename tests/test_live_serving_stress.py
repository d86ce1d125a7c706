"""Live reader/writer stress for the serving tier (r12 verdict ask #4).

The two-process test in tests/test_indexgen.py proves writer EXCLUSION;
this one probes CONTINUOUSLY from a second process while a writer
publishes a stream of generations/manifests, asserting every observed
probe snapshot equals some published generation's exact content — no
torn reads, no partially-visible publishes, no pointer moving backward.

Both backends run the same protocol over a spark-free layout (the
backends are byte movers; Spark adds nothing to the atomicity question
and would add seconds per probe, hiding the races this test hunts):

- generation/manifest ``i`` consists of K files ``part-j`` each holding
  the deterministic string ``{i}|{j}|<pad>`` — a consistent snapshot is
  therefore a pure function of one version number, so "equals some
  published generation's exact results" reduces to "all K files carry
  the SAME version";
- the writer rewrites ALL K files per publish (maximum contention: any
  non-atomic visibility would mix versions) and prunes to keep=3 after
  each one;
- the reader loops lock-free: resolve the pointer, read all K files,
  classify.  MIXED versions, a missing file while the resolved
  generation is still listed, or a version going BACKWARD are
  violations; an unreadable tree whose generation was PRUNED mid-read
  is discarded (the documented keep>=2 contract is that a probe's
  generation outlives the batch that superseded it — a probe outliving
  TWO publishes raced the history bound, not the commit protocol).

Writer-side mutation uses tmp + os.replace per file — the same
byte-immutability discipline every real mutation obeys (a hardlink
clone/staging tree must never be written through in place).
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_K = 8  # files per generation
_N = 30  # generations published by the writer
_PAD = "x" * 100


def _write_version(tree: str, version: int) -> None:
    for j in range(_K):
        path = os.path.join(tree, f"part-{j}")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{version}|{j}|{_PAD}")
        os.replace(tmp, path)


_READER = r"""
import os, sys, time
sys.path.insert(0, %(repo)r)
backend = %(backend)r
root = %(root)r
done_flag = %(done)r

if backend == "gen":
    from mbai_gdb_spark import indexgen as B

    def resolve():
        cur = B.current_generation(root)
        return (cur, cur)  # (identity, readable tree)

    def still_published(ident):
        return os.path.basename(ident) in B.list_generations(root)
else:
    from mbai_gdb_spark import indexman as B

    def resolve():
        cur = B.current_manifest_name(root)
        if cur is None:
            return (None, None)
        try:
            view = B.manifest_view(root)
        except (ValueError, FileNotFoundError, OSError):
            return (cur, None)  # raced a prune mid-materialize
        return (cur, view)

    def still_published(ident):
        return ident in B.list_manifests(root)

print("READY", flush=True)
probes = 0
versions = set()
last = -1
K = %(k)d
while not os.path.exists(done_flag) or probes == 0:
    ident, tree = resolve()
    if ident is None:
        continue
    if tree is None:
        if still_published(ident):
            print("VIOLATION unreadable-current", ident, flush=True)
            break
        continue  # pruned under us: discard
    try:
        names = sorted(
            n for n in os.listdir(tree) if n.startswith("part-")
        )
        contents = []
        for n in names:
            with open(os.path.join(tree, n)) as f:
                contents.append(f.read())
    except OSError:
        if still_published(ident):
            print("VIOLATION vanished-while-published", ident, flush=True)
            break
        continue  # raced a prune of a superseded generation: discard
    if len(names) != K:
        if still_published(ident):
            print("VIOLATION wrong-file-count", ident, len(names), flush=True)
            break
        continue
    vers = set()
    ok = True
    for n, c in zip(names, contents):
        parts = c.split("|")
        if len(parts) != 3 or parts[1] != n[len("part-"):]:
            print("VIOLATION corrupt-content", ident, n, c[:40], flush=True)
            ok = False
            break
        vers.add(int(parts[0]))
    if not ok:
        break
    if len(vers) != 1:
        print("VIOLATION mixed-versions", ident, sorted(vers), flush=True)
        break
    v = vers.pop()
    if v < last:
        print("VIOLATION backward", last, "->", v, flush=True)
        break
    last = v
    probes += 1
    versions.add(v)
else:
    print("DONE probes=%%d versions=%%d" %% (probes, len(versions)), flush=True)
    sys.exit(0)
sys.exit(1)
"""


def _run_stress(tmp_path, backend: str):
    root = str(tmp_path / "root")
    done_flag = str(tmp_path / "writer_done")

    if backend == "gen":
        from mbai_gdb_spark import indexgen as B

        build = B.generation_build
        mutate = B.generation_mutate
        prune = lambda: B.prune_generations(root, keep=3)  # noqa: E731
    else:
        from mbai_gdb_spark import indexman as B

        build = B.manifest_build
        mutate = B.manifest_mutate
        prune = lambda: B.prune_manifests(root, keep=3)  # noqa: E731

    build(root, lambda p: _write_version(p, 1))

    code = _READER % {
        "repo": _REPO,
        "backend": backend,
        "root": root,
        "done": done_flag,
        "k": _K,
    }
    reader = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )
    try:
        assert reader.stdout.readline().strip() == "READY"
        for i in range(2, _N + 1):
            mutate(root, lambda p, v=i: _write_version(p, v))
            prune()
            time.sleep(0.01)  # give the reader interleaving room
        with open(done_flag, "w"):
            pass
        out, err = reader.communicate(timeout=120)
    except BaseException:
        reader.kill()
        raise
    out = "READY\n" + out
    assert reader.returncode == 0, (out, err)
    last = [ln for ln in out.splitlines() if ln.startswith("DONE")]
    assert last, (out, err)
    probes = int(last[0].split("probes=")[1].split()[0])
    versions = int(last[0].split("versions=")[1])
    # The probe loop genuinely interleaved with the publish stream.
    assert probes >= 10, out
    assert versions >= 3, out
    assert "VIOLATION" not in out


def test_live_probes_never_torn_hardlink_backend(tmp_path):
    _run_stress(tmp_path, "gen")


def test_live_probes_never_torn_manifest_backend(tmp_path):
    _run_stress(tmp_path, "man")
