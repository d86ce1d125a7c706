"""Round-13 regressions for the r12 ADVICE findings.

1. prune_manifests defers the unreferenced-object GC pass when a LIVE
   foreign writer's ``_staging-*`` tree is present — under a stale-lock
   takeover that writer may be mid-``_ingest_tree``, and its freshly
   moved (not-yet-referenced) objects must not be collected out from
   under the manifest it is about to publish.
2. ``bench._persist_full_battery``'s evidence carry survives a
   MALFORMED prior BENCH_full file (e.g. ``isolated`` not a dict) —
   a TypeError there used to crash the battery's final persist after a
   multi-hour run.
3. ``bench._auto_isolate_movers`` flags apparent SPEEDUPS (r < 1/1.3)
   for fresh-JVM re-measure exactly like slowdowns — session drift is
   direction-agnostic, and an unadjudicated speedup reads as a fake
   improvement.
4. (prose) the ``_takedown_oracle`` LSH docstring now scopes its
   no-taken-down-doc claim to INDEXED (survivor-side) content — batch
   docs were never indexed and legitimately keep probing.
"""

from __future__ import annotations

import json
import os

import pytest

import bench
from mbai_gdb_spark import indexman as M

# ---------------------------------------------------------------------------
# 1. object GC defers under live foreign staging
# ---------------------------------------------------------------------------


def _plain_build(root: str, names=("bucket=0/part-a", "_meta/scalars")):
    """A spark-free manifest build: the backend only moves bytes."""

    def build(p):
        for rel in names:
            out = os.path.join(p, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(f"bytes of {rel}")

    return M.manifest_build(root, build)


def test_prune_defers_object_gc_under_live_foreign_staging(tmp_path):
    root = str(tmp_path / "man")
    _plain_build(root)
    M.manifest_mutate(root, lambda p: open(os.path.join(p, "extra"), "w").close())
    # a crashed ingest's orphan object: referenced by no manifest
    orphan = os.path.join(root, "_objects", "obj-99999999")
    with open(orphan, "w") as f:
        f.write("mid-ingest bytes of a live writer")
    live = os.path.join(root, "_staging-1")  # pid 1 is always alive
    os.makedirs(live)
    with pytest.warns(RuntimeWarning, match="object GC deferred"):
        res = M.prune_manifests(root, keep=1)
    # manifest retirement still happened; object GC stood down
    assert res["manifests"] and res["objects"] == 0
    assert res["gc_deferred"] == ["_staging-1"]
    assert os.path.exists(orphan)
    # the served index is intact
    assert M.current_manifest_name(root) in M.list_manifests(root)
    # writer finished (staging gone): the next prune reclaims the pool
    os.rmdir(live)
    res2 = M.prune_manifests(root, keep=1)
    assert "gc_deferred" not in res2
    assert res2["objects"] >= 1
    assert not os.path.exists(orphan)


def test_unknowable_pid_staging_also_defers_gc(tmp_path, monkeypatch):
    root = str(tmp_path / "man")
    _plain_build(root)

    real_kill = os.kill

    def eperm_kill(pid, sig):
        if pid == 4242:
            raise PermissionError("simulated foreign-uid probe")
        return real_kill(pid, sig)

    monkeypatch.setattr(M.os, "kill", eperm_kill)
    os.makedirs(os.path.join(root, "_staging-4242"))
    with pytest.warns(RuntimeWarning, match="deferred"):
        res = M.prune_manifests(root, keep=1)
    assert res["gc_deferred"] == ["_staging-4242"]


def test_prune_gc_still_collects_when_no_live_staging(tmp_path):
    root = str(tmp_path / "man")
    _plain_build(root)
    M.manifest_mutate(root, lambda p: open(os.path.join(p, "extra"), "w").close())
    orphan = os.path.join(root, "_objects", "obj-99999998")
    with open(orphan, "w") as f:
        f.write("dead orphan")
    res = M.prune_manifests(root, keep=1)
    assert "gc_deferred" not in res
    assert not os.path.exists(orphan)


# ---------------------------------------------------------------------------
# 2. battery persist survives a malformed prior BENCH_full
# ---------------------------------------------------------------------------


def test_persist_full_battery_survives_malformed_prior(tmp_path, monkeypatch):
    target = str(tmp_path / "BENCH_full_rXX.json")
    with open(target, "w") as f:
        json.dump({"isolated": "oops-not-a-dict", "queries": {"q": 1.0}}, f)
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", target)
    out = {"metric": "t", "value": 1.0, "queries": {"q": 2.0},
           "isolated": {"q": {"warm": [1.0]}}}
    bench._persist_full_battery(out)  # must not raise
    with open(target) as f:
        written = json.load(f)
    assert written["queries"] == {"q": 2.0}
    assert written["isolated"] == {"q": {"warm": [1.0]}}


# ---------------------------------------------------------------------------
# 3. auto-isolation flags speedups too
# ---------------------------------------------------------------------------


def test_auto_isolate_flags_speedups_and_slowdowns(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_NO_AUTOISOLATE", raising=False)
    monkeypatch.setattr(
        bench,
        "_previous_full_battery",
        lambda repo: {"sf": 0.1, "queries": {"slow": 10.0, "fast": 10.0,
                                             "flat": 10.0}},
    )
    captured: dict = {}

    def fake_isolated(names, runs, sf_dir):
        captured["names"] = list(names)
        return {n: {"cold": [0.0], "warm": [0.0]} for n in names}

    monkeypatch.setattr(bench, "_run_isolated", fake_isolated)
    timings = {"slow": 25.0, "fast": 4.0, "flat": 10.5}
    ratios, isolated, _skipped = bench._auto_isolate_movers(
        timings, "/root/testdata/sf0.1"
    )
    assert ratios == {"slow": 2.5, "fast": 0.4}
    # both directions re-measured, worst deviation first
    assert captured["names"] == ["slow", "fast"]
    assert set(isolated) == {"slow", "fast"}


# ---------------------------------------------------------------------------
# 4. the takedown-oracle docstring scopes its claim to indexed content
# ---------------------------------------------------------------------------


def test_takedown_oracle_docstring_scoped():
    from mbai_gdb_spark import queries_north as QN

    doc = QN._takedown_oracle.__doc__
    assert "survivor" in doc and "never indexed" in doc
    assert "no pair may name a taken-down doc;" not in doc


# ---------------------------------------------------------------------------
# 5. (r13 self-review) no-clobber object/manifest allocation under the
#    stale-takeover two-live-writers race
# ---------------------------------------------------------------------------


def test_ingest_never_clobbers_concurrently_claimed_object(tmp_path):
    """A stale-lock-takeover survivor mid-ingest may claim max+1 pool
    names concurrently with the lock holder; allocation must FAIL on
    collision and take the next number — never overwrite.  Simulated by
    pre-planting the exact object name the next ingest would pick."""
    root = str(tmp_path / "man")
    _plain_build(root)
    obj_dir = os.path.join(root, "_objects")
    taken = sorted(os.listdir(obj_dir))
    nxt = 1 + max(int(n.split("-")[1]) for n in taken)
    planted = os.path.join(obj_dir, "obj-%08d" % nxt)
    with open(planted, "w") as f:
        f.write("foreign writer's bytes — must survive")
    M.manifest_mutate(
        root, lambda p: open(os.path.join(p, "extra"), "w").close()
    )
    with open(planted) as f:
        assert f.read() == "foreign writer's bytes — must survive"
    # the mutation's new file landed under a HIGHER number
    files = M.read_manifest(root, M.current_manifest_name(root))["files"]
    assert files["extra"] != "obj-%08d" % nxt
    with open(os.path.join(obj_dir, files["extra"])) as f:
        assert f.read() == ""


def test_manifest_write_never_clobbers_concurrent_manifest(tmp_path):
    root = str(tmp_path / "man")
    _plain_build(root)
    mdir = os.path.join(root, "_manifests")
    planted = os.path.join(mdir, "man-000002.json")
    with open(planted, "w") as f:
        f.write('{"files": {}, "note": "foreign manifest - must survive"}')
    name = M.manifest_mutate(
        root, lambda p: open(os.path.join(p, "extra"), "w").close()
    )
    assert name == "man-000003.json"
    with open(planted) as f:
        assert "must survive" in f.read()


def test_prune_sweeps_dead_writers_manifest_tmp(tmp_path):
    root = str(tmp_path / "man")
    _plain_build(root)
    mdir = os.path.join(root, "_manifests")
    dead = os.path.join(mdir, ".tmp-99999999")
    live = os.path.join(mdir, ".tmp-1")
    for p in (dead, live):
        with open(p, "w") as f:
            f.write("{}")
    M.prune_manifests(root, keep=1)
    assert not os.path.exists(dead)
    assert os.path.exists(live)  # alive pid: mid-publish, spared
    # tmp files never surface as manifests
    assert all(n.startswith("man-") for n in M.list_manifests(root))
