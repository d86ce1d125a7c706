"""Round-14 regressions for the r13 ADVICE findings (+ verdict ask #3).

1. (medium) ``prune_manifests`` under LIVE foreign staging: manifest
   retirement must not remove manifests numbered HIGHER than the
   current pointer — a live overrunning writer may have just
   ``_write_manifest``'ed one and not yet pointer-published it (its
   staging tree persists through that window), and retiring it would
   make the writer's ``_publish`` point ``_current`` at a deleted file.
2. (low) the streaming compaction-tick wrappers run the tick body
   under ``lock_patience`` — a takedown/prune landing exactly on a
   tick used to kill a patient drain with ConcurrentWriteError.
3. (low) ``bench._auto_isolate_movers`` sorts on the UNROUNDED ratio —
   ``round(r, 2) == 0.0`` for an extreme apparent speedup used to
   raise ZeroDivisionError in the sort key at the end of the battery.
4. (verdict ask #3) auto-isolation is TIME-bounded, not count-capped:
   every flagged mover is either isolated or returned with an explicit
   skip reason; the worst mover always runs.
"""

from __future__ import annotations

import os
import types

import pytest

import bench
from mbai_gdb_spark import indexman as M
from mbai_gdb_spark.io import ConcurrentWriteError
from mbai_gdb_spark.streaming.search import (
    _with_gen_compaction_tick,
    _with_man_compaction_tick,
)

# ---------------------------------------------------------------------------
# 1. retirement defers for newer-than-current manifests under live staging
# ---------------------------------------------------------------------------


def _plain_build(root: str, names=("bucket=0/part-a", "_meta/scalars")):
    def build(p):
        for rel in names:
            out = os.path.join(p, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            with open(out, "w") as f:
                f.write(f"bytes of {rel}")

    return M.manifest_build(root, build)


def _fake_unpublished_manifest(root: str, name: str) -> str:
    """Simulate a live overrunning writer between _write_manifest and
    _publish: a valid manifest file numbered past the pointer."""
    path = os.path.join(root, "_manifests", name)
    with open(path, "w") as f:
        f.write('{"files": {}}')
    return path


def test_prune_defers_retirement_of_unpublished_newer_manifest(tmp_path):
    root = str(tmp_path / "man")
    _plain_build(root)
    M.manifest_mutate(root, lambda p: open(os.path.join(p, "x"), "w").close())
    cur = M.current_manifest_name(root)  # man-000002.json
    newer = _fake_unpublished_manifest(root, "man-000003.json")
    os.makedirs(os.path.join(root, "_staging-1"))  # pid 1 is always alive
    with pytest.warns(RuntimeWarning, match="deferred"):
        res = M.prune_manifests(root, keep=1)
    # older manifests retired as usual; the unpublished newer one spared
    assert "man-000001.json" in res["manifests"]
    assert res["retire_deferred"] == ["man-000003.json"]
    assert os.path.exists(newer)
    # the live writer's subsequent _publish would now point at a file
    # that still exists — the probe-breaking window is closed
    assert M.current_manifest_name(root) == cur
    assert "man-000003.json" in M.list_manifests(root)


def test_prune_still_retires_newer_orphan_when_no_live_staging(tmp_path):
    # Without live staging the higher-numbered manifest is dead residue
    # (a crashed writer's _sweep_staging-collected leftovers) and the
    # normal retirement path reclaims it.
    root = str(tmp_path / "man")
    _plain_build(root)
    M.manifest_mutate(root, lambda p: open(os.path.join(p, "x"), "w").close())
    newer = _fake_unpublished_manifest(root, "man-000003.json")
    res = M.prune_manifests(root, keep=1)
    assert "man-000003.json" in res["manifests"]
    assert "retire_deferred" not in res
    assert not os.path.exists(newer)


def test_prune_retire_deferral_clears_after_writer_finishes(tmp_path):
    root = str(tmp_path / "man")
    _plain_build(root)
    M.manifest_mutate(root, lambda p: open(os.path.join(p, "x"), "w").close())
    _fake_unpublished_manifest(root, "man-000003.json")
    live = os.path.join(root, "_staging-1")
    os.makedirs(live)
    with pytest.warns(RuntimeWarning, match="deferred"):
        M.prune_manifests(root, keep=1)
    os.rmdir(live)  # writer finished (or died and was swept)
    res = M.prune_manifests(root, keep=1)
    assert "man-000003.json" in res["manifests"]
    assert "retire_deferred" not in res


# ---------------------------------------------------------------------------
# 2. compaction ticks honor lock_patience
# ---------------------------------------------------------------------------


class _FlakyCompact:
    """Raises ConcurrentWriteError ``fail_n`` times, then succeeds."""

    def __init__(self, fail_n: int):
        self.fail_n = fail_n
        self.calls = 0
        self.succeeded = False

    def __call__(self, *a, **kw):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise ConcurrentWriteError("lock held by takedown")
        self.succeeded = True


_FAKE_BATCH = types.SimpleNamespace(sparkSession=None)


def test_man_compaction_tick_waits_out_transient_lock(tmp_path, monkeypatch):
    root = str(tmp_path / "man")
    _plain_build(root)
    flaky = _FlakyCompact(fail_n=2)
    monkeypatch.setattr(M, "man_compact", flaky)
    tick = _with_man_compaction_tick(
        lambda df, bid: None, root, "bucket", every=1, lock_patience=5.0
    )
    tick(_FAKE_BATCH, 0)  # must not raise: patience outlasts 2 refusals
    assert flaky.succeeded and flaky.calls == 3


def test_man_compaction_tick_still_fails_fast_without_patience(
    tmp_path, monkeypatch
):
    root = str(tmp_path / "man")
    _plain_build(root)
    flaky = _FlakyCompact(fail_n=1)
    monkeypatch.setattr(M, "man_compact", flaky)
    tick = _with_man_compaction_tick(
        lambda df, bid: None, root, "bucket", every=1
    )
    with pytest.raises(ConcurrentWriteError):
        tick(_FAKE_BATCH, 0)


def test_gen_compaction_tick_waits_out_transient_lock(monkeypatch):
    from mbai_gdb_spark import indexgen as G

    flaky = _FlakyCompact(fail_n=2)
    monkeypatch.setattr(G, "gen_compact", flaky)
    monkeypatch.setattr(G, "current_generation", lambda root: "gen-000001")
    tick = _with_gen_compaction_tick(
        lambda df, bid: None, "/nonexistent", "bucket", every=1,
        lock_patience=5.0,
    )
    tick(_FAKE_BATCH, 0)
    assert flaky.succeeded and flaky.calls == 3


# ---------------------------------------------------------------------------
# 3. extreme apparent speedup never crashes the sort
# ---------------------------------------------------------------------------


def _patch_prev(monkeypatch, queries: dict):
    monkeypatch.delenv("SPARK_GRAFT_NO_AUTOISOLATE", raising=False)
    monkeypatch.setattr(
        bench, "_previous_full_battery", lambda repo: {"sf": 0.1,
                                                       "queries": queries}
    )


def _capture_isolated(monkeypatch):
    captured: dict = {}

    def fake(names, runs, sf_dir):
        captured["names"] = list(names)
        return {n: {"cold": [0.0], "warm": [0.0]} for n in names}

    monkeypatch.setattr(bench, "_run_isolated", fake)
    return captured


def test_auto_isolate_survives_ratio_rounding_to_zero(monkeypatch):
    _patch_prev(monkeypatch, {"q": 10.0})
    captured = _capture_isolated(monkeypatch)
    # r = 1e-4: round(r, 2) == 0.0 — the old sort key divided by it
    ratios, isolated, skipped = bench._auto_isolate_movers(
        {"q": 0.001}, "/root/testdata/sf0.1"
    )
    assert ratios == {"q": 0.0}  # display rounding preserved
    assert captured["names"] == ["q"] and set(isolated) == {"q"}
    assert skipped == {}


# ---------------------------------------------------------------------------
# 4. time-bounded adjudication: isolate-or-name-it, never silent
# ---------------------------------------------------------------------------


def test_auto_isolate_budget_names_every_unadjudicated_mover(monkeypatch):
    n = 20
    _patch_prev(monkeypatch, {f"m{i:02d}": 10.0 for i in range(n)})
    captured = _capture_isolated(monkeypatch)
    timings = {f"m{i:02d}": 25.0 + i * 0.01 for i in range(n)}
    # est per mover = 3 * (25 + 2*~25) ≈ 225s → budget 500 fits 2
    ratios, isolated, skipped = bench._auto_isolate_movers(
        timings, "/root/testdata/sf0.1", budget_s=500.0
    )
    assert len(ratios) == n  # every mover named in the record
    assert len(captured["names"]) == 2
    assert set(skipped) == set(ratios) - set(captured["names"])
    for reason in skipped.values():
        assert "budget exhausted" in reason
    # worst movers ran first (exact ratios, not the display rounding:
    # m19 deviates most under the +i*0.01 ramp)
    assert captured["names"] == ["m19", "m18"]


def test_auto_isolate_worst_mover_always_runs(monkeypatch):
    _patch_prev(monkeypatch, {"huge": 100.0})
    captured = _capture_isolated(monkeypatch)
    ratios, isolated, skipped = bench._auto_isolate_movers(
        {"huge": 400.0}, "/root/testdata/sf0.1", budget_s=1.0
    )
    assert captured["names"] == ["huge"] and skipped == {}


def test_auto_isolate_default_budget_covers_a_20_mover_session(monkeypatch):
    # The r13 driver session flagged 20 movers (~2s each): the default
    # budget must adjudicate ALL of them — that session's truncation is
    # the bug this ask fixes.
    n = 20
    _patch_prev(monkeypatch, {f"m{i:02d}": 2.0 for i in range(n)})
    captured = _capture_isolated(monkeypatch)
    timings = {f"m{i:02d}": 4.0 for i in range(n)}
    ratios, isolated, skipped = bench._auto_isolate_movers(
        timings, "/root/testdata/sf0.1"
    )
    assert len(captured["names"]) == n and skipped == {}
