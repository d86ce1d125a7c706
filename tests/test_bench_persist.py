"""Battery persist/carry semantics (round 12): a battery rewrite must
not drop evidence attached to the round's BENCH_full file by earlier
runs — isolated drift verdicts (now produced by BOTH builder and driver
runs via auto-isolation, so they merge per name), compaction probes,
experiment records (lsh_delete_vs_rebuild_*), and *_note adjudications.
Only the battery's own per-run keys (queries, scale_guard, sf1, ...)
are replaced."""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _load_bench(tmp_path, monkeypatch):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    monkeypatch.setenv(
        "SPARK_GRAFT_BENCH_FULL", str(tmp_path / "BENCH_full_test.json")
    )
    return mod, str(tmp_path / "BENCH_full_test.json")


def test_rewrite_preserves_evidence_and_merges_isolated(
    tmp_path, monkeypatch
):
    bench, path = _load_bench(tmp_path, monkeypatch)
    first = {
        "metric": "headline_queries_total",
        "value": 100.0,
        "queries": {"a": 1.0},
        "sf1": {"max_wall_ratio": 2.0},
        "isolated": {
            "q_old": {"cold": [1.0], "warm": [0.5]},
            "q_both": {"cold": [9.0], "warm": [9.0]},
        },
        "isolated_note": "builder adjudication: drift",
        "lsh_delete_vs_rebuild_sf1_x100": {"rebuild_over_delete": 5.02},
        "compaction": {"probe_before": [1.0]},
    }
    bench._persist_full_battery(first)
    second = {
        "metric": "headline_queries_total",
        "value": 90.0,
        "queries": {"a": 0.9},
        "isolated": {"q_both": {"cold": [2.0], "warm": [1.0]}},
    }
    bench._persist_full_battery(second)
    got = json.load(open(path))
    # per-run keys replaced
    assert got["value"] == 90.0 and got["queries"] == {"a": 0.9}
    assert "sf1" not in got  # this run measured no sf1 tier
    # evidence carried
    assert got["lsh_delete_vs_rebuild_sf1_x100"]["rebuild_over_delete"] == 5.02
    assert got["compaction"] == {"probe_before": [1.0]}
    assert got["isolated_note"] == "builder adjudication: drift"
    # isolated merged per name: fresh run wins collisions, other names survive
    assert got["isolated"]["q_old"] == {"cold": [1.0], "warm": [0.5]}
    assert got["isolated"]["q_both"] == {"cold": [2.0], "warm": [1.0]}


def test_fresh_write_without_previous_file(tmp_path, monkeypatch):
    bench, path = _load_bench(tmp_path, monkeypatch)
    out = {"metric": "m", "value": 1.0, "queries": {}}
    bench._persist_full_battery(out)
    got = json.load(open(path))
    assert got["value"] == 1.0
    assert "isolated_note" not in got


def test_auto_isolate_guards(tmp_path, monkeypatch):
    """The drift gate only compares same-tier batteries (an sf change
    would flag nearly everything and burn a pointless isolation fleet
    — review find), honors the kill switch, and flags nothing when the
    shared set is flat."""
    bench, _ = _load_bench(tmp_path, monkeypatch)
    # the repo's real previous battery (sf 0.1) is the comparison base
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = bench._previous_full_battery(repo)
    if not prev or prev.get("sf") != 0.1:
        import pytest

        pytest.skip("no sf0.1 battery on disk to compare against")
    some = dict(list(prev["queries"].items())[:5])

    # 1. tier mismatch: skipped outright even with huge ratios
    ratios, iso, skipped = bench._auto_isolate_movers(
        {k: v * 10 for k, v in some.items()}, "/root/testdata/sf0.01"
    )
    assert (ratios, iso, skipped) == ({}, {}, {})
    # 2. same tier, flat timings: no movers, no subprocesses
    ratios, iso, skipped = bench._auto_isolate_movers(
        some, "/root/testdata/sf0.1"
    )
    assert (ratios, iso, skipped) == ({}, {}, {})
    # 3. kill switch wins over everything
    monkeypatch.setenv("SPARK_GRAFT_NO_AUTOISOLATE", "1")
    ratios, iso, skipped = bench._auto_isolate_movers(
        {k: v * 10 for k, v in some.items()}, "/root/testdata/sf0.1"
    )
    assert (ratios, iso, skipped) == ({}, {}, {})
