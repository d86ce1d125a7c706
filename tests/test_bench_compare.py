"""Unit tests for tools/bench_compare.py's section-labeled salvage —
the logic that twice regressed in round-7 review: truncated driver
tails must never mislabel cold/sf1/scale-guard numbers as warm query
timings."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "bench_compare.py"),
)
bc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bc)


def _full_line(warm, cold, sf1=True):
    out = {
        "metric": "headline_queries_total",
        "value": sum(warm.values()),
        "unit": "sec",
        "queries": warm,
        "queries_cold": cold,
        "scale_guard": {
            "games_per_sec_20": 5.4,
            "wall_ratio_200_over_20": 1.32,
            "superlinear": False,
        },
        "sf": 0.1,
    }
    if sf1:
        out["sf1"] = {
            "sf1_dir": "/x/sf1",
            "data_ratio": 10.0,
            "queries_cold": {"q_a": 9.5},
            "queries": {"q_a": 8.8},
            "wall_ratio_warm_over_sf0.1_warm": {"q_a": 4.0},
            "max_wall_ratio": 4.0,
        }
    return json.dumps(out)


WARM = {"q_a": 2.2, "q_b": 0.5}
COLD = {"q_a": 3.1, "q_b": 0.9}


def test_salvage_tail_starting_mid_warm():
    line = _full_line(WARM, COLD)
    tail = line[line.find('"q_b": 0.5') :]  # mid-warm: q_a's warm pair lost
    got = bc._salvage(tail, "x.json")
    assert got["queries"] == {"q_b": 0.5}
    assert got["queries_cold"] == COLD  # complete, and NOT polluted by sf1


def test_salvage_tail_starting_mid_cold():
    line = _full_line(WARM, COLD)
    # Past the top-level queries_cold KEY: inside the cold map value.
    tail = line[line.find('"q_b": 0.9') :]
    got = bc._salvage(tail, "x.json")
    assert got["queries"] == {}
    assert got["queries_cold"] == {"q_b": 0.9}  # no sf1/scale-guard leakage


def test_salvage_tail_inside_scale_guard_yields_no_fake_queries():
    line = _full_line(WARM, COLD)
    tail = line[line.find('"games_per_sec_20"') :]
    got = bc._salvage(tail, "x.json")
    # scale-guard numbers are junk-filtered; only sf1 markers remain,
    # and sf1 content is cut before parsing.
    assert got["queries"] == {} and got["queries_cold"] == {}


def test_salvage_tail_entirely_inside_sf1_refuses():
    line = _full_line(WARM, COLD)
    tail = line[line.find('"sf1_dir"') :]
    got = bc._salvage(tail, "x.json")
    assert got["queries"] == {} and got["queries_cold"] == {}


def test_load_full_file_and_truncated_wrapper(tmp_path):
    full = tmp_path / "full.json"
    full.write_text(_full_line(WARM, COLD))
    doc = bc._load(str(full))
    assert doc["queries"] == WARM and doc["queries_cold"] == COLD

    line = _full_line(WARM, COLD)
    wrapper = tmp_path / "trunc.json"
    wrapper.write_text(json.dumps({"parsed": None, "tail": line[-200:]}))
    doc = bc._load(str(wrapper))
    # Whatever survived, nothing warm can be mislabeled: the 200-char
    # tail holds only sf1 content, which must salvage to nothing.
    assert doc["queries"] == {} and doc["queries_cold"] == {}


def test_main_exit_codes(tmp_path, capsys, monkeypatch):
    a = tmp_path / "a.json"
    b = tmp_path / "b.json"
    a.write_text(_full_line({"q_a": 1.0}, {"q_a": 1.5}, sf1=False))
    b.write_text(_full_line({"q_a": 2.0}, {"q_a": 1.6}, sf1=False))
    monkeypatch.setattr(sys, "argv", ["bench_compare", str(a), str(b), "1.3"])
    assert bc.main() == 1  # 2.0/1.0 > 1.3 -> regression flagged
    monkeypatch.setattr(sys, "argv", ["bench_compare", str(a), str(b), "3.0"])
    assert bc.main() == 0
    # Disjoint query names: diagnostic exit 2, not ZeroDivisionError.
    c = tmp_path / "c.json"
    c.write_text(_full_line({"q_z": 1.0}, {"q_z": 1.5}, sf1=False))
    monkeypatch.setattr(sys, "argv", ["bench_compare", str(a), str(c)])
    assert bc.main() == 2


def test_persist_full_battery_carries_isolated(tmp_path, monkeypatch):
    """The builder's --isolate battery writes the round's `isolated`
    record; the driver's later plain run overwrites the same
    BENCH_full file — the persist must carry the record forward (this
    is how the r8 isolated evidence was lost).  Since r12 both runs
    usually HAVE an isolated record (auto-isolation), so a newer run
    MERGES per name instead of replacing outright: its fresh samples
    win name collisions, the earlier run's other names survive."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_carry_ut", os.path.join(repo, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    p = str(tmp_path / "full.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", p)

    iso = {"a": {"cold": [1.0], "warm": [0.5]}}
    bench._persist_full_battery({"metric": "x", "queries": {"a": 1.0}, "isolated": iso})
    bench._persist_full_battery({"metric": "x", "queries": {"a": 1.1}})
    out = json.load(open(p))
    assert out["queries"] == {"a": 1.1}      # the plain run's numbers win
    assert out["isolated"] == iso            # ...but the record survives
    assert "isolated_note" in out

    iso2 = {"b": {"cold": [], "warm": []}, "a": {"cold": [2.0], "warm": [1.5]}}
    bench._persist_full_battery({"metric": "x", "queries": {}, "isolated": iso2})
    out = json.load(open(p))
    # per-name merge: the new run's samples win the "a" collision and
    # add "b"; the carried adjudication note survives the rewrite
    assert out["isolated"] == iso2
    assert "isolated_note" in out


def test_persist_full_battery_preserves_builder_note(tmp_path, monkeypatch):
    """A builder-attached `isolated_note` (the drift VERDICT, not just
    the numbers) must survive the driver's plain-run rewrite — the
    generic carry stamp only fills in when no note exists (r11 find:
    the carry clobbered the mm_decode_jpeg_progressive noise verdict)."""
    import importlib.util
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_note_ut", os.path.join(repo, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    p = str(tmp_path / "full.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", p)

    iso = {"a": {"cold": [1.0], "warm": [0.5]}}
    with open(p, "w") as f:
        json.dump(
            {"queries": {}, "isolated": iso, "isolated_note": "noise verdict"},
            f,
        )
    bench._persist_full_battery({"metric": "x", "queries": {"a": 1.0}})
    out = json.load(open(p))
    assert out["isolated"] == iso
    assert out["isolated_note"] == "noise verdict"  # NOT the carry stamp
