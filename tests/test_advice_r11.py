"""Regressions for the four round-10 ADVICE findings.

1. indexgen._publish (durable mode): the pointer rename must be followed
   by an fsync of the ROOT DIRECTORY — without it a power loss can lose
   the rename while a subsequent prune's unlinks persist, leaving a
   durable ``_current`` naming a deleted generation.
2. ops.similarity.ivfpq_probe_persisted: the empty-index typed result
   must take the CORPUS id type from the persisted ``_centroids``
   side-car, not the query frame's id type.
3. indexgen.gen_compact: a stray FILE named like a partition directory
   must not crash the no-op pre-check; the docstring no longer claims a
   no-op tick removes a clone it never creates.
4. bench._full_battery_path: isolate/compaction merges that run after
   the driver wrote the round's BENCH_rN.json must still land in the
   round's existing BENCH_full file, never skip ahead to r{N+1}.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

from mbai_gdb_spark import indexgen as G


def _load_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_advice_r11_ut", os.path.join(repo, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


# ---------------------------------------------------------------------------
# 1. durable publish fsyncs the root directory after the rename
# ---------------------------------------------------------------------------


def test_durable_publish_fsyncs_root_dir_after_rename(tmp_path, monkeypatch):
    root = str(tmp_path / "idx")
    os.makedirs(os.path.join(root, G._GENS, "gen-000001"))

    monkeypatch.setenv("SPARK_GRAFT_DURABLE_PUBLISH", "1")
    monkeypatch.setattr(os, "sync", lambda: None)  # keep the test fast

    fsynced_dirs: list[str] = []
    real_fsync = os.fsync

    def spy_fsync(fd):
        try:
            target = os.readlink(f"/proc/self/fd/{fd}")
        except OSError:
            target = "?"
        if os.path.isdir(target):
            # The rename must already be visible when the dir is synced:
            # syncing before the replace would make the OLD entry durable.
            assert G.current_generation_name(root) == "gen-000001"
            fsynced_dirs.append(os.path.realpath(target))
        return real_fsync(fd)

    monkeypatch.setattr(os, "fsync", spy_fsync)
    G._publish(root, "gen-000001")
    assert os.path.realpath(root) in fsynced_dirs
    assert G.current_generation_name(root) == "gen-000001"


def test_non_durable_publish_does_not_pay_directory_fsync(tmp_path, monkeypatch):
    root = str(tmp_path / "idx")
    os.makedirs(os.path.join(root, G._GENS, "gen-000001"))
    monkeypatch.delenv("SPARK_GRAFT_DURABLE_PUBLISH", raising=False)

    dir_syncs: list[int] = []
    real_fsync = os.fsync

    def spy_fsync(fd):
        try:
            if os.path.isdir(os.readlink(f"/proc/self/fd/{fd}")):
                dir_syncs.append(fd)
        except OSError:
            pass
        return real_fsync(fd)

    monkeypatch.setattr(os, "fsync", spy_fsync)
    G._publish(root, "gen-000001")
    assert dir_syncs == []  # default mode: process-crash atomicity only


# ---------------------------------------------------------------------------
# 2. ivfpq empty-probe schema takes the corpus id type from _centroids
# ---------------------------------------------------------------------------


def test_ivfpq_empty_probe_id_type_from_centroids_sidecar(spark, tmp_path):
    from mbai_gdb_spark.ops.similarity import ivfpq_probe_persisted

    path = str(tmp_path / "pq")
    os.makedirs(path)
    # Corpus ids were STRINGS at build time; every list has since been
    # deleted, so only the side-cars remain.
    spark.createDataFrame(
        [("c-0", [1.0, 0.0])], "centroid_id string, embedding array<double>"
    ).coalesce(1).write.parquet(path + "/_centroids")
    spark.createDataFrame(
        [(0, 0, [0.0, 0.0])], "sub_id int, code_id long, cw array<double>"
    ).coalesce(1).write.parquet(path + "/_codebook")

    queries = spark.createDataFrame([(7, [1.0, 0.0])], "vec_id long, embedding array<double>")
    out = ivfpq_probe_persisted(spark, path, queries, k=3, n_probe=1)
    assert out.count() == 0
    schema = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert schema["query_id"] == "bigint"  # the query frame's id type
    assert schema["vec_id"] == "string"    # the LAYOUT's corpus id type


# ---------------------------------------------------------------------------
# 3. gen_compact tolerates stray files with the partition prefix
# ---------------------------------------------------------------------------


def test_gen_compact_ignores_stray_file_with_partition_prefix(tmp_path):
    root = str(tmp_path / "idx")
    gen = os.path.join(root, G._GENS, "gen-000001")
    os.makedirs(os.path.join(gen, "bucket=1"))
    with open(os.path.join(gen, "bucket=1", "part-0.parquet"), "w"):
        pass
    # The hazard: a FILE whose name carries the partition prefix.
    with open(os.path.join(gen, "bucket=stray"), "w"):
        pass
    G._publish(root, "gen-000001")

    # Unfragmented (1 file <= max_files) -> no-op tick, no clone, and
    # critically no NotADirectoryError from the stray file.
    assert G.gen_compact(None, root, "bucket", max_files=1) == []
    assert G.list_generations(root) == ["gen-000001"]


# ---------------------------------------------------------------------------
# 4. battery-merge target resolution keyed on BENCH_full files
# ---------------------------------------------------------------------------


def test_full_battery_path_merge_stays_in_round(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FULL", raising=False)
    repo = str(tmp_path)

    def touch(name):
        with open(os.path.join(repo, name), "w") as f:
            json.dump({}, f)

    # Round-11 start: driver artifacts through r10 exist.
    touch("BENCH_r10.json")
    touch("BENCH_full_r10.json")
    assert bench._full_battery_path(repo).endswith("BENCH_full_r11.json")
    # A merge before any r11 battery attaches to the newest battery,
    # which measured the same HEAD (round-10's file).
    assert bench._full_battery_path(repo, for_merge=True).endswith(
        "BENCH_full_r10.json"
    )

    # Mid-round: the builder's battery created full_r11...
    touch("BENCH_full_r11.json")
    assert bench._full_battery_path(repo, for_merge=True).endswith(
        "BENCH_full_r11.json"
    )
    # ...and then the driver records BENCH_r11.  The OLD derivation
    # (max(BENCH_r*)+1) now said r12 — the advice finding.  Merges must
    # keep landing in the round's existing battery file.
    touch("BENCH_r11.json")
    assert bench._full_battery_path(repo, for_merge=True).endswith(
        "BENCH_full_r11.json"
    )

    # Env override wins for both.
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", "/tmp/x.json")
    assert bench._full_battery_path(repo) == "/tmp/x.json"
    assert bench._full_battery_path(repo, for_merge=True) == "/tmp/x.json"


def test_merge_into_full_battery_uses_existing_round_file(
    tmp_path, monkeypatch
):
    """End-to-end: with BENCH_r11 already written, a merge lands in the
    existing BENCH_full_r11.json instead of creating r12."""
    bench = _load_bench()
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FULL", raising=False)
    repo = str(tmp_path)
    for name in ("BENCH_r10.json", "BENCH_r11.json"):
        with open(os.path.join(repo, name), "w") as f:
            json.dump({}, f)
    with open(os.path.join(repo, "BENCH_full_r11.json"), "w") as f:
        json.dump({"queries": {"a": 1.0}}, f)

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: os.path.join(repo, "bench.py")
    )
    bench._merge_into_full_battery({"isolated": {"q": {"warm": [1.0]}}})
    out = json.load(open(os.path.join(repo, "BENCH_full_r11.json")))
    assert out["queries"] == {"a": 1.0}
    assert out["isolated"] == {"q": {"warm": [1.0]}}
    assert not os.path.exists(os.path.join(repo, "BENCH_full_r12.json"))
