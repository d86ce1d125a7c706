"""Regression tests for the round-9 ADVICE findings.

1. low ops/multimodal.py — ``install_native_codecs`` re-install moved
   the PIL wrappers BACK ahead of user decoders registered for the same
   format after the first install (insert-at-front), silently shadowing
   a faster user kernel.  Re-install now swaps each wrapper into the
   exact chain position its prior entry occupied.
2. low queries_north.py — ``search_bm25_persisted`` keyed its index by
   (sf, pid) only: a reused pid over regenerated testdata would serve a
   stale index, and every run left permanent tmp residue.  The key now
   includes a dataset fingerprint; dead-pid trees are swept at build
   time; $SPARK_GRAFT_INDEX_DIR overrides the root; an atexit hook
   removes this process's own trees.
3. low bench.py — ``--isolate`` rejected queries_nba / queries_tpch
   registry entries ("unknown entries") because only queries_north was
   imported.  All three registry modules are imported now.
4. low ops/text.py — the integer BM25 idf docstring claimed "same
   monotone ordering"; the multi-term aggregate divergence from log-idf
   BM25 is now documented (doc-only fix; no test).
5. low bench.py — ``_isolated_single`` warmed the JVM with
   a1_pricing_summary, so isolating that exact query reported a warm
   second run as "cold".  The warm-up now switches to a different
   trivial query when the target IS the warm-up query.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

from mbai_gdb_spark.ops import multimodal as mm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# 1. codec re-install preserves user-decoder precedence
# ---------------------------------------------------------------------------


@pytest.fixture
def fake_pil_working(monkeypatch):
    """A PIL stand-in whose Image.open RETURNS pixels (a 1x1 gray
    sentinel), so dispatch order is observable behaviorally: whichever
    decoder sits first in the chain decides the payload."""
    import importlib.machinery
    import types

    fake = types.ModuleType("PIL")
    fake.__spec__ = importlib.machinery.ModuleSpec("PIL", loader=None)

    class _Im:
        mode = "L"
        width = 1
        height = 1

        def load(self):
            pass

        def convert(self, mode):
            return self

        def tobytes(self):
            return b"\x99"  # the PIL sentinel pixel

    class _Image:
        @staticmethod
        def open(*a, **k):
            return _Im()

    fake.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", fake)
    saved = list(mm._CUSTOM_DECODERS)
    saved_native = list(mm._NATIVE_CODEC_ENTRIES)
    yield
    mm._CUSTOM_DECODERS[:] = saved
    mm._NATIVE_CODEC_ENTRIES[:] = saved_native


def test_reinstall_keeps_user_decoder_ahead(fake_pil_working):
    """A user kernel registered AFTER the first install (the documented
    libjpeg-turbo/nvJPEG scale path) must still outrank the PIL wrapper
    after any number of re-installs — positionally AND behaviorally."""
    assert mm.install_native_codecs() is True

    def user_jpeg(b: bytes):
        if not b.startswith(b"\xff\xd8\xff"):
            return None
        return (1, 1, 1, b"\x07")  # the user sentinel pixel

    mm.register_decoder("jpeg", user_jpeg)

    def positions():
        fns = [fn for _, fn in mm._CUSTOM_DECODERS]
        pil_jpeg = next(e for e in mm._NATIVE_CODEC_ENTRIES if e[0] == "jpeg")
        return fns.index(user_jpeg), mm._CUSTOM_DECODERS.index(pil_jpeg)

    u, p = positions()
    assert u < p  # most-recent-wins after first install

    chain_len = len(mm._CUSTOM_DECODERS)
    assert mm.install_native_codecs() is True
    assert mm.install_native_codecs() is True
    assert len(mm._CUSTOM_DECODERS) == chain_len  # still idempotent
    u, p = positions()
    assert u < p, "re-install must not shadow the user's jpeg kernel"

    got = mm.decode_payload_bytes(b"\xff\xd8\xff rest-of-jpeg")
    assert got is not None and bytes(got[4]) == b"\x07"

    # Non-jpeg payloads still reach the PIL wrapper (user kernel declines).
    got_png = mm.decode_payload_bytes(b"\x89PNG\r\n\x1a\n body")
    assert got_png is not None and bytes(got_png[4]) == b"\x99"


def test_reinstall_after_unregister_registers_fresh(fake_pil_working):
    """unregister_decoder removes OUR tracked entry too; the next
    install must treat that format as first-install (front of chain)
    without disturbing the other formats' positions."""
    mm.install_native_codecs()
    mm.unregister_decoder("jpeg")
    assert all(e[0] != "jpeg" for e in mm._CUSTOM_DECODERS)
    mm.install_native_codecs()
    fmts = [f for f, _ in mm._CUSTOM_DECODERS]
    assert fmts.count("jpeg") == 1
    assert len(mm._NATIVE_CODEC_ENTRIES) == 4
    for entry in mm._NATIVE_CODEC_ENTRIES:
        assert entry in mm._CUSTOM_DECODERS


# ---------------------------------------------------------------------------
# 2. persisted BM25 index lifecycle
# ---------------------------------------------------------------------------


def test_dataset_fingerprint_tracks_regeneration(tmp_path):
    """Same bytes re-written (testdata regenerated in place) must change
    the fingerprint — mtime_ns is part of the key — so a reused pid can
    never serve a stale index; an untouched dataset keys stably."""
    from mbai_gdb_spark.queries_north import _dataset_fingerprint

    ds = tmp_path / "documents.parquet"
    ds.write_bytes(b"PAR1-fake-payload")
    fp1 = _dataset_fingerprint(str(ds))
    fp2 = _dataset_fingerprint(str(ds))
    assert fp1 == fp2 and len(fp1) == 12

    os.utime(ds, ns=(os.stat(ds).st_atime_ns, os.stat(ds).st_mtime_ns + 1))
    assert _dataset_fingerprint(str(ds)) != fp1

    # Directory-shaped datasets (multi-part parquet) fingerprint too.
    d = tmp_path / "dir.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"a")
    fp_d = _dataset_fingerprint(str(d))
    (d / "part-1.parquet").write_bytes(b"b")
    assert _dataset_fingerprint(str(d)) != fp_d


def test_index_path_respects_env_override(tmp_path, monkeypatch):
    from mbai_gdb_spark.queries_north import _bm25_index_path

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    p = _bm25_index_path("/root/testdata/sf0.001")
    assert p.startswith(str(tmp_path) + os.sep)
    assert os.path.basename(p).startswith("mbai_bm25_idx_sf0.001_")
    assert p.endswith(f"_{os.getpid()}")

    # Variant suffix distinguishes the append-built twin's tree.
    p_app = _bm25_index_path("/root/testdata/sf0.001", suffix="_app")
    assert "_app_" in os.path.basename(p_app) and p_app != p


def test_stale_index_sweep(tmp_path):
    """Dead-pid trees are removed; our own and non-index dirs are not.
    (A live foreign pid is hard to fabricate portably; liveness is the
    same os.kill(pid, 0) probe either way.)"""
    from mbai_gdb_spark.queries_north import (
        _BM25_IDX_PREFIX,
        _sweep_stale_bm25_indexes,
    )

    # A pid that cannot exist: beyond pid_max on Linux (and recently
    # exited pids are not reused instantly anyway).
    dead_pid = 2**22 + 12345
    stale = tmp_path / f"{_BM25_IDX_PREFIX}sf0.01_deadbeef0000_{dead_pid}"
    (stale / "_meta").mkdir(parents=True)
    mine = tmp_path / f"{_BM25_IDX_PREFIX}sf0.01_deadbeef0000_{os.getpid()}"
    (mine / "_meta").mkdir(parents=True)
    other = tmp_path / "unrelated_dir_42"
    other.mkdir()

    _sweep_stale_bm25_indexes(str(tmp_path))
    assert not stale.exists()
    assert mine.exists()
    assert other.exists()


def test_persisted_query_builds_under_env_root(spark, tmp_path, monkeypatch):
    """End-to-end: with $SPARK_GRAFT_INDEX_DIR set, the registry query
    builds its index under the override, not the system tempdir, and
    registers it for atexit cleanup."""
    import mbai_gdb_spark.queries_north as qn
    from mbai_gdb_spark.queries import QUERIES

    monkeypatch.setenv("SPARK_GRAFT_INDEX_DIR", str(tmp_path))
    out = QUERIES["search_bm25_persisted"](spark, "/root/testdata/sf0.001")
    assert out.count() > 0
    trees = [p for p in os.listdir(tmp_path) if p.startswith(qn._BM25_IDX_PREFIX)]
    assert trees, "index must land under the override root"
    full = os.path.join(str(tmp_path), trees[0])
    assert full in qn._BM25_BUILT_PATHS
    # Leave no residue for other tests: mimic the atexit hook now.
    qn._BM25_BUILT_PATHS.discard(full)
    shutil.rmtree(full, ignore_errors=True)


# ---------------------------------------------------------------------------
# 3. bench --isolate accepts the FULL registry
# ---------------------------------------------------------------------------


def test_bench_isolate_validates_nba_and_tpch_entries():
    """--isolate-only with 0 runs exercises exactly the validation path
    (no JVM, no subprocesses): nba/tpch names must validate, and a typo
    must still fail fast."""
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--isolate-only",
            "nba_possessions,q8_market_share,a1_pricing_summary",
            "--isolate-runs",
            "0",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-800:]

    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "bench.py"),
            "--isolate-only",
            "not_a_query",
            "--isolate-runs",
            "0",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode != 0
    assert "unknown entries" in (proc.stderr + proc.stdout)


# ---------------------------------------------------------------------------
# 5. isolated warm-up never uses the query under measurement
# ---------------------------------------------------------------------------


def test_isolated_warmup_avoids_target(monkeypatch):
    """Drive _isolated_single with stubbed QUERIES and assert the
    warm-up call is NOT the measured query when the target is the
    default warm-up (a1_pricing_summary): the first a1 execution must
    be its own cold run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    calls: list[str] = []

    class _FakeWriter:
        def format(self, *_):
            return self

        def mode(self, *_):
            return self

        def save(self, *_):
            return None

    class _FakeDF:
        write = _FakeWriter()

    def _mk(name):
        def _fn(spark, sf_dir):
            calls.append(name)
            return _FakeDF()

        return _fn

    class _FakeSC:
        def setLogLevel(self, *_):
            pass

    class _FakeSpark:
        sparkContext = _FakeSC()

    fake_queries = {
        n: _mk(n) for n in ("a1_pricing_summary", "a7_distinct_segments")
    }
    import mbai_gdb_spark.queries as qmod
    import mbai_gdb_spark.session as smod

    monkeypatch.setattr(qmod, "QUERIES", fake_queries)
    monkeypatch.setattr(smod, "get_spark", lambda *_a, **_k: _FakeSpark())

    bench._isolated_single("a1_pricing_summary", "/root/testdata/sf0.001")
    assert calls[0] == "a7_distinct_segments"
    assert calls[1:] == ["a1_pricing_summary", "a1_pricing_summary"]

    calls.clear()
    bench._isolated_single("a7_distinct_segments", "/root/testdata/sf0.001")
    assert calls[0] == "a1_pricing_summary"
    assert calls[1:] == ["a7_distinct_segments", "a7_distinct_segments"]
