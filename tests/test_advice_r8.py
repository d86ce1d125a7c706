"""Regression tests for the round-8 ADVICE findings.

1. medium io.py — Delta narrow-batch matched-UPDATE divergence: covered
   by the extended parameterized ``test_merge_upsert_schema_evolution``
   in test_io.py (whole-row-replace asserted on BOTH backends, strict
   narrow batch raises on both).
2. low ops/graph.py — ``_kcore_peel`` exhausting ``max_iter`` silently
   returned a non-fixpoint table (vertices with deg < k, inflated core
   degrees).  Now raises.
3. low ops/multimodal.py — ``install_native_codecs`` stacked duplicate
   PIL decoders on repeated calls (each duplicate shipping inside every
   plan-time captured chain closure).  Now idempotent, and never
   touches user-registered decoders for the same formats.
"""

from __future__ import annotations

import pytest

from mbai_gdb_spark.ops import multimodal as mm


def _chain_edges(spark, n: int):
    """Path graph v0-v1-...-v(n-1): peeling to k=2 removes both
    endpoints each round, so depth is ~n/2 rounds — deep enough to
    exhaust a small max_iter."""
    rows = [(i, i + 1) for i in range(n - 1)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_kcore_raises_on_max_iter_exhaustion(spark):
    from mbai_gdb_spark.ops.graph import kcore

    edges = _chain_edges(spark, 12)  # k=2 peel depth ~6 rounds
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore(edges, k=2, max_iter=2).collect()


def test_kcore_converged_result_unchanged(spark):
    """The guard must not fire on a normal converged peel — including
    the exact-boundary case where the LAST allowed round reaches the
    fixpoint."""
    from mbai_gdb_spark.ops.graph import kcore

    # Triangle + pendant: k=2 core is the triangle, one peel round.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "src long, dst long"
    )
    got = {r.vertex: r.core_degree for r in kcore(edges, k=2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # Exact boundary: converges IN round max_iter (removes the pendant,
    # then the loop ends with no deg<k vertices left) — no raise.
    got = {r.vertex: r.core_degree for r in kcore(edges, k=2, max_iter=1).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # Empty result (whole graph peeled away) is a valid fixpoint too.
    chain = _chain_edges(spark, 6)
    assert kcore(chain, k=2, max_iter=10).count() == 0


@pytest.fixture
def fake_pil(monkeypatch):
    """A PIL stand-in whose Image.open always fails: the installed
    wrappers all DECLINE at decode time, so the pure chain still
    decides every payload — we only exercise registration mechanics."""
    import importlib.machinery
    import sys
    import types

    fake = types.ModuleType("PIL")
    fake.__spec__ = importlib.machinery.ModuleSpec("PIL", loader=None)

    class _Image:
        @staticmethod
        def open(*a, **k):
            raise RuntimeError("fake PIL cannot decode")

    fake.Image = _Image
    monkeypatch.setitem(sys.modules, "PIL", fake)
    saved = list(mm._CUSTOM_DECODERS)
    saved_native = list(mm._NATIVE_CODEC_ENTRIES)
    yield
    mm._CUSTOM_DECODERS[:] = saved
    mm._NATIVE_CODEC_ENTRIES[:] = saved_native


def test_install_native_codecs_is_idempotent(fake_pil):
    base_len = len(mm._CUSTOM_DECODERS)

    def user_png(b: bytes):
        return None  # always declines; presence is what we assert

    mm.register_decoder("png", user_png)

    assert mm.install_native_codecs() is True
    after_first = len(mm._CUSTOM_DECODERS)
    assert after_first == base_len + 1 + 4  # user decoder + 4 PIL wrappers

    # Repeat installs (explicit call on top of the env hook, or just
    # calling twice) must NOT stack duplicates.
    assert mm.install_native_codecs() is True
    assert mm.install_native_codecs() is True
    assert len(mm._CUSTOM_DECODERS) == after_first

    # The user's own png decoder survived every re-install.
    assert any(fn is user_png for _, fn in mm._CUSTOM_DECODERS)

    # Wrappers decline (fake PIL raises inside -> None), so payloads
    # still resolve through the pure chain.
    payload = mm.encode_png(2, 2, 1, bytes([1, 2, 3, 4]))
    got = mm.decode_payload_bytes(payload)
    assert got is not None and got[0] == "png" and bytes(got[4]) == bytes(
        [1, 2, 3, 4]
    )


def test_install_native_codecs_entries_tracked(fake_pil):
    """The installer's bookkeeping list matches what sits in the chain,
    so a future re-install removes exactly its own entries."""
    mm.install_native_codecs()
    assert len(mm._NATIVE_CODEC_ENTRIES) == 4
    for entry in mm._NATIVE_CODEC_ENTRIES:
        assert entry in mm._CUSTOM_DECODERS
