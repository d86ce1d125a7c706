"""Round-5 operators: semantic dedup, HyperLogLog, BPE application."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.similarity import semantic_dedup
from mbai_gdb_spark.ops.sketch import hll_distinct
from mbai_gdb_spark.ops.text import bpe_apply


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_marks_within_cluster_dups(spark):
    # Two well-separated clusters; ids 1 and 2 are near-dups of 0.
    rows = [
        (0, (1.0, 0.0)),
        (1, (0.999, 0.01)),
        (2, (0.98, 0.05)),
        (10, (0.0, 1.0)),
        (11, (0.02, 0.999)),
    ]
    corpus = _emb_df(spark, rows)
    centroids = _emb_df(spark, [(0, (1.0, 0.0)), (10, (0.0, 1.0))])
    out = semantic_dedup(corpus, centroids, threshold=0.95)
    got = {r.vec_id: (r.dup_of, r.centroid_id) for r in out.collect()}
    assert got[1] == (0, 0)
    assert got[2] == (0, 0)
    assert got[11] == (10, 10)
    assert 0 not in got and 10 not in got  # representatives kept


def test_semantic_dedup_never_pairs_across_clusters(spark):
    # Identical vectors land in the SAME cluster; near-identical ones
    # that straddle the centroid boundary are never compared — the
    # SemDeDup contract (quadratic work confined to clusters).
    rows = [(0, (1.0, 0.0)), (1, (0.6, 0.8)), (2, (0.8, 0.6))]
    corpus = _emb_df(spark, rows)
    centroids = _emb_df(spark, [(0, (1.0, 0.0)), (1, (0.0, 1.0))])
    out = semantic_dedup(corpus, centroids, threshold=0.0).collect()
    # vec 1 → centroid 1, vecs 0/2 → centroid 0: only (0,2) compared
    assert {(r.dup_of, r.vec_id) for r in out} == {(0, 2)}


# ---------------------------------------------------------------------------
# hll_distinct
# ---------------------------------------------------------------------------


def test_hll_estimate_tracks_cardinality(spark):
    df = spark.range(0, 5000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") * 7 + 13).alias("v")
    )
    out = {r.g: r for r in hll_distinct(df, ["g"], "v", m=64).collect()}
    for g in (0, 1):
        # HLL with m=64 has ~13% relative stderr; allow 3 sigma.
        assert out[g].hll_estimate == pytest.approx(2500, rel=0.4)
        assert out[g].n_registers_set == 64


def test_hll_registers_duplicate_invariant(spark):
    # Register state depends only on the distinct value set.
    base = spark.range(0, 500).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    dup = base.union(base).union(base)
    a = hll_distinct(base, ["g"], "v").collect()[0]
    b = hll_distinct(dup, ["g"], "v").collect()[0]
    assert (a.harmonic_scaled, a.hll_estimate, a.n_registers_set) == (
        b.harmonic_scaled,
        b.hll_estimate,
        b.n_registers_set,
    )


def test_hll_string_values_and_m_validation(spark):
    df = spark.range(0, 100).select(
        F.lit("g").alias("g"), F.concat(F.lit("u"), F.col("id")).alias("v")
    )
    row = hll_distinct(df, ["g"], "v", m=128).collect()[0]
    assert row.hll_estimate == pytest.approx(100, rel=0.5)
    with pytest.raises(ValueError):
        hll_distinct(df, ["g"], "v", m=48)


# ---------------------------------------------------------------------------
# bpe_apply
# ---------------------------------------------------------------------------


def _encode_reference(word: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(word)
    for left, right in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_apply_matches_reference_incl_multilevel(spark):
    merges = [("e", "r"), ("er", "s"), ("s", "t"), ("t", "h")]
    words = ["ers", "erers", "sters", "the", "ersther", "x", "ss", "erer"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    enc = df.select(
        "w",
        bpe_apply(F.filter(F.split("w", ""), lambda c: c != ""), merges).alias(
            "syms"
        ),
    )
    got = {r.w: list(r.syms) for r in enc.collect()}
    for w in words:
        assert got[w] == _encode_reference(w, merges), w


def test_bpe_apply_greedy_nonoverlap(spark):
    # 'eee' + rule (e,e): leftmost pair merges, third 'e' stays single.
    df = spark.createDataFrame([("eee",)], "w string")
    enc = df.select(
        bpe_apply(
            F.filter(F.split("w", ""), lambda c: c != ""), [("e", "e")]
        ).alias("syms")
    )
    assert list(enc.collect()[0].syms) == ["ee", "e"]


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------


def _morton_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_z_value_matches_reference(spark):
    from mbai_gdb_spark.ops.layout import z_value

    pts = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", z_value(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x, y), (x, y)
    with pytest.raises(ValueError):
        z_value(F.col("x"), F.col("y"), bits=0)


def test_write_zordered_bounds_both_dims(spark, tmp_path):
    import itertools

    from mbai_gdb_spark.ops.layout import write_zordered

    # Uniform 64x64 grid: a perfect worst case for single-column sort.
    rows = [(x * 64 + 13, y * 64 + 7) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x long, y long")

    zpath = str(tmp_path / "zord")
    write_zordered(df, zpath, "x", "y", n_files=16, bits=12)

    spans_x, spans_y = [], []
    import glob as _glob

    for f in _glob.glob(zpath + "/part-*.parquet"):
        pf = spark.read.parquet(f)
        mm = pf.agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        spans_x.append(mm[1] - mm[0])
        spans_y.append(mm[3] - mm[2])
    assert len(spans_x) >= 8
    global_span = 63 * 64
    # Z-clustering must bound BOTH dims well below global span on
    # average; a single-column sort leaves the other dim at ~full span.
    assert sum(spans_x) / len(spans_x) < 0.6 * global_span
    assert sum(spans_y) / len(spans_y) < 0.6 * global_span


# ---------------------------------------------------------------------------
# ivf_pq_topk
# ---------------------------------------------------------------------------


def test_ivfpq_subset_of_probed_lists(spark):
    # Candidates must come only from the query's probed inverted lists,
    # and ranks must be dense 1..k by (adc, vec_id).
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = [(i, [float(x) for x in rng.randn(64)]) for i in range(400)]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    from mbai_gdb_spark.ops.similarity import ivf_assign, ivf_pq_topk

    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_pq_topk(emb, queries, k=5, n_probe=2).collect()
    assert {r.query_id for r in out} == {0, 1, 2}
    for qid in (0, 1, 2):
        ranks = sorted(r.rank for r in out if r.query_id == qid)
        assert ranks == [1, 2, 3, 4, 5]

    cents = emb.filter(F.col("vec_id") % 50 == 0)
    assign = {r.vec_id: r.centroid_id for r in ivf_assign(emb, cents).collect()}
    # each result's list membership must be one of the query's 2 probes
    from collections import defaultdict

    probed = defaultdict(set)
    for r in out:
        probed[r.query_id].add(assign[r.vec_id])
    for qid, lists in probed.items():
        assert len(lists) <= 2


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_documents_window_algebra(spark):
    from mbai_gdb_spark.ops.text import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(1, 101))),  # 100 tokens
            (2, "a b c"),  # n <= max_len: one window
            (3, ""),  # empty: no rows
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, max_len=32, overlap=8)
    rows = sorted(out.collect(), key=lambda r: (r.doc_id, r.chunk_id))
    d1 = [r for r in rows if r.doc_id == 1]
    # stride 24: starts 1,25,49,73 — last window reaches token 100
    assert [(r.start_pos, r.n_chunk_tokens) for r in d1] == [
        (1, 32), (25, 32), (49, 32), (73, 28),
    ]
    assert d1[0].chunk_text.startswith("t1 t2 ") and d1[-1].chunk_text.endswith("t100")
    # consecutive windows overlap by exactly 8 tokens
    assert d1[0].chunk_text.split()[-8:] == d1[1].chunk_text.split()[:8]
    d2 = [r for r in rows if r.doc_id == 2]
    assert len(d2) == 1 and d2[0].n_chunk_tokens == 3
    assert not [r for r in rows if r.doc_id == 3]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, max_len=8, overlap=8)


# ---------------------------------------------------------------------------
# incremental_rollup
# ---------------------------------------------------------------------------


def test_incremental_rollup_only_touches_affected_partitions(spark, tmp_path):
    import os

    from mbai_gdb_spark.io import incremental_rollup

    path = str(tmp_path / "roll")
    measures = {
        "n": ("sum", F.count(F.lit(1))),
        "total": ("sum", F.sum("v")),
        "mx": ("max", F.max("v")),
    }
    b1 = spark.createDataFrame(
        [("d1", "a", 10), ("d1", "a", 5), ("d2", "b", 7)], "day string, k string, v long"
    )
    incremental_rollup(spark, path, b1, "day", ["k"], measures)
    # record d2's file set, then merge a batch touching ONLY d1
    d2_files = sorted(os.listdir(os.path.join(path, "day=d2")))
    b2 = spark.createDataFrame([("d1", "a", 1), ("d1", "c", 2)], "day string, k string, v long")
    incremental_rollup(spark, path, b2, "day", ["k"], measures)
    assert sorted(os.listdir(os.path.join(path, "day=d2"))) == d2_files  # untouched
    got = {
        (r.day, r.k): (r.n, r.total, r.mx)
        for r in spark.read.parquet(path).collect()
    }
    assert got == {
        ("d1", "a"): (3, 16, 10),
        ("d1", "c"): (1, 2, 2),
        ("d2", "b"): (1, 7, 7),
    }


# ---------------------------------------------------------------------------
# property-based checks (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.text(alphabet="erstho", min_size=1, max_size=12),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_bpe_apply_property_vs_reference(spark, words):
    merges = [("e", "r"), ("er", "s"), ("s", "t"), ("t", "h"), ("e", "e")]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    enc = df.select(
        "w",
        bpe_apply(F.filter(F.split("w", ""), lambda c: c != ""), merges).alias("s"),
    )
    got = {r.w: list(r.s) for r in enc.collect()}
    for w in words:
        assert got[w] == _encode_reference(w, merges), w
        assert "".join(got[w]) == w  # merges never lose characters


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=(1 << 31) - 1),
            st.integers(min_value=0, max_value=(1 << 31) - 1),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    )
)
def test_z_value_property_vs_reference(spark, pts):
    from mbai_gdb_spark.ops.layout import z_value

    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", z_value(F.col("x"), F.col("y"), bits=16).alias("z")
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _morton_ref(x % 65536, y % 65536), (x, y)


def _hll_reference(values, m=64):
    """Pure-Python twin of ops.sketch.hll_registers + finalize."""
    def mul32(h, c):
        return ((h % 65536) * c + ((h // 65536 * c) % 65536) * 65536) % 4294967296

    def fmix32(x):
        h = x % 4294967296
        h ^= h // 65536
        h = mul32(h, 0x85EBCA6B)
        h ^= h // 8192
        h = mul32(h, 0xC2B2AE35)
        return h ^ (h // 65536)

    bb = 32 - (m.bit_length() - 1)
    regs = {}
    for v in values:
        h = fmix32(v)
        reg, suf = h % m, h // m
        rho = bb + 1 if suf == 0 else bb - suf.bit_length() + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    z = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    return len(regs), int(z * (1 << (bb + 1)))


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=60
    )
)
def test_hll_property_vs_reference(spark, values):
    df = spark.createDataFrame(
        [("g", v) for v in values], "g string, v long"
    )
    row = hll_distinct(df, ["g"], "v", m=64).collect()[0]
    n_set, scaled = _hll_reference(set(values))
    assert (row.n_registers_set, row.harmonic_scaled) == (n_set, scaled)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.integers(min_value=1, max_value=120),  # n tokens
    st.integers(min_value=2, max_value=40),   # max_len
    st.integers(min_value=0, max_value=39),   # overlap (clamped below)
)
def test_chunk_documents_property_coverage(spark, n, max_len, overlap):
    from mbai_gdb_spark.ops.text import chunk_documents

    overlap = min(overlap, max_len - 1)
    stride = max_len - overlap
    words = [f"w{i}" for i in range(1, n + 1)]
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, max_len=max_len, overlap=overlap).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts advance by stride; last window reaches the final token
    assert [r.start_pos for r in rows] == [1 + i * stride for i in range(len(rows))]
    assert rows[-1].start_pos + rows[-1].n_chunk_tokens - 1 == n
    # every window except possibly the last is full
    for r in rows[:-1]:
        assert r.n_chunk_tokens == max_len
    # token coverage: union of windows == the document, in order
    seen = set()
    for r in rows:
        piece = r.chunk_text.split()
        assert piece == words[r.start_pos - 1 : r.start_pos - 1 + r.n_chunk_tokens]
        seen.update(piece)
    assert seen == set(words)
