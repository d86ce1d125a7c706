"""Tests for product quantization (ops.similarity.pq_codebook /
pq_encode / pq_adc_topk)."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.similarity import pq_adc_topk, pq_codebook, pq_encode


def _emb(spark, n=300, dim=64, seed=7):
    rng = random.Random(seed)
    rows = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_codebook_shape(spark):
    emb = _emb(spark, n=900)
    cb = pq_codebook(emb).collect()
    # 16 codewords x 8 subspaces, each an 8-dim slice
    assert len(cb) == 16 * 8
    assert {r.code_id for r in cb} == set(range(16))
    assert {r.sub_id for r in cb} == set(range(8))
    assert all(len(r.cw) == 8 for r in cb)


def test_pq_encode_complete_and_in_range(spark):
    emb = _emb(spark, n=200)
    cb = pq_codebook(emb, n_codes=4, stride=50)
    codes = pq_encode(emb, cb).collect()
    assert len(codes) == 200 * 8  # every (vec, sub) coded
    assert all(0 <= r.code_id < 4 for r in codes)


def test_pq_encode_nearest_codeword_exact(spark):
    # With vectors exactly equal to codebook sources, every subspace
    # must code to that source's own codeword (distance 0 wins).
    emb = _emb(spark, n=200)
    cb = pq_codebook(emb, n_codes=4, stride=50)
    codes = {
        (r.vec_id, r.sub_id): r.code_id
        for r in pq_encode(emb, cb).collect()
    }
    for vid in (0, 50, 100, 150):
        for m in range(8):
            assert codes[(vid, m)] == vid // 50


def test_pq_encode_partitioning_invariant(spark):
    emb = _emb(spark, n=150)
    cb = pq_codebook(emb, n_codes=3, stride=50)
    a = sorted(map(tuple, pq_encode(emb, cb).collect()))
    b = sorted(map(tuple, pq_encode(emb.repartition(7, "vec_id"), cb).collect()))
    assert a == b


def test_pq_adc_beats_random_recall(spark):
    """ADC is approximate, but its top-5 should overlap the exact
    squared-L2 top-5 far better than chance on gaussian data."""
    emb = _emb(spark, n=400, seed=11)
    out = pq_adc_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)
    approx = {(r.query_id, r.vec_id) for r in out.collect()}

    rows = emb.collect()
    vecs = {r.vec_id: r.embedding for r in rows}
    truth = set()
    for q in range(8):
        d = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(vecs[q], v)), vid)
                for vid, v in vecs.items()
                if vid != q
            )
        )[:5]
        truth |= {(q, vid) for _, vid in d}
    recall = len(truth & approx) / len(truth)
    # Isotropic gaussian data + an untrained (stride-sampled) codebook
    # is PQ's hardest case; ~0.17 observed here vs 0.0125 chance.
    assert recall >= 0.1, recall


def test_pq_adc_rank_contract(spark):
    emb = _emb(spark, n=120)
    out = pq_adc_topk(emb, emb.filter(F.col("vec_id") < 3), k=5).collect()
    by_q = {}
    for r in out:
        assert r.query_id != r.vec_id
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)
        assert all(not math.isnan(d) for d in dists)


def _clustered_emb(spark, n=400, dim=64, n_centers=4, noise=0.15, seed=23):
    """Mixture-of-gaussians corpus whose centers sit at ids 0/50/100/150
    (centroid_stride=50 picks exactly the true centers): the regime
    residual encoding exists for — within a probed list every vector
    shares its centroid, so residuals are small noise vectors that a
    16-codeword book quantizes far better than the raw spread."""
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_centers)]
    rows = []
    for i in range(n):
        if i % 50 == 0 and i // 50 < n_centers:
            rows.append((i, centers[i // 50]))
        else:
            c = centers[i % n_centers]
            rows.append((i, [x + rng.gauss(0, noise) for x in c]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _exact_l2_top5(rows, n_queries):
    vecs = {r.vec_id: r.embedding for r in rows}
    truth = set()
    for q in range(n_queries):
        d = sorted(
            (
                (sum((a - b) ** 2 for a, b in zip(vecs[q], v)), vid)
                for vid, v in vecs.items()
                if vid != q
            )
        )[:5]
        truth |= {(q, vid) for _, vid in d}
    return truth


def test_ivfpq_residual_recall_geq_raw(spark):
    """Residual encoding must not lose recall vs raw encoding at equal
    scan cost, and on clustered data it should clearly win."""
    from mbai_gdb_spark.ops.similarity import ivf_pq_residual_topk, ivf_pq_topk

    emb = _clustered_emb(spark)
    queries = emb.filter(F.col("vec_id") < 8)
    kw = dict(
        k=5, n_probe=2, centroid_stride=50,
        m_sub=8, sub_dim=8, n_codes=16, code_stride=7,
    )
    raw = {(r.query_id, r.vec_id) for r in ivf_pq_topk(emb, queries, **kw).collect()}
    res = {
        (r.query_id, r.vec_id)
        for r in ivf_pq_residual_topk(emb, queries, **kw).collect()
    }
    truth = _exact_l2_top5(emb.collect(), 8)
    recall_raw = len(truth & raw) / len(truth)
    recall_res = len(truth & res) / len(truth)
    # Deterministic pipeline on a fixed seed: observed 0.300 vs 0.175.
    # Discriminating top-5 among ~100 near-identical cluster-mates with
    # an untrained 16-codeword stride-sampled book caps absolute recall;
    # the residual advantage is the invariant being pinned.
    assert recall_res > recall_raw, (recall_res, recall_raw)
    assert recall_res >= 0.25, recall_res


def test_ivfpq_residual_prebuilt_matches_inline(spark):
    """The amortized index path (ivf_pq_residual_index → prebuilt) must
    return exactly the inline result."""
    from mbai_gdb_spark.ops.similarity import (
        ivf_pq_residual_index,
        ivf_pq_residual_topk,
    )

    emb = _clustered_emb(spark, n=250)
    queries = emb.filter(F.col("vec_id") < 4)
    kw = dict(
        k=5, n_probe=2, centroid_stride=50,
        m_sub=8, sub_dim=8, n_codes=8, code_stride=11,
    )
    inline = sorted(map(tuple, ivf_pq_residual_topk(emb, queries, **kw).collect()))
    codes, assignment, cb = ivf_pq_residual_index(
        emb, centroid_stride=50, m_sub=8, sub_dim=8, n_codes=8, code_stride=11,
        vectorized=False,
    )
    pre = sorted(
        map(
            tuple,
            ivf_pq_residual_topk(
                emb, queries, prebuilt=(codes, assignment, cb), **kw
            ).collect(),
        )
    )
    assert inline == pre
