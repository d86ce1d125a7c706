"""Vectorized (Arrow/numpy matmul) IVF coarse assignment must agree
with the bit-stable HOF path on real fixture embeddings — same nearest
centroid for every vector, same ivf_topk answer end-to-end.

Exact-tie ordering is the only documented divergence risk (matmul vs
sequential accumulation); the fixture vectors are in general position,
so full equality is the expected outcome here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.similarity import (
    ivf_assign,
    ivf_assign_vectorized,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_vectorized_assignment_matches_hof(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 10 == 0)
    want = sorted(map(tuple, ivf_assign(emb, centroids).collect()))
    got = sorted(map(tuple, ivf_assign_vectorized(emb, centroids).collect()))
    assert len(got) == emb.count() > 0
    assert got == want


def test_vectorized_topk_matches_hof_end_to_end(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    want = sorted(
        map(
            tuple,
            ivf_topk(emb, queries, k=3, n_probe=2, centroid_stride=10)
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            ivf_topk(
                emb,
                queries,
                k=3,
                n_probe=2,
                centroid_stride=10,
                vectorized_assign=True,
            )
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_vectorized_assignment_is_arrow_batched(spark):
    """The plan must be a mapInPandas stage (Arrow eval), not a
    row-at-a-time Python UDF."""
    emb = read_table(spark, SF_DIR, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 10 == 0)
    plan = (
        ivf_assign_vectorized(emb, centroids)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_vectorized_cosine_topk_matches_hof(spark):
    from mbai_gdb_spark.ops.similarity import cosine_topk, cosine_topk_vectorized

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 7)
    want = sorted(
        map(
            tuple,
            cosine_topk(emb, queries, k=5)
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    got_df = cosine_topk_vectorized(emb, queries, k=5)
    got = sorted(
        map(tuple, got_df.select("query_id", "vec_id", "rank").collect())
    )
    assert got == want and len(got) == 7 * 5
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan


def test_vectorized_cosine_topk_partial_reduction_many_partitions(spark):
    """Tie-safety across batch boundaries: repartition the corpus so
    every batch holds few rows — the global answer must be unchanged."""
    from mbai_gdb_spark.ops.similarity import cosine_topk, cosine_topk_vectorized

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    want = sorted(
        map(
            tuple,
            cosine_topk(emb, queries, k=4)
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            cosine_topk_vectorized(emb.repartition(32), queries, k=4)
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    assert got == want


def test_random_projection_linearity_and_determinism(spark):
    """proj is a fixed linear map: proj(2a) == 2*proj(a) exactly
    (power-of-two scale, bit-exact), identical across repartitionings,
    and the shared plane family means it equals the LSH signature's
    unthresholded dots."""
    import math

    from mbai_gdb_spark.ops.similarity import random_projection

    emb = read_table(spark, SF_DIR, "embeddings").limit(50)
    base = {
        r.vec_id: r.projected
        for r in random_projection(emb, out_dim=6).collect()
    }
    doubled_in = emb.select(
        "vec_id", F.transform("embedding", lambda x: x * 2).alias("embedding")
    )
    doubled = {
        r.vec_id: r.projected
        for r in random_projection(doubled_in, out_dim=6).collect()
    }
    assert set(base) == set(doubled) and len(base) == 50
    for k in base:
        assert all(
            d == 2 * b and math.isfinite(b)
            for b, d in zip(base[k], doubled[k])
        )
    again = {
        r.vec_id: r.projected
        for r in random_projection(emb.repartition(7), out_dim=6).collect()
    }
    assert again == base


def test_vectorized_pq_encode_matches_hof(spark):
    from mbai_gdb_spark.ops.similarity import (
        pq_codebook,
        pq_encode,
        pq_encode_vectorized,
    )

    emb = read_table(spark, SF_DIR, "embeddings")
    cb = pq_codebook(emb)
    want = sorted(map(tuple, pq_encode(emb, cb).collect()))
    got = sorted(map(tuple, pq_encode_vectorized(emb, cb).collect()))
    assert len(got) == emb.count() * 8 > 0
    assert got == want


def test_ivfpq_prebuilt_index_matches_inline(spark):
    from mbai_gdb_spark.ops.similarity import ivf_pq_index, ivf_pq_topk

    emb = read_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    inline = sorted(map(tuple, ivf_pq_topk(emb, queries, k=5, n_probe=2).collect()))
    idx = ivf_pq_index(emb, vectorized=True)
    pre = sorted(
        map(tuple, ivf_pq_topk(emb, queries, k=5, n_probe=2, prebuilt=idx).collect())
    )
    assert pre == inline and len(pre) > 0
