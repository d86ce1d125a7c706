"""Persisted IVF index: partition-pruned probes must read only the
probed inverted-list directories and return exactly the in-memory
ivf_topk answer."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.similarity import (
    ivf_persist,
    ivf_probe_persisted,
    ivf_query_probes,
    ivf_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_persisted_probe_matches_in_memory(spark, tmp_path):
    emb = read_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_persist(emb, path, centroid_stride=10)

    queries = emb.filter(F.col("vec_id") < 5)
    want = sorted(
        map(
            tuple,
            ivf_topk(emb, queries, k=3, n_probe=2, centroid_stride=10)
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    got_df = ivf_probe_persisted(spark, path, queries, k=3, n_probe=2)
    got = sorted(map(tuple, got_df.select("query_id", "vec_id", "rank").collect()))
    assert got == want and len(got) > 0


def test_probe_prunes_unprobed_partitions(spark, tmp_path):
    emb = read_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_persist(emb, path, centroid_stride=10)

    queries = emb.filter(F.col("vec_id") < 2)
    probed = {
        r.probe_centroid
        for r in ivf_query_probes(spark, path, queries, n_probe=2).collect()
    }
    assert 0 < len(probed) <= 4  # ≤ n_queries × n_probe

    # The scan plan carries the centroid_id partition filter …
    got_df = ivf_probe_persisted(spark, path, queries, k=3, n_probe=2)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    before = sorted(map(tuple, got_df.select("query_id", "vec_id", "rank").collect()))

    # … and DELETING every unprobed list directory changes nothing —
    # physical proof those directories are never read.
    all_dirs = [
        d for d in (tmp_path / "ivf").iterdir()
        if d.is_dir() and d.name.startswith("centroid_id=")
    ]
    removed = 0
    for d in all_dirs:
        cid = int(d.name.split("=")[1])
        if cid not in probed:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0  # the fixture really had unprobed lists
    after_df = ivf_probe_persisted(spark, path, queries, k=3, n_probe=2)
    after = sorted(map(tuple, after_df.select("query_id", "vec_id", "rank").collect()))
    assert after == before


def test_persist_with_trained_kmeans_centroids(spark, tmp_path):
    from mbai_gdb_spark.ops.kmeans import kmeans_fit

    emb = read_table(spark, SF_DIR, "embeddings")
    cents = kmeans_fit(emb, k=8, n_iter=3)
    path = str(tmp_path / "ivf_km")
    ivf_persist(emb, path, centroids=cents)
    lists = spark.read.parquet(path)
    assert lists.count() == emb.count()
    assert lists.select("centroid_id").distinct().count() <= 8
    queries = emb.filter(F.col("vec_id") < 3)
    got = ivf_probe_persisted(spark, path, queries, k=3, n_probe=2).collect()
    assert len(got) == 9  # 3 queries × top-3


def test_ivfpq_persisted_probe_matches_inline(spark, tmp_path):
    """Persisted residual IVF-PQ: side-car centroids/codebook + the
    partition-pruned codes scan must return exactly the inline
    ivf_pq_residual_topk answer (HOF build so both sides are
    deterministic)."""
    from mbai_gdb_spark.ops.similarity import (
        ivf_pq_residual_topk,
        ivfpq_persist,
        ivfpq_probe_persisted,
    )

    emb = read_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivfpq")
    ivfpq_persist(emb, path, centroid_stride=50, code_stride=7, vectorized=False)

    queries = emb.filter(F.col("vec_id") < 5)
    want = sorted(
        map(
            tuple,
            ivf_pq_residual_topk(
                emb, queries, k=3, n_probe=2, centroid_stride=50, code_stride=7
            ).collect(),
        )
    )
    got_df = ivfpq_probe_persisted(spark, path, queries, k=3, n_probe=2)
    got = sorted(map(tuple, got_df.collect()))
    assert got == want and len(got) > 0


def test_ivfpq_probe_prunes_partitions(spark, tmp_path):
    """The codes scan carries the centroid_id partition filter, and
    deleting every unprobed list directory changes nothing."""
    from mbai_gdb_spark.ops.similarity import ivfpq_persist, ivfpq_probe_persisted

    emb = read_table(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivfpq")
    ivfpq_persist(emb, path, centroid_stride=50, code_stride=7, vectorized=False)

    queries = emb.filter(F.col("vec_id") < 2)
    got_df = ivfpq_probe_persisted(spark, path, queries, k=3, n_probe=2)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan
    before = sorted(map(tuple, got_df.collect()))

    probed = {
        r.centroid_id
        for r in got_df.join(
            spark.read.parquet(path).select("vec_id", "centroid_id"), "vec_id"
        ).select("centroid_id").distinct().collect()
    }
    all_dirs = [
        d for d in (tmp_path / "ivfpq").iterdir()
        if d.is_dir() and d.name.startswith("centroid_id=")
    ]
    removed = 0
    for d in all_dirs:
        cid = int(d.name.split("=")[1])
        if cid not in probed:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0
    after_df = ivfpq_probe_persisted(spark, path, queries, k=3, n_probe=2)
    assert sorted(map(tuple, after_df.collect())) == before
