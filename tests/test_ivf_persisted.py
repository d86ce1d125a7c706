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


# ---------------------------------------------------------------------------
# Incremental index maintenance (round 9): ivfpq_append
# ---------------------------------------------------------------------------


def _split_emb(spark):
    emb = read_table(spark, SF_DIR, "embeddings")
    return (
        emb,
        emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0),
        emb.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1),
    )


def test_ivfpq_append_rows_equal_frozen_encoding(spark, tmp_path):
    """Appended code rows are exactly the frozen-quantizer encoding of
    the delta: build(base)+append(delta) holds the same rows as
    build(base) plus encoding the delta with base's side-cars —
    asserted by comparing against a one-shot frozen build over the
    union via a second append of the SAME delta split differently."""
    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    _, base, delta = _split_emb(spark)
    a = str(tmp_path / "one_batch")
    b = str(tmp_path / "two_batches")
    for p in (a, b):
        ivfpq_persist(base, p, centroid_stride=50, code_stride=7, vectorized=False)

    # Associativity: one append of the whole delta ≡ two appends of a
    # disjoint split (bit-identical rows AND probes).
    ivfpq_append(delta, a, vectorized=False)
    d1 = delta.filter(F.pmod(F.col("vec_id"), F.lit(4)) == 1)
    d2 = delta.filter(F.pmod(F.col("vec_id"), F.lit(4)) == 3)
    ivfpq_append(d1, b, vectorized=False)
    ivfpq_append(d2, b, vectorized=False)

    cols = ["vec_id", "sub_id", "code_id", "centroid_id"]
    rows_a = sorted(map(tuple, spark.read.parquet(a).select(cols).collect()))
    rows_b = sorted(map(tuple, spark.read.parquet(b).select(cols).collect()))
    assert rows_a == rows_b and len(rows_a) > 0

    from mbai_gdb_spark.ops.similarity import ivfpq_probe_persisted

    emb, _, _ = _split_emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    got_a = sorted(
        map(tuple, ivfpq_probe_persisted(spark, a, queries, k=3, n_probe=2).collect())
    )
    got_b = sorted(
        map(tuple, ivfpq_probe_persisted(spark, b, queries, k=3, n_probe=2).collect())
    )
    assert got_a == got_b and len(got_a) > 0
    # Odd (appended) vectors are genuinely retrievable.
    assert any(r[1] % 2 == 1 for r in got_a)


def test_ivfpq_append_never_rewrites_existing_files(spark, tmp_path):
    """Pure INSERT: every pre-append parquet file survives the append
    byte-identical (same path, size, mtime) — PQ codes carry no
    corpus-global statistics, so nothing needs rewriting."""
    import os
    from pathlib import Path

    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    _, base, delta = _split_emb(spark)
    path = str(tmp_path / "idx")
    ivfpq_persist(base, path, centroid_stride=50, code_stride=7, vectorized=False)

    def snapshot():
        out = {}
        for d in Path(path).glob("centroid_id=*"):
            for f in d.rglob("*"):
                if f.is_file():
                    st = os.stat(f)
                    out[str(f)] = (st.st_size, st.st_mtime_ns)
        return out

    before = snapshot()
    assert before
    ivfpq_append(delta, path, vectorized=False)
    after = snapshot()
    assert set(before) <= set(after)          # old files all still there...
    for k in before:
        assert after[k] == before[k]          # ...and untouched
    assert len(after) > len(before)           # new files landed


def test_ivfpq_append_rejects_duplicate_ids(spark, tmp_path):
    import pytest

    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    _, base, _ = _split_emb(spark)
    path = str(tmp_path / "idx")
    ivfpq_persist(base, path, centroid_stride=50, code_stride=7, vectorized=False)
    readd = base.limit(1)
    with pytest.raises(ValueError, match="already in the index"):
        ivfpq_append(readd, path, vectorized=False)


def test_ivfpq_append_empty_delta_is_noop(spark, tmp_path):
    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    emb, base, _ = _split_emb(spark)
    path = str(tmp_path / "idx")
    ivfpq_persist(base, path, centroid_stride=50, code_stride=7, vectorized=False)
    n_before = spark.read.parquet(path).count()
    ivfpq_append(emb.filter(F.lit(False)), path, vectorized=False)
    assert spark.read.parquet(path).count() == n_before
