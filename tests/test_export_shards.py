"""Tests for the training-shard export sink (export.shards)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.export.shards import read_shard, write_training_shards
from mbai_gdb_spark.ops.sampling import deterministic_shuffle


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("text-"), F.col("id")).alias("text")
    )


def test_shards_complete_and_disjoint(spark, tmp_path):
    base = str(tmp_path / "shards")
    df = _docs(spark)
    manifest = write_training_shards(df, base, "doc_id", n_shards=8).collect()
    assert sorted(r.shard for r in manifest) == list(range(8))
    assert sum(r.n_rows for r in manifest) == 200
    # pos is a dense 1..n rank inside each shard (row_number semantics)
    for r in manifest:
        assert r.min_pos == 1 and r.max_pos == r.n_rows

    back = spark.read.parquet(base)
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200


def test_shard_read_in_training_order_and_reproducible(spark, tmp_path):
    base = str(tmp_path / "shards2")
    df = _docs(spark, 120)
    write_training_shards(df, base, "doc_id", n_shards=4, seed=7)
    # expected order from the shuffle op itself
    expected = {
        s: [
            r.doc_id
            for r in deterministic_shuffle(df, "doc_id", 4, seed=7)
            .filter(F.col("shard") == s)
            .orderBy("pos")
            .collect()
        ]
        for s in range(4)
    }
    for s in range(4):
        got = [r.doc_id for r in read_shard(spark, base, s).collect()]
        assert got == expected[s]
    # rewriting from a different input partitioning yields identical shards
    base2 = str(tmp_path / "shards3")
    write_training_shards(df.repartition(13), base2, "doc_id", n_shards=4, seed=7)
    for s in range(4):
        assert [r.doc_id for r in read_shard(spark, base2, s).collect()] == expected[s]


def test_manifest_checksum_detects_reorder(spark, tmp_path):
    base = str(tmp_path / "shards4")
    df = _docs(spark, 60)
    manifest = {r.shard: r.checksum for r in write_training_shards(df, base, "doc_id", n_shards=2).collect()}
    # recompute checksum from the written files; a swapped pos breaks it
    back = spark.read.parquet(base)
    p = 2_147_483_647
    ok = back.groupBy("shard").agg(
        (F.sum((F.col("pos") + 1) * (F.col("doc_id") % p)) % p).alias("c")
    ).collect()
    assert {r.shard: r.c for r in ok} == manifest
    swapped = back.withColumn(
        "pos",
        F.when(F.col("pos") == 0, 1).when(F.col("pos") == 1, 0).otherwise(F.col("pos")),
    )
    bad = swapped.groupBy("shard").agg(
        (F.sum((F.col("pos") + 1) * (F.col("doc_id") % p)) % p).alias("c")
    ).collect()
    assert {r.shard: r.c for r in bad} != manifest
