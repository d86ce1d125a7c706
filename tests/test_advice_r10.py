"""Round-10 ADVICE regressions.

1 (high): a replayed foreachBatch after a crashed append must NOT take
   the build() branch — mode('overwrite') would silently wipe every
   prior batch's postings.  Index bytes without the completeness
   side-car now raise loudly in the applier.
2 (medium): crashed-compaction residue (_compact_old_*) makes probes
   and the next compaction refuse instead of silently serving an
   incomplete layout.
3 (low): an empty probe's synthesized schema derives the id column's
   type from _meta's id_type instead of hard-coding LongType.
4 (low): compact_partitioned handles string partition values by their
   exact directory strings — zero-padded keys ('01') compact instead of
   being int-coerced into a loud abort.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_ROWS = [
    (1, "the zebra sleeps"),
    (2, "the cat naps"),
    (3, "dogs bark at the moon"),
    (4, "rivers run to the sea"),
]


# ---------------------------------------------------------------------------
# 1 (high): crashed append replay must not rebuild-from-one-batch
# ---------------------------------------------------------------------------


def test_applier_refuses_incomplete_index_instead_of_rebuilding(spark, tmp_path):
    from mbai_gdb_spark.streaming.search import index_batch_applier

    path = str(tmp_path / "idx")
    apply_batch = index_batch_applier(path, n_buckets=8)
    apply_batch(_docs(spark, _ROWS[:2]), 0)
    apply_batch(_docs(spark, _ROWS[2:3]), 1)

    # Simulate the crash window: _meta removed (as bm25_index_append
    # does before its insert), bucket dirs still on disk, batch 2 never
    # recorded — the replay arrives with index bytes but is_built()
    # false.  The old code called build(), whose overwrite write wiped
    # the whole path; now it must raise and leave the bytes untouched.
    shutil.rmtree(os.path.join(path, "_meta"))
    buckets_before = sorted(
        n for n in os.listdir(path) if n.startswith("bucket=")
    )
    assert buckets_before, "fixture must leave posting dirs behind"
    with pytest.raises(RuntimeError, match="INCOMPLETE"):
        apply_batch(_docs(spark, _ROWS[3:]), 2)
    assert (
        sorted(n for n in os.listdir(path) if n.startswith("bucket="))
        == buckets_before
    ), "the refusal must not touch the surviving postings"


def test_applier_empty_first_batches_still_build_later(spark, tmp_path):
    """The marker (and _ckpt_ref) alone are bookkeeping, not index
    bytes: an empty first batch writes the marker, and the first
    NON-empty batch must still take the build branch."""
    from mbai_gdb_spark.ops.text import bm25_probe_persisted
    from mbai_gdb_spark.streaming.search import index_batch_applier

    path = str(tmp_path / "idx")
    apply_batch = index_batch_applier(path, n_buckets=8)
    apply_batch(_docs(spark, []), 0)  # empty: marker only
    with open(os.path.join(path, "_ckpt_ref"), "w") as f:
        f.write("/some/ckpt")
    apply_batch(_docs(spark, _ROWS), 1)  # must build, not raise
    qs = spark.createDataFrame([("q", "zebra")], "query_id string, qtext string")
    assert bm25_probe_persisted(spark, path, qs, k=5).count() == 1


def test_vector_applier_refuses_incomplete_index(spark, tmp_path):
    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.streaming.search import vector_index_batch_applier

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "vidx")
    apply_batch = vector_index_batch_applier(path, vectorized=False)
    apply_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
    # Crash simulation: the _codebook side-car lost, code rows survive.
    shutil.rmtree(os.path.join(path, "_codebook"))
    with pytest.raises(RuntimeError, match="INCOMPLETE"):
        apply_batch(emb.filter(F.col("vec_id") % 2 == 1), 1)
    assert any(n.startswith("centroid_id=") for n in os.listdir(path))


# ---------------------------------------------------------------------------
# 2 (medium): _compact_old_* residue refuses loudly at probe + compact time
# ---------------------------------------------------------------------------


def _residue(path: str, name: str) -> None:
    os.makedirs(os.path.join(path, name), exist_ok=True)


def test_probe_refuses_compaction_residue(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted

    path = str(tmp_path / "idx")
    bm25_index_persist(_docs(spark, _ROWS), path, n_buckets=8)
    _residue(path, "_compact_old_bucket=3")
    qs = spark.createDataFrame([("q", "zebra")], "query_id string, qtext string")
    with pytest.raises(RuntimeError, match="crashed-compaction residue"):
        bm25_probe_persisted(spark, path, qs, k=5)


def test_ivfpq_probe_refuses_compaction_residue(spark, tmp_path):
    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.ops.similarity import ivfpq_persist, ivfpq_probe_persisted

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "vidx")
    ivfpq_persist(emb, path, vectorized=False)
    _residue(path, "_compact_old_centroid_id=0")
    with pytest.raises(RuntimeError, match="crashed-compaction residue"):
        ivfpq_probe_persisted(spark, path, emb.filter(F.col("vec_id") < 3))


def test_compact_refuses_prior_residue(spark, tmp_path):
    from mbai_gdb_spark.io import compact_partitioned

    path = str(tmp_path / "data")
    df = spark.range(20).withColumn("bucket", (F.col("id") % 2).cast("int"))
    df.write.partitionBy("bucket").parquet(path)
    _residue(path, "_compact_old_bucket=1")
    with pytest.raises(RuntimeError, match="crashed-compaction residue"):
        compact_partitioned(spark, path, "bucket")


# ---------------------------------------------------------------------------
# 3 (low): empty-probe schema types the id column from _meta
# ---------------------------------------------------------------------------


def test_empty_probe_schema_matches_nonempty_for_string_ids(spark, tmp_path):
    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted

    docs = spark.createDataFrame(
        [("a", "zebra runs"), ("b", "cats nap")], "doc_id string, text string"
    )
    qs = spark.createDataFrame([("q", "zebra")], "query_id string, qtext string")

    full = str(tmp_path / "full")
    bm25_index_persist(docs, full, n_buckets=8)
    nonempty_schema = bm25_probe_persisted(spark, full, qs, k=5).schema

    empty = str(tmp_path / "empty")
    bm25_index_persist(
        docs.filter(F.lit(False)), empty, n_buckets=8
    )  # token-less index: complete _meta, zero bucket dirs
    empty_df = bm25_probe_persisted(spark, empty, qs, k=5)
    # Name + type must match exactly (nullability legitimately differs:
    # row_number() is non-nullable on the non-empty path).
    assert [(f.name, f.dataType) for f in empty_df.schema] == [
        (f.name, f.dataType) for f in nonempty_schema
    ]  # doc_id: string, not long
    assert empty_df.count() == 0
    # Schema-sensitive caller: the union the old LongType guess broke.
    assert bm25_probe_persisted(spark, full, qs, k=5).unionByName(
        empty_df
    ).count() == 1


# ---------------------------------------------------------------------------
# 4 (low): string partition values compact by their exact dir strings
# ---------------------------------------------------------------------------


def test_compact_zero_padded_string_keys(spark, tmp_path):
    from mbai_gdb_spark.io import compact_partitioned

    path = str(tmp_path / "data")
    df = spark.createDataFrame(
        [(i, f"{i % 2:02d}") for i in range(40)], "v long, seg string"
    )
    # Two appends -> >1 file per directory -> fragmented.
    df.repartition(2).write.partitionBy("seg").parquet(path)
    df.repartition(2).write.mode("append").partitionBy("seg").parquet(path)
    dirs = sorted(n for n in os.listdir(path) if n.startswith("seg="))
    assert dirs == ["seg=00", "seg=01"]

    before = sorted(
        map(tuple, spark.read.parquet(path).select("v", "seg").collect())
    )
    done = compact_partitioned(spark, path, "seg")
    assert sorted(done) == ["00", "01"]  # exact strings, never int 0/1
    assert sorted(n for n in os.listdir(path) if n.startswith("seg=")) == dirs
    for d in dirs:
        parts = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(parts) == 1
    after = sorted(
        map(tuple, spark.read.parquet(path).select("v", "seg").collect())
    )
    assert after == before


def test_compact_int_keys_keep_int_return(spark, tmp_path):
    from mbai_gdb_spark.io import compact_partitioned

    path = str(tmp_path / "data")
    df = spark.range(40).withColumn("bucket", (F.col("id") % 3).cast("int"))
    df.repartition(2).write.partitionBy("bucket").parquet(path)
    df.repartition(2).write.mode("append").partitionBy("bucket").parquet(path)
    before = sorted(
        map(tuple, spark.read.parquet(path).select("id", "bucket").collect())
    )
    done = compact_partitioned(spark, path, "bucket")
    assert sorted(done) == [0, 1, 2]  # canonical int names stay ints
    after = sorted(
        map(tuple, spark.read.parquet(path).select("id", "bucket").collect())
    )
    assert after == before


def test_compact_escaped_string_values_roundtrip(spark, tmp_path):
    """Partition values Spark URL-escapes in directory names ('a=b' →
    'a%3Db') now compact correctly: the filter uses the unescaped
    value, the staging write re-escapes to the identical name."""
    from mbai_gdb_spark.io import compact_partitioned

    path = str(tmp_path / "data")
    df = spark.createDataFrame(
        [(i, "a=b" if i % 2 else "p q") for i in range(20)],
        "v long, seg string",
    )
    df.repartition(2).write.partitionBy("seg").parquet(path)
    df.repartition(2).write.mode("append").partitionBy("seg").parquet(path)
    before = sorted(
        map(tuple, spark.read.parquet(path).select("v", "seg").collect())
    )
    done = compact_partitioned(spark, path, "seg")
    assert sorted(done) == ["a=b", "p q"]
    after = sorted(
        map(tuple, spark.read.parquet(path).select("v", "seg").collect())
    )
    assert after == before
