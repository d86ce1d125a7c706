"""Insert-if-absent sink semantics (reference MERGE ... ON CREATE SET —
idempotent re-ingest, SURVEY §2.4 A8)."""

from __future__ import annotations


def test_write_insert_if_absent_is_idempotent(spark, tmp_path):
    from mbai_gdb_spark.io import write_insert_if_absent

    path = str(tmp_path / "teams")
    df1 = spark.createDataFrame(
        [(1, "A"), (2, "B"), (2, "B-dup")], "id long, name string"
    )
    write_insert_if_absent(df1, path, ["id"], spark)
    # within-batch dedup by key
    assert spark.read.parquet(path).count() == 2

    # re-ingest with one new and two existing keys → only the new row lands
    df2 = spark.createDataFrame(
        [(1, "A-changed"), (2, "B"), (3, "C")], "id long, name string"
    )
    write_insert_if_absent(df2, path, ["id"], spark)
    rows = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert rows[3] == "C" and len(rows) == 3
    # ON CREATE semantics: existing key 1 keeps its original value
    assert rows[1] == "A"

    # full replay is a no-op
    write_insert_if_absent(df2, path, ["id"], spark)
    assert spark.read.parquet(path).count() == 3


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    from mbai_gdb_spark.io import merge_upsert

    path = str(tmp_path / "dim")
    merge_upsert(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        path, ["id"], spark,
    )
    merge_upsert(
        spark.createDataFrame([(2, "B2"), (3, "c")], "id long, v string"),
        path, ["id"], spark,
    )
    rows = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert rows == {1: "a", 2: "B2", 3: "c"}  # 2 updated, 3 inserted, 1 kept


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F
    from mbai_gdb_spark.io import write_partitioned

    path = str(tmp_path / "facts")
    df = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("game_id"),
        F.col("id").alias("clock"),
        (F.col("id") * 2).alias("v"),
    )
    write_partitioned(df, path, ["game_id"], sort_cols=["clock"])

    read = spark.read.parquet(path).filter(F.col("game_id") == 3)
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(game_id" in plan, plan
    assert read.count() == 100
