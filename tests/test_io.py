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
