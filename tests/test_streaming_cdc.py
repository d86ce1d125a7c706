"""Streaming CDC (foreachBatch → merge_changelog) must equal the
one-shot batch changelog snapshot after draining the feed file-by-file
— including deletes arbitrated across micro-batch boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.io import changelog_snapshot, read_table

SF_DIR = "/root/testdata/sf0.001"


def _changelog(spark):
    from mbai_gdb_spark.queries import scaled_long

    ev = read_table(spark, SF_DIR, "events")
    return ev.select(
        "user_id",
        F.col("event_id").alias("seq"),
        F.when(F.col("event_type") == "purchase", "D")
        .when(F.col("event_type") == "click", "U")
        .otherwise("I")
        .alias("op"),
        scaled_long(F.col("value"), 100).alias("cents"),
    )


def test_streaming_cdc_equals_batch_snapshot(spark, tmp_path):
    from mbai_gdb_spark.streaming.cdc import run_streaming_cdc_available_now

    log = _changelog(spark)
    src = str(tmp_path / "feed")
    # Hash-partitioned files: each micro-batch holds an arbitrary slice
    # of the sequence space, so the merge must arbitrate out-of-order
    # delivery (a delete can arrive before older upserts for its key).
    log.repartition(5).write.parquet(src)

    table = str(tmp_path / "mirror")
    final = run_streaming_cdc_available_now(
        spark, src, log.schema, table, ["user_id"], "seq"
    )
    got = {r.user_id: (r.seq, r.cents) for r in final.collect()}
    want = {
        r.user_id: (r.seq, r.cents)
        for r in changelog_snapshot(log, ["user_id"], "seq").collect()
    }
    assert got == want and len(want) > 0
    # Users whose LAST event is a purchase (delete) are absent.
    assert all(u in want for u in got)


def test_streaming_cdc_restart_replays_idempotently(spark, tmp_path):
    from mbai_gdb_spark.io import merge_changelog
    from mbai_gdb_spark.streaming.cdc import run_streaming_cdc_available_now

    log = _changelog(spark).filter(F.col("user_id") < 50)
    src = str(tmp_path / "feed2")
    log.repartition(3).write.parquet(src)
    table = str(tmp_path / "mirror2")
    final = run_streaming_cdc_available_now(
        spark, src, log.schema, table, ["user_id"], "seq"
    )
    before = sorted(map(tuple, final.collect()))
    # Simulate a replayed micro-batch after completion: any slice of
    # the already-applied log must change nothing (tombstones + stored
    # sequences defend the table).
    replay = log.filter(F.col("seq") % 3 == 0)
    merge_changelog(spark, table, replay, ["user_id"], "seq")
    after = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert after == before
