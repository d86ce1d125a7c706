"""Streaming continuous aggregate (foreachBatch -> incremental_rollup)
must equal the one-shot batch rollup exactly after draining the stream
file-by-file."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_rollup_equals_batch(spark, tmp_path):
    from mbai_gdb_spark.queries import scaled_long
    from mbai_gdb_spark.streaming.rollup import run_streaming_rollup_available_now

    ev = read_table(spark, SF_DIR, "events")
    facts = ev.select(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "event_type",
        scaled_long(F.col("value"), 100).alias("cents"),
    )
    src = str(tmp_path / "facts4")
    facts.repartition(4).write.parquet(src)

    measures = {
        "n_events": ("sum", F.count(F.lit(1))),
        "value_cents": ("sum", F.sum("cents")),
        "max_event_cents": ("max", F.max("cents")),
    }
    final = run_streaming_rollup_available_now(
        spark,
        src,
        facts.schema,
        str(tmp_path / "rollup"),
        "day",
        ["event_type"],
        measures,
    )
    got = {
        (r.day, r.event_type): (r.n_events, r.value_cents, r.max_event_cents)
        for r in final.collect()
    }
    want = {
        (r.day, r.event_type): (r.n, r.cents, r.mx)
        for r in facts.groupBy("day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents"),
            F.max("cents").alias("mx"),
        )
        .collect()
    }
    assert got == want  # exact, not approximate
