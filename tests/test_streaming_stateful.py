"""Cross-micro-batch stateful operator test: per-user running totals via
applyInPandasWithState must equal the batch aggregate after draining the
stream file-by-file (state carried across 4 micro-batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_totals_match_batch(spark, tmp_path):
    from mbai_gdb_spark.streaming.stateful import run_stateful_totals_available_now

    events = read_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev4")
    events.repartition(4).write.parquet(src)  # 4 files → 4 micro-batches

    streamed = {
        r.user_id: (r.n_events, r.total_value_cents)
        for r in run_stateful_totals_available_now(spark, src, events.schema).collect()
    }
    batch = {
        r.user_id: (r.n, r.cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert set(streamed) == set(batch)
    for uid, (n, _) in batch.items():
        assert streamed[uid][0] == n
        # EXACT: both sides round per row HALF_UP (streaming's
        # copysign/floor mirrors Spark's F.round), so totals must be
        # bit-identical regardless of micro-batch boundaries.
        assert streamed[uid][1] == batch[uid][1]
