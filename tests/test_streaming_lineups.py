"""Streaming lineup engine ≡ batch kernel: drain a game period-by-period
(one file per period → one micro-batch each) and compare the emitted
stint openings against the batch applyInPandas kernel."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mbai_gdb_spark.pipeline.fixtures import fixture_frames
from mbai_gdb_spark.pipeline.lineups import kernel_input, lineup_change_events


def test_streaming_lineups_match_batch(spark, tmp_path):
    from mbai_gdb_spark.streaming.lineup_engine import streaming_lineup_changes

    pbp, starters = fixture_frames(spark, game_id=1001, home_team=10, away_team=20, n_ot=1)
    kin = kernel_input(pbp, starters).cache()

    # one file per period, written in order (starters ride with period 1)
    src = str(tmp_path / "feed")
    periods = sorted(r.period for r in kin.select("period").distinct().collect())
    for i, p in enumerate(periods):
        part = kin.filter(F.col("period") == p)
        part.coalesce(1).write.mode("append").parquet(src)
        time.sleep(0.05)  # distinct mtimes → deterministic file order

    stream = (
        spark.readStream.schema(kin.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_lineup_changes(stream)
        .writeStream.format("memory")
        .queryName("lineup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r.game_id, r.team_id, r.period, r.stint_seq): (r.lineup_id, r.local_start)
        for r in spark.table("lineup_sink").collect()
    }
    batch = {
        (r.game_id, r.team_id, r.period, r.stint_seq): (r.lineup_id, r.local_start)
        for r in lineup_change_events(pbp, starters).collect()
    }
    assert streamed == batch
