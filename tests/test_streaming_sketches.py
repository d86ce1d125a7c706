"""Streaming HLL must equal the batch sketch bit-for-bit after draining
the stream file-by-file (registers merge by MAX across micro-batches)."""

from __future__ import annotations

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.sketch import hll_distinct

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_hll_equals_batch(spark, tmp_path):
    from mbai_gdb_spark.streaming.sketches import run_streaming_hll_available_now

    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderpriority", "o_custkey"
    )
    src = str(tmp_path / "ord4")
    orders.repartition(4).write.parquet(src)  # 4 files → 4 micro-batches

    streamed = {
        r.o_orderpriority: (r.n_registers_set, r.harmonic_scaled, r.hll_estimate)
        for r in run_streaming_hll_available_now(
            spark,
            src,
            orders.schema,
            ["o_orderpriority"],
            "o_custkey",
        ).collect()
    }
    batch = {
        r.o_orderpriority: (r.n_registers_set, r.harmonic_scaled, r.hll_estimate)
        for r in hll_distinct(orders, ["o_orderpriority"], "o_custkey").collect()
    }
    assert streamed == batch  # BIT-identical, not approximately equal


def test_streaming_ohlc_bars_equal_batch(spark, tmp_path):
    """OHLC bars are a pure mergeable aggregation (min_by/max_by on the
    packed ordering key), so the update-mode streaming aggregation over
    any micro-batch split must finalize to the batch bars exactly."""
    from pyspark.sql import functions as F

    from mbai_gdb_spark.queries import scaled_long

    ev = read_table(spark, SF_DIR, "events")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    bar = F.date_trunc("hour", F.col("ts"))
    base = ev.select(
        "event_type",
        bar.alias("bar_ts"),
        (
            (micros - F.unix_micros(bar.cast("timestamp"))) * 2097152
            + F.col("event_id")
        ).alias("ord"),
        scaled_long(F.col("value"), 100).alias("cents"),
    )
    src = str(tmp_path / "bars4")
    base.repartition(4).write.parquet(src)

    aggs = [
        F.min_by("cents", "ord").alias("open_cents"),
        F.max("cents").alias("high_cents"),
        F.min("cents").alias("low_cents"),
        F.max_by("cents", "ord").alias("close_cents"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").alias("volume_cents"),
    ]
    stream = (
        spark.readStream.schema(base.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    # Update mode re-emits a bar's FULL aggregate whenever a batch
    # touches it; the final state is the emission with the largest
    # n_events (strictly increasing per key), so the sink log collapses
    # without any emission-order column.
    q = (
        stream.groupBy("event_type", "bar_ts")
        .agg(*aggs)
        .writeStream.format("memory")
        .queryName("ohlc_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sink = spark.table("ohlc_sink")
    w_last = F.max_by(
        F.struct(
            "open_cents", "high_cents", "low_cents", "close_cents",
            "n_events", "volume_cents",
        ),
        F.col("n_events"),
    )
    streamed = {
        (r.event_type, r.bar_ts): tuple(r.final)
        for r in sink.groupBy("event_type", "bar_ts")
        .agg(w_last.alias("final"))
        .collect()
    }
    batch = {
        (r.event_type, r.bar_ts): (
            r.open_cents, r.high_cents, r.low_cents, r.close_cents,
            r.n_events, r.volume_cents,
        )
        for r in base.groupBy("event_type", "bar_ts").agg(*aggs).collect()
    }
    assert streamed == batch
