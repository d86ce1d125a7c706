"""Streaming tumbling-window aggregation — the incremental twin of the
batch time-bucket rollup (w12_hourly_time_buckets).

Tumbling windows partition event time into fixed buckets; with a
watermark, closed buckets are emitted once and their state dropped, so
state is bounded by (buckets in the watermark horizon × keys) however
long the stream runs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_counts(
    events: DataFrame,
    key: str = "event_type",
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per (key, tumbling window) event counts and value sums.  Emits
    (key, window_start, n_events, total_value_cents) — cents per-row
    fixed-point, matching the batch convention."""
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.window(F.col(ts), window).alias("__w__"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "total_value_cents"
            ),
        )
        .select(
            key,
            F.col("__w__.start").alias("window_start"),
            "n_events",
            "total_value_cents",
        )
    )
