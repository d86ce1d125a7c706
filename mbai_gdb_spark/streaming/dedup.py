"""Streaming deduplication: exactly-once event streams from
at-least-once sources.

Ingest pipelines re-deliver (producer retries, replayed offsets);
training-data streams need each logical event once.  Structured
Streaming's ``dropDuplicatesWithinWatermark`` keeps a per-key state
entry only until the watermark passes the event time, so state is
bounded by (arrival rate × watermark) instead of growing with the
stream — the shape that survives an unbounded 100 TB/day feed, unlike
plain ``dropDuplicates`` whose state never ages out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop re-deliveries of the same ``key_cols`` arriving within the
    watermark horizon.  Event time is cast to TIMESTAMP (watermarks
    reject NTZ; session tz is UTC so the cast preserves the value)."""
    events = events.withColumn(ts, F.col(ts).cast("timestamp"))
    return events.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(key_cols)
