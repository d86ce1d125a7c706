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


def streaming_latest_per_user(events: DataFrame) -> DataFrame:
    """Streaming twin of W10 top-1-per-key (w10_latest_event_per_user):
    per-user latest event as an UPDATE-mode aggregation.

    ``MAX(struct(ts, event_id, payload...))`` compares (ts, event_id)
    first — exactly the batch ``ORDER BY ts DESC, event_id DESC``
    total order — and the payload columns ride along inside the
    winning struct, so each micro-batch emits only the users whose
    latest event CHANGED.  State is one struct per user (bounded by
    keyspace, not stream length); route the update stream into a
    keyed upsert sink (:func:`run_streaming_latest_per_user`) for the
    materialized current-state table."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        e.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type", "value")).alias("_b"))
        .select(
            "user_id",
            F.col("_b.event_id").alias("event_id"),
            F.col("_b.ts").alias("ts"),
            F.col("_b.event_type").alias("event_type"),
            F.col("_b.value").alias("value"),
        )
    )


def run_streaming_latest_per_user(
    spark,
    source_dir: str,
    schema,
    out_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain a parquet directory file-by-file, upserting every
    micro-batch's changed per-user rows into a persisted current-state
    table via :func:`io.merge_upsert` keyed on user_id — the
    aggregation/sink composition a CDC-style "latest state" pipeline
    uses.  Replay-safe: re-delivered rows re-derive the same winner
    and the upsert is idempotent.  Returns the final table.

    The sink is pinned to ``backend='parquet'`` so the read-back below
    is always valid: auto-selecting Delta in a Delta-enabled session
    would leave superseded file versions that a plain parquet read
    resurrects as duplicate rows.  A Delta deployment should pass its
    own foreachBatch sink (MERGE INTO) and read the table back through
    the Delta reader instead."""
    from mbai_gdb_spark.io import _path_has_data, merge_upsert

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def upsert_batch(batch_df: DataFrame, _batch_id: int) -> None:
        merge_upsert(batch_df, out_path, ["user_id"], spark, backend="parquet")

    q = (
        streaming_latest_per_user(stream)
        .writeStream.foreachBatch(upsert_batch)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not _path_has_data(out_path):
        # Zero input rows: no batch ever wrote, so the dataset dir may
        # not exist — return an empty frame of the output schema
        # instead of letting the read throw PATH_NOT_FOUND.
        empty_src = spark.createDataFrame([], schema)
        return spark.createDataFrame([], streaming_latest_per_user(empty_src).schema)
    return spark.read.parquet(out_path)
