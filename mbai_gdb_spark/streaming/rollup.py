"""Streaming continuous aggregates: foreachBatch -> incremental_rollup.

The canonical streaming->lakehouse materialization pattern: each
micro-batch is pre-aggregated to rollup grain and merged into the
persisted partitioned rollup, touching only the partitions the batch
lands in (io.incremental_rollup).  Because the measure algebra is
mergeable (sum/min/max), the result after draining any micro-batch
partitioning of the input equals the one-shot batch rollup EXACTLY —
asserted by tests/test_streaming_rollup.py.

At 100 TB this is the architecture for "dashboard tables over an
unbounded feed": state lives in the rollup files themselves (no
streaming state store growth), restarts are idempotent per batch when
the source provides exactly-once batches (file source does), and
readers see complete partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mbai_gdb_spark.io import incremental_rollup


def run_streaming_rollup_available_now(
    spark,
    source_dir: str,
    schema,
    rollup_path: str,
    part_col: str,
    key_cols: list[str],
    measures: dict,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain a parquet directory file-by-file, merging every micro-batch
    into the persisted rollup; return the final rollup DataFrame."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def merge_batch(batch_df: DataFrame, _batch_id: int) -> None:
        incremental_rollup(
            spark, rollup_path, batch_df, part_col, key_cols, measures
        )

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", rollup_path + "__ckpt")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(rollup_path)
