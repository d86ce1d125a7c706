"""Streaming CDC materialization: foreachBatch → io.merge_changelog.

The streaming twin of the batch apply-changes path: an unbounded
changelog feed (insert/update/delete events with a sequence column)
drains micro-batch by micro-batch into a persisted parquet table,
each batch applied through :func:`io.merge_changelog`'s
sequence-arbitrated merge.  Because arbitration is by the SEQUENCE
column — not arrival order — the result after draining ANY micro-batch
partitioning of the log equals :func:`io.changelog_snapshot` of the
whole log exactly (asserted in tests/test_streaming_cdc.py), including
out-of-order delivery across batches.

State lives in the table itself (no streaming state store); restarts
re-apply batches idempotently (merge_changelog is a pure function of
table ∪ batch).  This is the streaming path to a Debezium-fed mirror
table without a lakehouse format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mbai_gdb_spark.io import merge_changelog


def run_streaming_cdc_available_now(
    spark,
    source_dir: str,
    schema,
    table_path: str,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain a parquet changelog directory file-by-file, applying every
    micro-batch onto the persisted table; return the final table."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def apply_batch(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        merge_changelog(
            spark, table_path, batch_df, key_cols, seq_col, op_col, delete_op
        )

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", table_path + "__ckpt")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(table_path)
