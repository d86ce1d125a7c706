"""Streaming sketches: HyperLogLog registers as a streaming aggregation.

HLL's register state merges by MAX, which is exactly the shape
Structured Streaming's update-mode aggregation maintains — no custom
applyInPandasWithState needed: the SAME map-side expression as the
batch operator (ops.sketch.hll_registers) runs over the stream, state
is one row per (group, register) bounded at m rows per group forever,
and the final estimate is the SAME finalizer (hll_finalize).  The
streaming sketch therefore equals the batch sketch bit-for-bit on any
micro-batch partitioning of the input — asserted by
tests/test_streaming_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from mbai_gdb_spark.ops.sketch import hll_finalize, hll_registers


def streaming_hll_registers(
    stream: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """Update-mode streaming HLL register table over an unbounded
    stream: ≤ ``m`` state rows per group, ever."""
    return hll_registers(stream, group_cols, value_col, m)


def run_streaming_hll_available_now(
    spark,
    source_dir: str,
    schema,
    group_cols: list[str],
    value_col: str,
    m: int = 64,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain a parquet directory file-by-file (state carried across
    micro-batches), then finalize the last emitted register values."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )
    regs = streaming_hll_registers(stream, group_cols, value_col, m)
    q = (
        regs.writeStream.format("memory")
        .queryName("hll_regs_sink")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits a (group, reg) row each time its max grows; the
    # final register value is the MAX across emissions (monotone).
    sink = (
        spark.table("hll_regs_sink")
        .groupBy(*group_cols, "__reg__")
        .agg(F.max("__m__").alias("__m__"))
    )
    return hll_finalize(sink, group_cols, m)
