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
