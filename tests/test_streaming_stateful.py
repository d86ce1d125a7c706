"""Cross-micro-batch stateful operator test: per-user running totals via
applyInPandasWithState must equal the batch aggregate after draining the
stream file-by-file (state carried across 4 micro-batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_stateful_totals_match_batch(spark, tmp_path):
    from mbai_gdb_spark.streaming.stateful import run_stateful_totals_available_now

    events = read_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev4")
    events.repartition(4).write.parquet(src)  # 4 files → 4 micro-batches

    streamed = {
        r.user_id: (r.n_events, r.total_value_cents)
        for r in run_stateful_totals_available_now(spark, src, events.schema).collect()
    }
    batch = {
        r.user_id: (r.n, r.cents)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents"),
        )
        .collect()
    }
    assert set(streamed) == set(batch)
    for uid, (n, _) in batch.items():
        assert streamed[uid][0] == n
        # EXACT: both sides round per row HALF_UP (streaming's
        # copysign/floor mirrors Spark's F.round), so totals must be
        # bit-identical regardless of micro-batch boundaries.
        assert streamed[uid][1] == batch[uid][1]


def test_streaming_heavy_hitters_mg_guarantee(spark, tmp_path):
    """Misra-Gries across micro-batches: bounded state, every truly
    frequent value present at the end, counts under-estimated by at
    most n/(capacity+1), and a replayed single-process MG gives the
    exact same table (determinism across the batch boundaries the
    one-file-per-trigger drain fixes)."""
    from mbai_gdb_spark.streaming.stateful import (
        _mg_fold,
        run_streaming_heavy_hitters_available_now,
    )

    # Two shards; shard 0: zipf-ish (value v appears 120//(v+1) times),
    # shard 1: uniform singletons + one dominant value.
    rows = []
    for v in range(40):
        rows += [(0, v)] * (120 // (v + 1))
    rows += [(1, 999)] * 50 + [(1, i) for i in range(60)]
    # Deterministic interleave, then split into 4 ordered files.
    df = spark.createDataFrame(rows, "shard long, value long")
    src = str(tmp_path / "mg_src")
    n_files = 4
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        spark.createDataFrame(
            rows[i * chunk : (i + 1) * chunk], "shard long, value long"
        ).coalesce(1).write.mode("append").parquet(src)

    capacity = 8
    got = run_streaming_heavy_hitters_available_now(
        spark, src, df.schema, "shard", "value", capacity=capacity
    )

    for shard in (0, 1):
        n = sum(1 for s, _ in rows if s == shard)
        exact: dict[int, int] = {}
        for s, v in rows:
            if s == shard:
                exact[v] = exact.get(v, 0) + 1
        table = got[shard]
        assert len(table) <= capacity  # bounded state
        bound = n / (capacity + 1)
        for v, c in exact.items():
            if c > bound:
                assert v in table, (shard, v, c, bound)
        for v, c in table.items():
            assert exact[v] - bound <= c <= exact[v]

    # Determinism: replay the same per-shard value sequence through the
    # reference fold — parquet files preserve row order and the drain is
    # one file per trigger, so the tables must match exactly.
    for shard in (0, 1):
        counters: dict[int, int] = {}
        _mg_fold(counters, [v for s, v in rows if s == shard], 8)
        assert got[shard] == counters
