"""Streaming tumbling-window counts ≡ batch aggregation, and the
deterministic hash-split invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.sampling import hash_split

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_tumbling_counts_match_batch(spark, tmp_path):
    from mbai_gdb_spark.streaming.windows import streaming_windowed_counts

    events = read_table(spark, SF_DIR, "events")
    src = str(tmp_path / "ev")
    events.repartition(3).write.parquet(src)  # 3 files → 3 micro-batches

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = streaming_windowed_counts(stream)
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.event_type, r.window_start, r.n_events, r.total_value_cents)
        for r in spark.read.parquet(sink).collect()
    }
    want = {
        (r.event_type, r.window_start, r.n_events, r.total_value_cents)
        for r in events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("event_type", F.window("ts", "1 hour").alias("__w__"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias(
                "total_value_cents"
            ),
        )
        .select(
            "event_type",
            F.col("__w__.start").alias("window_start"),
            "n_events",
            "total_value_cents",
        )
        .collect()
    }
    # Append mode emits only watermark-CLOSED windows; buckets newer
    # than (max event time - watermark) legitimately stay in state at
    # end-of-stream.  Everything emitted must match batch exactly, and
    # every closed bucket must have been emitted.
    from datetime import timedelta

    max_ts = events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    horizon = max_ts - timedelta(hours=2)
    closed_want = {t for t in want if t[1] + timedelta(hours=1) <= horizon}
    assert got <= want
    assert closed_want <= got
    assert len(got) > 0


def test_hash_split_partition_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    out = hash_split(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] + counts["val"] + counts["test"] == 5000
    assert 0.75 * 5000 <= counts["train"] <= 0.85 * 5000
    assert 0.07 * 5000 <= counts["val"] <= 0.13 * 5000
    # Deterministic and partitioning-invariant.
    a = sorted((r.doc_id, r.split) for r in out.collect())
    b = sorted(
        (r.doc_id, r.split)
        for r in hash_split(
            df.repartition(11), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    )
    assert a == b


def test_hash_split_rejects_bad_fractions(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", {"train": 0.5, "test": 0.2})


def test_hash_split_string_key(spark):
    """String keys hash through the char-poly reduction (the raw LCG's
    cast('long') on a string is NULL → every row would silently land in
    the fallback split)."""
    df = spark.createDataFrame(
        [(f"https://example.com/doc/{i}",) for i in range(400)], "url string"
    )
    out = hash_split(df, "url", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    # all three splits populated, train strictly dominates
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # deterministic across repartitionings
    a = {r.url: r.split for r in out.collect()}
    b = {
        r.url: r.split
        for r in hash_split(
            df.repartition(7), "url", {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    assert a == b


def test_hash_split_rejects_unsupported_key_type(spark):
    import pytest

    df = spark.createDataFrame([(1.5,), (2.5,)], "score double")
    with pytest.raises(TypeError):
        hash_split(df, "score", {"train": 0.5, "test": 0.5})

def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join ≡ the same join on batch
    frames: every emitted pair is correct, and every pair old enough to
    be watermark-safe is emitted."""
    from mbai_gdb_spark.streaming.joins import purchase_click_attribution

    events = read_table(spark, SF_DIR, "events")
    clicks_b = events.filter(F.col("event_type") == "click")
    purchases_b = events.filter(F.col("event_type") == "purchase")

    csrc, psrc = str(tmp_path / "clicks"), str(tmp_path / "purch")
    clicks_b.repartition(3).write.parquet(csrc)
    purchases_b.repartition(3).write.parquet(psrc)
    clicks_s = spark.readStream.schema(events.schema).parquet(csrc)
    purchases_s = spark.readStream.schema(events.schema).parquet(psrc)

    out = purchase_click_attribution(clicks_s, purchases_s)
    sink = str(tmp_path / "joined")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    key = lambda r: (r.user_id, r.purchase_id, r.click_id, r.purchase_cents)
    got = {key(r) for r in spark.read.parquet(sink).collect()}
    want_rows = purchase_click_attribution(clicks_b, purchases_b).collect()
    want = {key(r) for r in want_rows}

    assert got <= want  # nothing fabricated
    # pairs whose BOTH sides are older than the watermark horizon are
    # guaranteed emitted before end-of-stream state eviction
    from datetime import timedelta

    max_ts = events.agg(F.max(F.col("ts").cast("timestamp"))).collect()[0][0]
    horizon = max_ts - timedelta(minutes=30 + 10)
    safe = {key(r) for r in want_rows if r.purchase_ts <= horizon}
    assert safe <= got
    assert len(got) > 0


def test_streaming_latest_per_user_matches_batch_w10(spark, tmp_path):
    """Streaming update-mode latest-per-user, upserted batch-by-batch
    into the merge sink, converges to EXACTLY the batch W10 result."""
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.windows import top1_per_key
    from mbai_gdb_spark.streaming.windows import run_streaming_latest_per_user

    events = read_table(spark, SF_DIR, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    src = str(tmp_path / "ev")
    events.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches

    got = run_streaming_latest_per_user(
        spark,
        src,
        spark.read.parquet(src).schema,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    want = top1_per_key(
        events.withColumn("ts", F.col("ts").cast("timestamp")),
        ["user_id"],
        [F.col("ts").desc(), F.col("event_id").desc()],
    ).select("user_id", "event_id", "ts", "event_type", "value")
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0


def test_streaming_latest_per_user_empty_source(spark, tmp_path):
    """Zero input rows: an empty frame of the output schema, not
    PATH_NOT_FOUND."""
    from mbai_gdb_spark.streaming.windows import run_streaming_latest_per_user

    src = str(tmp_path / "ev")
    schema = "user_id long, event_id long, ts timestamp, event_type string, value double"
    spark.createDataFrame([], schema).write.parquet(src)  # dir exists, 0 rows
    got = run_streaming_latest_per_user(
        spark, src, schema, str(tmp_path / "state"), str(tmp_path / "ckpt")
    )
    assert got.count() == 0
    assert got.columns == ["user_id", "event_id", "ts", "event_type", "value"]
