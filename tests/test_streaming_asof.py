"""Streaming as-of-with-tolerance join (J7 twin) ≡ batch asof_join.

Covers: latest-of-several candidate views, exact tie on view_ts broken
by event_id (the batch ORDER BY ts DESC, event_id DESC), the tolerance
boundary (inclusive), views after the click (excluded), clicks with no
candidate (dropped — inner as-of), and matches whose two sides arrive
in DIFFERENT micro-batches (the stream-stream state buffer at work).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

EV_DDL = "user_id long, event_id long, ts timestamp"


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 12, minute, second)


# views: (user, event_id, ts)
VIEWS_B1 = [
    (1, 101, _ts(0)),   # candidate for click 501 (older)
    (1, 102, _ts(5)),   # latest candidate for click 501
    (2, 201, _ts(0)),   # tie pair for click 502 ...
    (2, 202, _ts(0)),   # ... same ts, higher event_id must win
    (3, 301, _ts(0)),   # exactly tolerance (600 s) before click 503
]
VIEWS_B2 = [
    (1, 103, _ts(20)),  # AFTER click 501 — excluded
    (4, 401, _ts(30)),  # cross-batch: view arrives after its click
    # watermark flush: far-future rows close all aggregation windows
    (9, 901, _ts(59)),
]
CLICKS_B1 = [
    (1, 501, _ts(6)),
    (2, 502, _ts(1)),
    (3, 503, _ts(10)),  # 600 s after view 301 — inclusive boundary
    (4, 504, _ts(31)),  # its view (401) only arrives in batch 2
    (5, 505, _ts(6)),   # no views at all — dropped
]
CLICKS_B2 = [
    (9, 902, _ts(59, 30)),  # watermark flush
]

EXPECTED = {
    # click_event_id -> (view_event_id, micros_since_view)
    501: (102, 60 * 1_000_000),
    502: (202, 60 * 1_000_000),
    503: (301, 600 * 1_000_000),
    504: (401, 60 * 1_000_000),
    902: (901, 30 * 1_000_000),
}


def _frames(spark):
    views = spark.createDataFrame(VIEWS_B1 + VIEWS_B2, EV_DDL)
    clicks = spark.createDataFrame(CLICKS_B1 + CLICKS_B2, EV_DDL)
    return clicks, views


def test_asof_stream_matches_batch_and_oracle(spark, tmp_path):
    from mbai_gdb_spark.ops.intervals import asof_join
    from mbai_gdb_spark.streaming.joins import asof_click_to_view

    # --- batch run of the SAME function ---
    clicks, views = _frames(spark)
    batch = {
        r.click_event_id: (r.view_event_id, r.micros_since_view)
        for r in asof_click_to_view(clicks, views, watermark="5 minutes").collect()
    }
    assert batch == EXPECTED

    # --- the established batch operator agrees (j7 semantics) ---
    ref = asof_join(
        clicks.withColumnRenamed("event_id", "click_event_id"),
        views.select(
            "user_id", "ts", F.col("event_id").alias("view_event_id")
        ),
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id"],
        tolerance_seconds=600.0,
        direction="backward",
        how="inner",
    )
    ref_map = {
        r.click_event_id: (
            r.view_event_id,
            int((r.ts - r.asof_ts).total_seconds() * 1_000_000),
        )
        for r in ref.collect()
    }
    assert ref_map == EXPECTED

    # --- streaming run, sides split across micro-batches ---
    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    spark.createDataFrame(VIEWS_B1, EV_DDL).coalesce(1).write.mode("append").parquet(vsrc)
    spark.createDataFrame(VIEWS_B2, EV_DDL).coalesce(1).write.mode("append").parquet(vsrc)
    spark.createDataFrame(CLICKS_B1, EV_DDL).coalesce(1).write.mode("append").parquet(csrc)
    spark.createDataFrame(CLICKS_B2, EV_DDL).coalesce(1).write.mode("append").parquet(csrc)

    vstream = spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(vsrc)
    cstream = spark.readStream.schema(EV_DDL).option("maxFilesPerTrigger", 1).parquet(csrc)
    out = asof_click_to_view(cstream, vstream, watermark="5 minutes")
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
        r.click_event_id: (r.view_event_id, r.micros_since_view)
        for r in spark.read.parquet(sink).collect()
    }
    # Append mode: everything emitted must match batch exactly, and all
    # clicks whose aggregation window closed under the final watermark
    # must have been emitted (the flush rows keep only themselves open).
    assert got.items() <= EXPECTED.items()
    closed = {k: v for k, v in EXPECTED.items() if k != 902}
    assert closed.items() <= got.items()
