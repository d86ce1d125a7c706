"""Watermarked stream-stream interval + as-of joins — the incremental
twins of the batch purchase→click attribution and the J7 as-of join
(j3/j7 family, ops.intervals).

Spark buffers both sides in state and emits a match as soon as the pair
arrives; the event-time range condition PLUS watermarks on both inputs
let the engine evict buffered rows once no future match is possible, so
state is bounded by (rate × tolerance + watermark horizon) per side —
the only stream-stream join shape that survives unbounded streams.

The join condition keeps the user_id equi key, so state is partitioned
by user exactly like the batch hash join; the time range is a residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    tolerance_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Each purchase joined to every click by the same user within the
    preceding ``tolerance_minutes`` (click_ts <= purchase_ts).  Works on
    two STREAMING inputs (each gets its own watermark) and, unchanged,
    on batch frames — the test asserts stream ≡ batch.

    Output: (user_id, purchase_id, purchase_ts, click_id, click_ts,
    purchase_cents)."""
    c = (
        clicks.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.round(F.col("value") * 100, 0).cast("long").alias("purchase_cents"),
        )
    )
    cond = (
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {tolerance_minutes} MINUTES")
        )
    )
    return p.join(c, cond, "inner").select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_cents",
    )


def asof_click_to_view(
    clicks: DataFrame,
    views: DataFrame,
    tolerance_seconds: int = 600,
    watermark: str = "30 minutes",
    agg_window: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the J7 as-of-with-tolerance join
    (``ops.intervals.asof_join`` as used by ``j7_asof_click_to_view``):
    each click matched to the SINGLE latest view by the same user at or
    before it, within ``tolerance_seconds``; clicks with no such view
    are dropped (inner as-of).

    Two chained stateful operators, both state-bounded by watermarks:

    1. a stream-stream range join (user equi key + event-time range
       residual) buffers each side only within (tolerance + watermark
       horizon) — the interval-join shape above;
    2. a windowed ``MAX(struct(view_ts, view_event_id))`` per click
       reduces the candidate set to the as-of winner.  The struct-max
       mirrors the batch tie order ``ORDER BY ts DESC, event_id DESC``,
       and grouping by (click_event_id, window(click_ts)) gives the
       aggregation the event-time window append mode needs to finalize
       groups as the watermark passes — a click's candidates all share
       its timestamp, so the window never splits a group.

    Works unchanged on batch frames (withWatermark is a no-op there);
    the test asserts stream ≡ batch ≡ the j7 oracle fixture.

    Output: (user_id, click_event_id, click_ts, view_event_id,
    view_ts, micros_since_view).
    """
    v = (
        views.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        clicks.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            F.col("event_id").alias("click_event_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    cond = (
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        )
    )
    cand = c.join(v, cond, "inner")
    picked = (
        cand.groupBy(
            "user_id",
            "click_event_id",
            F.window("click_ts", agg_window).alias("_w"),
        )
        .agg(
            F.max(F.struct("view_ts", "view_event_id")).alias("_best"),
            F.max("click_ts").alias("click_ts"),
        )
        .drop("_w")
    )
    return picked.select(
        "user_id",
        "click_event_id",
        "click_ts",
        F.col("_best.view_event_id").alias("view_event_id"),
        F.col("_best.view_ts").alias("view_ts"),
        (
            F.unix_micros(F.col("click_ts"))
            - F.unix_micros(F.col("_best.view_ts"))
        ).alias("micros_since_view"),
    )
