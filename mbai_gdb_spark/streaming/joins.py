"""Watermarked stream-stream interval join — the incremental twin of the
batch purchase→click attribution (j3/j7 family, ops.intervals).

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
