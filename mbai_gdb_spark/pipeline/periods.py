"""Period derivation (reference MERGE_PERIODS, src/queries/game.py:11-51,
and load_periods, src/managers/game.py:126-135).

Period boundaries come from the two 'period' marker rows (start/end);
durations are fixed by rule (720 s regulation, 300 s OT).  The NEXT
chain with inter-period wall-clock gaps is a lead() window (W2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.chain import chain_next

REGULAR_PERIOD_SECONDS = 720.0
OT_PERIOD_SECONDS = 300.0


def clock_seconds_remaining(clock_col):
    """Parse ISO-8601 'PT12M00.00S' → seconds remaining (pure column
    algebra — reference does pd.Timedelta per row,
    src/managers/game.py:150-152)."""
    mins = F.regexp_extract(clock_col, r"PT(\d+)M", 1).cast("double")
    secs = F.regexp_extract(clock_col, r"M([\d.]+)S", 1).cast("double")
    return mins * 60 + secs


def period_len(period_col):
    return F.when(period_col <= 4, F.lit(REGULAR_PERIOD_SECONDS)).otherwise(
        F.lit(OT_PERIOD_SECONDS)
    )


def period_global_offset(period_col):
    """Game-clock seconds elapsed before the period starts (reference
    src/managers/game.py:206-213)."""
    return F.when(
        period_col <= 4, (period_col - 1) * F.lit(REGULAR_PERIOD_SECONDS)
    ).otherwise(
        F.lit(4 * REGULAR_PERIOD_SECONDS) + (period_col - 5) * F.lit(OT_PERIOD_SECONDS)
    )


def build_periods(pbp: DataFrame) -> DataFrame:
    """(game_id, n, start, end, duration_s, global_offset) — one row per
    period, from the marker-row pair (A2: first/last timestamp)."""
    markers = pbp.filter(F.col("actionType") == "period")
    # Multi-label taxonomy (reference :RegularTime/:OverTime/:Q1..Q4
    # sub-labels, src/queries/game.py:21-31) as a labels array + the
    # boolean hot column, mirroring the actions table's convention.
    labels = F.when(
        F.col("n") <= 4,
        F.array(F.lit("RegularTime"), F.concat(F.lit("Q"), F.col("n"))),
    ).otherwise(F.array(F.lit("OverTime")))
    return (
        markers.groupBy("game_id", F.col("period").alias("n"))
        .agg(F.min("timeActual").alias("start"), F.max("timeActual").alias("end"))
        .withColumn("duration_s", period_len(F.col("n")))
        .withColumn("global_offset", period_global_offset(F.col("n")))
        .withColumn(
            "period_id", F.concat_ws("_", F.col("game_id"), F.col("n"))
        )
        .withColumn("labels", labels)
        .withColumn("is_overtime", F.col("n") > 4)
    )


def period_next_chain(periods: DataFrame) -> DataFrame:
    """(game_id, period_id, next_period_id, gap_s): consecutive periods
    with the wall-clock gap between them (W2)."""
    chained = chain_next(
        periods.withColumn("end_us", F.unix_micros(F.col("end").cast("timestamp"))),
        partition_by=["game_id"],
        order_by=["n"],
        next_cols={"period_id": "next_period_id", "start": "next_start"},
    )
    gap = (
        F.unix_micros(F.col("next_start").cast("timestamp")) - F.col("end_us")
    ).cast("double") / 1e6
    return chained.select("game_id", "period_id", "next_period_id", gap.alias("gap_s"))
