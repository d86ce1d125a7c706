"""Player stints and cross-period NEXT chains (W5/W6).

A player's stint is a maximal run of consecutive lineup-stints they
appear in (reference src/queries/game.py:134-182 — flag + reduce()
prefix-sum islands; here: lag → flag → running-sum, one window shuffle).
Cross-period NEXT chains link each entity's stints game-wide (reference
src/queries/game.py:184-206 — union + ordered collect; here: unionByName
+ lead()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.chain import chain_next


def build_player_stints(lineup_stints: DataFrame) -> DataFrame:
    """Explode lineup membership, merge temporally-adjacent lineup stints
    per player into islands (W5), aggregate each island to a PlayerStint."""
    member = lineup_stints.select(
        "game_id",
        "team_id",
        "period",
        "stint_id",
        "local_start",
        "local_end",
        "global_start",
        "global_end",
        "clock_duration",
        "start_time",
        "end_time",
        F.explode("player_ids").alias("player_id"),
    )
    w = Window.partitionBy("game_id", "player_id").orderBy("global_start")
    prev_end = F.lag("global_end").over(w)
    # New island when not exactly adjacent to the previous on-court span
    # (period boundaries create gaps in global clock only if the player
    # sat; back-to-back periods on court are contiguous by construction).
    flag = F.when(prev_end.isNull() | (F.col("global_start") != prev_end), 1).otherwise(0)
    run = Window.partitionBy("game_id", "player_id").orderBy("global_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    islands = member.withColumn("__new__", flag).withColumn(
        "island", F.sum("__new__").over(run)
    )
    return (
        islands.groupBy("game_id", "team_id", "player_id", "island")
        .agg(
            F.min("global_start").alias("global_start"),
            F.max("global_end").alias("global_end"),
            F.sum("clock_duration").alias("clock_duration"),
            F.min("start_time").alias("start_time"),
            F.max("end_time").alias("end_time"),
            F.min("period").alias("first_period"),
            F.max("period").alias("last_period"),
            F.collect_set("stint_id").alias("lineup_stint_ids"),
        )
        .withColumn(
            "player_stint_id",
            F.concat_ws(
                "_", "game_id", "player_id", F.col("island").cast("string")
            ),
        )
    )


def player_stint_lineup_edges(player_stints: DataFrame) -> DataFrame:
    """(PlayerStint)-[:ON_COURT_WITH]->(LineUpStint) edge table."""
    return player_stints.select(
        "game_id",
        "player_id",
        "player_stint_id",
        F.explode("lineup_stint_ids").alias("stint_id"),
    )


def cross_period_next_chain(
    lineup_stints: DataFrame, player_stints: DataFrame
) -> DataFrame:
    """W6: union both stint kinds under an entity key, link each entity's
    stints game-wide with clock gaps."""
    ls = lineup_stints.select(
        "game_id",
        F.concat_ws("_", F.lit("lineup"), "team_id", "lineup_id").alias("entity_id"),
        F.col("stint_id").alias("sid"),
        "global_start",
        "global_end",
        "start_time",
        "end_time",
    )
    ps = player_stints.select(
        "game_id",
        F.concat_ws("_", F.lit("player"), "player_id").alias("entity_id"),
        F.col("player_stint_id").alias("sid"),
        "global_start",
        "global_end",
        "start_time",
        "end_time",
    )
    unioned = ls.unionByName(ps)
    chained = chain_next(
        unioned,
        partition_by=["game_id", "entity_id"],
        order_by=["global_start"],
        next_cols={
            "sid": "next_sid",
            "global_start": "next_start",
            "start_time": "next_start_time",
        },
    )
    # Edge props at reference parity (src/queries/game.py:202-206):
    # clock_since = game-clock gap, time_since = wall-clock gap.
    return chained.select(
        "game_id",
        "entity_id",
        "sid",
        "next_sid",
        (F.col("next_start") - F.col("global_end")).alias("clock_since"),
        (
            (
                F.unix_micros(F.col("next_start_time"))
                - F.unix_micros(F.col("end_time"))
            ).cast("double")
            / 1e6
        ).alias("time_since"),
    )
