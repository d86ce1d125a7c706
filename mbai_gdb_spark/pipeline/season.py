"""Season/schedule pipeline (EP1 — reference MERGE_SEASON,
src/queries/season.py:3-28, dispatched by src/managers/season.py:8-16).

Upserts games from the schedule and builds the per-team NEXT-game chain
(W1) with wall-clock gaps.  The reference materializes per-team ordered
game lists and UNWINDs pairwise; here it's one lead() window partitioned
by team — the schedule for all 1230 games of a season is a single light
shuffle, and the same plan scales to any number of seasons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.chain import chain_next


def build_games(schedule: DataFrame, season_id: int | str) -> DataFrame:
    """Typed games table from the schedule source (S4): one row per game
    with home/away FKs and the season id."""
    return schedule.select(
        F.col("game_id"),
        F.to_timestamp("datetime").alias("date"),
        "home_team_id",
        "away_team_id",
        F.lit(str(season_id)).alias("season_id"),
    ).dropDuplicates(["game_id"])


def game_arena_edges(games: DataFrame, home_arena: DataFrame) -> DataFrame:
    """(Game)-[:AT]->(Arena) via the home team's arena (reference
    MERGE_SEASON, src/queries/season.py:12-14: the schedule joins the
    home team's HOME_ARENA edge before creating AT).  ``home_arena`` is
    the (team_id, arena_name) edge table from pipeline.teams."""
    return games.join(
        F.broadcast(home_arena.select(
            F.col("team_id").alias("home_team_id"), "arena_name"
        )),
        "home_team_id",
    ).select("game_id", "arena_name")


def team_game_edges(games: DataFrame) -> DataFrame:
    """(team, game, played_home) participation edges — the
    PLAYED_HOME/PLAYED_AWAY relationship table."""
    home = games.select(
        F.col("home_team_id").alias("team_id"), "game_id", "date", F.lit(True).alias("played_home")
    )
    away = games.select(
        F.col("away_team_id").alias("team_id"), "game_id", "date", F.lit(False).alias("played_home")
    )
    return home.unionByName(away)


def team_next_game_chain(games: DataFrame) -> DataFrame:
    """W1: each team's games in date order → NEXT edges with rest gap."""
    edges = team_game_edges(games)
    chained = chain_next(
        edges.withColumn("date_us", F.unix_micros(F.col("date").cast("timestamp"))),
        partition_by=["team_id"],
        order_by=["date", "game_id"],
        next_cols={"game_id": "next_game_id", "date_us": "next_date_us"},
    )
    return chained.select(
        "team_id",
        "game_id",
        "next_game_id",
        (F.col("next_date_us") - F.col("date_us")).alias("rest_micros"),
    )
