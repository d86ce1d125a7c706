"""Score chain: running totals with per-period reset (W8/W9).

The reference builds this with an 80-line Cypher ``reduce()`` accumulator
(MERGE_SCORES, src/queries/game.py:628-707): cumulative home/away score,
per-period subtotals resetting at period changes, margins, and a NEXT
chain over the score states.  Here: two window sums over one shuffle
(game partition; the per-period window adds the reset key) plus a lead()
chain — ~15 lines, fully parallel across games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.chain import chain_next
from mbai_gdb_spark.ops.windows import running_sum


def build_score_chain(actions: DataFrame, home_team_col_df: DataFrame) -> DataFrame:
    """One row per scoring action with running game and period scores.

    ``home_team_col_df``: (game_id, home_team_id) — from the schedule
    (reference GET_TEAMS, src/queries/game.py:1-8).
    """
    scoring = actions.filter(F.col("points") > 0).join(
        F.broadcast(home_team_col_df), "game_id"
    )
    is_home = F.col("team_id") == F.col("home_team_id")
    scoring = scoring.select(
        "game_id",
        "period",
        F.col("action_id").alias("score_action_id"),
        "global_clock",
        F.when(is_home, F.col("points")).otherwise(F.lit(0)).alias("home_pts"),
        F.when(~is_home, F.col("points")).otherwise(F.lit(0)).alias("away_pts"),
    )
    order = [F.col("global_clock"), F.col("score_action_id")]
    out = running_sum(scoring, ["game_id"], order, "home_pts", alias="home_score")
    out = running_sum(out, ["game_id"], order, "away_pts", alias="away_score")
    out = running_sum(
        out, ["game_id"], order, "home_pts", alias="period_home_score", reset_by=["period"]
    )
    out = running_sum(
        out, ["game_id"], order, "away_pts", alias="period_away_score", reset_by=["period"]
    )
    return out.select(
        "game_id",
        "period",
        "score_action_id",
        "global_clock",
        "home_score",
        "away_score",
        (F.col("home_score") - F.col("away_score")).alias("margin"),
        "period_home_score",
        "period_away_score",
        (F.col("period_home_score") - F.col("period_away_score")).alias("period_margin"),
    )


def score_next_chain(scores: DataFrame) -> DataFrame:
    """W9: NEXT edges over consecutive score states."""
    return chain_next(
        scores,
        partition_by=["game_id"],
        order_by=["global_clock", "score_action_id"],
        next_cols={"score_action_id": "next_score_action_id"},
    ).select("game_id", "score_action_id", "next_score_action_id")
