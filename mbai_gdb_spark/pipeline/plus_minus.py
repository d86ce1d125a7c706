"""Lineup / player plus-minus (A4/A5 — the reference's marquee analytic).

The reference's SET_PLUS_MINUS (src/queries/game.py:773-809) is disabled
and depends on edges that are never created (SURVEY §2.11); this module
implements the intended semantics directly from the score events:

  plus_minus(stint) = points scored by the stint's team while on court
                    − points scored by the opponent in that interval.

Implementation: one containment join from scoring events to each team's
stint intervals (J3 — [start, end) so a stint boundary attributes the
point to the lineup on court when it was scored), then conditional sums
(A4) and a player-stint rollup (A5)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.intervals import interval_join


def lineup_plus_minus(
    actions: DataFrame, lineup_stints: DataFrame
) -> DataFrame:
    """Per lineup-stint: points_scored, points_conceded, plus_minus.

    Every scoring event joins to BOTH teams' containing stints on the
    game equi key; 'for' vs 'against' is a conditional on team match —
    one join, no per-team passes."""
    scoring = actions.filter(F.col("points") > 0).select(
        "game_id",
        F.col("team_id").alias("scoring_team_id"),
        "points",
        "global_clock",
    )
    stints = lineup_stints.select(
        "game_id",
        "team_id",
        "stint_id",
        "global_start",
        "global_end",
    )
    joined = interval_join(
        scoring,
        stints,
        equi_keys=["game_id"],
        event_time="global_clock",
        start="global_start",
        end="global_end",
        closed="left",
    )
    is_for = F.col("scoring_team_id") == F.col("team_id")
    per_stint = joined.groupBy("game_id", "team_id", "stint_id").agg(
        F.sum(F.when(is_for, F.col("points")).otherwise(0)).alias("points_scored"),
        F.sum(F.when(~is_for, F.col("points")).otherwise(0)).alias("points_conceded"),
    )
    # Left join back so scoreless stints keep 0/0 (OPTIONAL MATCH, J6).
    return (
        lineup_stints.join(
            per_stint.select("stint_id", "points_scored", "points_conceded"),
            "stint_id",
            "left",
        )
        .withColumn("points_scored", F.coalesce("points_scored", F.lit(0)))
        .withColumn("points_conceded", F.coalesce("points_conceded", F.lit(0)))
        .withColumn("plus_minus", F.col("points_scored") - F.col("points_conceded"))
    )


def player_plus_minus(
    lineup_pm: DataFrame, player_stint_edges: DataFrame
) -> DataFrame:
    """A5 rollup: player-stint plus-minus = sum over its lineup stints
    (reference src/queries/game.py:797-808)."""
    return (
        player_stint_edges.join(
            lineup_pm.select("stint_id", "points_scored", "points_conceded"),
            "stint_id",
        )
        .groupBy("game_id", "player_id", "player_stint_id")
        .agg(
            F.sum("points_scored").alias("points_scored"),
            F.sum("points_conceded").alias("points_conceded"),
            (F.sum("points_scored") - F.sum("points_conceded")).alias("plus_minus"),
        )
    )


def game_pipeline(
    pbp: DataFrame,
    starters: DataFrame,
    home_teams: DataFrame,
    persist_intermediates: bool = True,
) -> dict:
    """EP2 end-to-end: periods → lineups → stints → actions → scores →
    plus-minus.  Returns the full table set (lazy DataFrames).

    ``persist_intermediates`` caches the two fan-out points every
    downstream table reuses — the lineup-kernel output and the shaped
    actions — so materializing N outputs runs the kernel once, not N
    times.  (At cluster scale the same role is played by checkpointing
    or writing these two tables; the DAG shape is identical.)"""
    from mbai_gdb_spark.pipeline.actions import (
        action_next_chain,
        attribute_rebounds,
        build_action_edges,
        join_actions_to_stints,
        shape_actions,
    )
    from mbai_gdb_spark.pipeline.lineups import build_lineup_stints, on_court_next_edges
    from mbai_gdb_spark.pipeline.periods import build_periods, period_next_chain
    from mbai_gdb_spark.pipeline.scores import build_score_chain, score_next_chain
    from mbai_gdb_spark.pipeline.stints import (
        build_player_stints,
        cross_period_next_chain,
        player_stint_lineup_edges,
    )

    periods = build_periods(pbp)
    lineup_stints = build_lineup_stints(pbp, starters)
    actions = shape_actions(pbp)
    if persist_intermediates:
        lineup_stints = lineup_stints.persist()
        actions = actions.persist()
    player_stints = build_player_stints(lineup_stints)
    if persist_intermediates:
        player_stints = player_stints.persist()
    edges = player_stint_lineup_edges(player_stints)
    attributed = join_actions_to_stints(actions, lineup_stints)
    rebounds = attribute_rebounds(actions)
    next_actions = action_next_chain(actions)
    scores = build_score_chain(actions, home_teams)
    lineup_pm = lineup_plus_minus(actions, lineup_stints)
    player_pm = player_plus_minus(lineup_pm, edges)
    return {
        "periods": periods,
        "period_next": period_next_chain(periods),
        "lineup_stints": lineup_stints,
        "lineup_next": on_court_next_edges(lineup_stints),
        "player_stints": player_stints,
        "stint_edges": edges,
        "stint_next": cross_period_next_chain(lineup_stints, player_stints),
        "actions": actions,
        "actions_attributed": attributed,
        "action_edges": build_action_edges(actions, lineup_stints, player_stints),
        "rebound_attribution": rebounds,
        "action_next": next_actions,
        "scores": scores,
        "score_next": score_next_chain(scores),
        "lineup_plus_minus": lineup_pm,
        "player_plus_minus": player_pm,
    }


def materialize_outputs(
    tables: dict,
    output_names: tuple[str, ...],
    writer=None,
    max_workers: int = 4,
) -> None:
    """Materialize several independent pipeline outputs CONCURRENTLY.

    Spark jobs submitted from different threads overlap their scheduling
    and stage gaps (standard practice for multi-sink pipelines; at
    cluster scale the same shape applies with the FAIR scheduler).  The
    persisted fan-out tables are eagerly computed FIRST — concurrent
    jobs racing a cold lazy cache would each recompute the kernel.

    ``writer(df)`` performs the sink write; default is a noop-format
    write (benchmark mode).
    """
    from concurrent.futures import ThreadPoolExecutor

    if writer is None:
        def writer(df):
            df.write.format("noop").mode("overwrite").save()

    fanout = [
        tables[n]
        for n in ("lineup_stints", "actions", "player_stints")
        if n in tables and tables[n].is_cached
    ]
    if fanout:
        with ThreadPoolExecutor(len(fanout)) as ex:
            list(ex.map(lambda d: d.count(), fanout))
    with ThreadPoolExecutor(max_workers) as ex:
        list(ex.map(lambda n: writer(tables[n]), output_names))
