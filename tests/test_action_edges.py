"""Typed action-edge tables (SURVEY §1.3): primary actors, team-level
fallback, and opponent-side secondary attribution (J5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.pipeline.actions import build_action_edges, shape_actions
from mbai_gdb_spark.pipeline.fixtures import fixture_frames
from mbai_gdb_spark.pipeline.lineups import build_lineup_stints
from mbai_gdb_spark.pipeline.stints import build_player_stints

GAME_ID, HOME, AWAY = 1001, 10, 20


@pytest.fixture(scope="module")
def edge_ctx(spark):
    pbp, starters = fixture_frames(spark, game_id=GAME_ID, home_team=HOME, away_team=AWAY)
    actions = shape_actions(pbp).cache()
    lineup_stints = build_lineup_stints(pbp, starters).cache()
    player_stints = build_player_stints(lineup_stints).cache()
    edges = build_action_edges(actions, lineup_stints, player_stints).cache()
    return actions, player_stints, edges


def test_every_action_gets_a_primary_edge(edge_ctx):
    actions, _, edges = edge_ctx
    primary_types = {
        "TOOK_SHOT",
        "COMMITTED_FOUL",
        "REBOUNDED",
        "LOST_BALL",
        "COMMITTED_VIOLATION",
        "CALLED_TIMEOUT",
        "RECOVERED_JUMPBALL",
    }
    primary = edges.filter(F.col("edge_type").isin(*primary_types))
    assert primary.count() == actions.count()
    # exactly one primary edge per action
    assert primary.select("action_id").distinct().count() == actions.count()


def test_timeouts_attach_to_lineup_stints(edge_ctx):
    _, _, edges = edge_ctx
    t = edges.filter(F.col("edge_type") == "CALLED_TIMEOUT")
    assert t.count() > 0
    assert t.filter(F.col("src_kind") != "lineup_stint").count() == 0


def test_secondary_edges_resolve_to_correct_team(edge_ctx):
    actions, player_stints, edges = edge_ctx
    team_of_stint = {
        r.player_stint_id: r.team_id for r in player_stints.collect()
    }
    act = {r.action_id: r for r in actions.collect()}
    sec = edges.filter(
        F.col("edge_type").isin(
            "ASSISTED", "BLOCKED", "STOLE_BALL", "DREW_FOUL",
            "WON_JUMPBALL", "LOST_JUMPBALL",
        )
    ).collect()
    assert len(sec) > 0
    same_team = {"ASSISTED", "WON_JUMPBALL"}
    for e in sec:
        acting_team = act[e.action_id].team_id
        resolved_team = team_of_stint[e.src_id]
        if e.edge_type in same_team:
            assert resolved_team == acting_team, e
        else:  # opponent-side attribution (J5)
            assert resolved_team != acting_team, e


def test_all_secondary_actors_resolved(edge_ctx):
    actions, _, edges = edge_ctx
    for col, label in [
        ("assist_player_id", "ASSISTED"),
        ("block_player_id", "BLOCKED"),
        ("steal_player_id", "STOLE_BALL"),
        ("foul_drawn_player_id", "DREW_FOUL"),
        ("jump_won_player_id", "WON_JUMPBALL"),
        ("jump_lost_player_id", "LOST_JUMPBALL"),
    ]:
        n_expected = actions.filter(F.col(col).isNotNull()).count()
        n_edges = edges.filter(F.col("edge_type") == label).count()
        # fixture only names on-court actors, so resolution is total
        assert n_edges == n_expected, label
