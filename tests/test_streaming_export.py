"""Streaming sessionization equivalence + tensor export tests."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.intervals import sessionize

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """availableNow file-stream sessions ≈ batch gaps-and-islands: same
    session count and event total per user.  (Boundary semantics differ
    only when a gap equals EXACTLY the threshold — measure-zero on
    microsecond data.)"""
    from mbai_gdb_spark.streaming.sessions import run_sessionize_available_now

    batch_events = read_table(spark, SF_DIR, "events")
    # File stream sources consume directories; stage the fixture there
    # (micro-batch per file).
    src_dir = str(tmp_path / "events_stream")
    batch_events.write.parquet(src_dir)
    streamed = run_sessionize_available_now(
        spark, src_dir, batch_events.schema, gap="30 minutes"
    )
    batch = sessionize(
        batch_events, ["user_id"], "ts", 1800.0, tie_break=["event_id"]
    ).groupBy("user_id", "session_id").count()

    s_counts = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in streamed.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
        .collect()
    }
    b_counts = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("count").alias("n_events"))
        .collect()
    }
    assert s_counts == b_counts


def test_hetero_tensor_export(spark):
    from mbai_gdb_spark.export.pyg import to_hetero_tensors
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

    pbp, starters = fixture_frames(spark, game_id=1001, home_team=10, away_team=20)
    home = spark.createDataFrame([(1001, 10)], "game_id long, home_team_id long")
    tables = game_pipeline(pbp, starters, home)
    out = to_hetero_tensors(tables)

    n_ls = out["lineup_stint"]["num_nodes"]
    n_ps = out["player_stint"]["num_nodes"]
    assert out["lineup_stint"]["x"].shape == (n_ls, 4)
    assert out["player_stint"]["x"].shape == (n_ps, 1)
    ei = out[("player_stint", "on_court_with", "lineup_stint")]
    assert ei.shape[0] == 2 and ei.dtype == np.int64
    assert ei[0].max() < n_ps and ei[1].max() < n_ls
    assert ei[0].min() >= 0 and ei[1].min() >= 0
    # every lineup stint is on-court-with at least one player stint
    assert len(set(ei[1].tolist())) == n_ls


def test_hetero_tensor_export_action_edges(spark):
    from mbai_gdb_spark.export.pyg import to_hetero_tensors
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

    pbp, starters = fixture_frames(spark, game_id=1001, home_team=10, away_team=20)
    home = spark.createDataFrame([(1001, 10)], "game_id long, home_team_id long")
    out = to_hetero_tensors(game_pipeline(pbp, starters, home))

    n_act = out["action"]["num_nodes"]
    assert out["action"]["x"].shape == (n_act, 4)
    shot_edges = out[("player_stint", "took_shot", "action")]
    assert shot_edges.shape[0] == 2 and shot_edges.shape[1] > 0
    assert shot_edges[1].max() < n_act
    assert ("lineup_stint", "called_timeout", "action") in out


def test_hetero_tensor_export_scores(spark):
    from mbai_gdb_spark.export.pyg import to_hetero_tensors
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

    pbp, starters = fixture_frames(spark, game_id=1001, home_team=10, away_team=20)
    home = spark.createDataFrame([(1001, 10)], "game_id long, home_team_id long")
    out = to_hetero_tensors(game_pipeline(pbp, starters, home))

    n_s = out["score"]["num_nodes"]
    assert out["score"]["x"].shape == (n_s, 4)
    gen = out[("action", "generated_score", "score")]
    assert gen.shape == (2, n_s)  # one score state per scoring action
    nxt = out[("score", "next", "score")]
    assert nxt.shape[1] == n_s - 1  # a total order over score states


def test_hetero_tensor_export_multigame_no_collapse(spark):
    """action_id / score_action_id restart at 1 per game: a multi-game
    export must keep those nodes distinct (composite (game_id, id)
    dense indices) and wire every edge inside its own game."""
    from mbai_gdb_spark.export.pyg import to_hetero_tensors
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

    games = [(4001, 5), (4002, 17)]
    pbp = starters = None
    for gid, seed in games:
        p, s = fixture_frames(
            spark, game_id=gid, home_team=10, away_team=20, seed=seed
        )
        pbp = p if pbp is None else pbp.unionByName(p)
        starters = s if starters is None else starters.unionByName(s)
    home = spark.createDataFrame(
        [(g, 10) for g, _ in games], "game_id long, home_team_id long"
    )
    tables = game_pipeline(pbp, starters, home)
    out = to_hetero_tensors(tables)

    # node counts are the SUM over games (no cross-game id collapse)
    n_act = out["action"]["num_nodes"]
    per_game = {
        r.game_id: r.n
        for r in tables["actions"]
        .groupBy("game_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert n_act == sum(per_game.values())
    assert out["action"]["x"].shape == (n_act, 4)
    n_s = out["score"]["num_nodes"]
    gen = out[("action", "generated_score", "score")]
    assert gen.shape == (2, n_s)  # exactly one edge per score state
    # dense indices form one contiguous 0..N-1 space across both games
    nxt = out[("score", "next", "score")]
    assert nxt.shape[1] == n_s - len(games)  # per-game total orders


def test_dense_index_empty_partitioned_frame(spark):
    """A table with zero rows (e.g. a pbp slice with no made shots →
    empty scores) must yield an empty index, not a schema-inference
    crash on the empty offsets side-table."""
    from mbai_gdb_spark.export.pyg import dense_index

    empty = spark.createDataFrame([], "game_id long, score_action_id long")
    idx = dense_index(empty, "score_action_id", partition_col="game_id")
    assert idx.count() == 0
    assert "dense_idx" in idx.columns


def test_player_features_align_with_partial_roster(spark):
    """A players dimension missing a stint player (10-day contract) must
    produce a zero-filled feature row at that player's dense index — not
    a shorter x misaligning every subsequent node."""
    from mbai_gdb_spark.export.pyg import to_hetero_tensors
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

    pbp, starters = fixture_frames(spark, game_id=1001, home_team=10, away_team=20)
    home = spark.createDataFrame([(1001, 10)], "game_id long, home_team_id long")
    tables = game_pipeline(pbp, starters, home)
    all_players = sorted(
        r.player_id for r in tables["player_stints"].select("player_id").distinct().collect()
    )
    # roster covers everyone EXCEPT the last player
    tables["players"] = spark.createDataFrame(
        [(p, 78.0, 210.0) for p in all_players[:-1]],
        "player_id long, height_in double, weight_lb double",
    )
    out = to_hetero_tensors(tables)
    x = out["player"]["x"]
    assert x.shape == (out["player"]["num_nodes"], 2)
    assert len(all_players) == out["player"]["num_nodes"]
    # exactly one zero-filled row (the missing player), rest carry bio
    zero_rows = (x == 0.0).all(axis=1).sum()
    assert zero_rows == 1
