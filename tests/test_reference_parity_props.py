"""Round-2 edge-property parity: wall-clock stint times, time_since on
cross-period NEXT edges, games-AT-arena edges, period sub-labels, and
the Player dimension (VERDICT items 6 + 8; reference
src/queries/game.py:21-31, 105-125, 202-206; season.py:12-14;
fetcher.py:60-71)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.pipeline.fixtures import fixture_frames
from mbai_gdb_spark.pipeline.lineups import build_lineup_stints
from mbai_gdb_spark.pipeline.periods import build_periods
from mbai_gdb_spark.pipeline.stints import build_player_stints, cross_period_next_chain


def _game(spark):
    return fixture_frames(spark, game_id=1001, home_team=10, away_team=20, n_ot=1)


def test_lineup_stints_carry_wall_clock_times(spark):
    pbp, starters = _game(spark)
    ls = build_lineup_stints(pbp, starters).collect()
    assert all(r.start_time is not None and r.end_time is not None for r in ls)
    assert all(r.end_time >= r.start_time for r in ls)
    assert all(r.time_duration >= 0 for r in ls)
    # Successor-derived end times (reference W3 semantics,
    # src/queries/game.py:118-125): within a (game, team, period) run,
    # each stint's end_time is exactly the next stint's start_time.
    by_key: dict = {}
    for r in ls:
        by_key.setdefault((r.game_id, r.team_id, r.period), []).append(r)
    for run in by_key.values():
        run.sort(key=lambda r: r.local_start)
        for cur, nxt in zip(run, run[1:]):
            assert cur.end_time == nxt.start_time


def test_stint_next_time_since_parity(spark):
    pbp, starters = _game(spark)
    ls = build_lineup_stints(pbp, starters)
    ps = build_player_stints(ls)
    chain = cross_period_next_chain(ls, ps)
    rows = chain.filter(F.col("next_sid").isNotNull()).collect()
    assert rows, "chain should produce NEXT edges"
    for r in rows:
        # Both gap props present and non-negative (the synthetic wall
        # clock is compressed vs the game clock, so no cross-relation
        # between the two is asserted — only monotone timelines).
        assert r.time_since is not None
        assert r.clock_since >= -1e-6
        assert r.time_since >= -1e-6


def test_period_sub_labels(spark):
    pbp, _ = _game(spark)
    periods = {r.n: r for r in build_periods(pbp).collect()}
    assert set(periods) == {1, 2, 3, 4, 5}
    for n in (1, 2, 3, 4):
        assert periods[n].labels == ["RegularTime", f"Q{n}"]
        assert not periods[n].is_overtime
    assert periods[5].labels == ["OverTime"]
    assert periods[5].is_overtime


def test_game_arena_edges(spark):
    from mbai_gdb_spark.pipeline.season import build_games, game_arena_edges
    from mbai_gdb_spark.pipeline.teams import build_team_graph

    teams = spark.createDataFrame(
        [
            (10, "A Team", "AAA", "Acity", "AS", "Arena A"),
            (20, "B Team", "BBB", "Bcity", "BS", "Arena B"),
        ],
        "id long, full_name string, abbreviation string, city string,"
        " state string, arena string",
    )
    g = build_team_graph(teams)
    schedule = spark.createDataFrame(
        [(1, "2024-01-01 19:00:00", 10, 20), (2, "2024-01-03 19:00:00", 20, 10)],
        "game_id long, datetime string, home_team_id long, away_team_id long",
    )
    games = build_games(schedule, season_id="2023-24")
    at = {r.game_id: r.arena_name for r in game_arena_edges(games, g["home_arena"]).collect()}
    assert at == {1: "Arena A", 2: "Arena B"}


def test_member_of_edges_five_per_lineup(spark):
    from mbai_gdb_spark.pipeline.players import member_of_edges

    pbp, starters = _game(spark)
    ls = build_lineup_stints(pbp, starters)
    member = member_of_edges(ls)
    per_lineup = member.groupBy("lineup_id").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    assert per_lineup and all(r.n == 5 for r in per_lineup)


def test_export_includes_player_nodes(spark):
    from mbai_gdb_spark.export.pyg import to_hetero_tensors
    from mbai_gdb_spark.pipeline.players import build_players, player_bio_frame
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

    pbp, starters = _game(spark)
    home = spark.createDataFrame([(1001, 10)], "game_id long, home_team_id long")
    tables = game_pipeline(pbp, starters, home)
    pids = [r.player_id for r in tables["player_stints"].select("player_id").distinct().collect()]
    tables["players"] = build_players(player_bio_frame(spark, pids))
    out = to_hetero_tensors(tables)

    n_players = out["player"]["num_nodes"]
    assert n_players == len(pids)
    assert out["player"]["x"].shape == (n_players, 2)
    ei = out[("player", "on_court", "player_stint")]
    assert ei.shape[0] == 2
    assert ei.shape[1] == out["player_stint"]["num_nodes"]  # one player per stint
    assert ei[0].max() < n_players
