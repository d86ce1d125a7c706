"""Driver-visible NBA-domain queries (reference-parity evidence).

These run the game pipeline on the deterministic fixture from
``pipeline.fixtures`` (the driver's generic tables carry no play-by-play
data, so the fixture IS the input — ``sf_dir`` is ignored).  For the
SQL-expressible stages the oracle inlines the SAME fixture rows as a
VALUES CTE, so the t2 gate checks real pipeline semantics end-to-end:

- nba_score_chain         — W8 running game/period scores (full oracle)
- nba_action_next_chain   — W7 priority-ordered NEXT chain (full oracle)
- nba_rebound_attribution — J7/J8 as-of + claim-once (full oracle)
- nba_season_next_game    — W1 per-team schedule chain (full oracle)
- nba_lineup_plus_minus   — needs the procedural lineup kernel (W11,
                            applyInPandas) → rows-only check
- nba_player_stints       — same reason → rows-only check
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.pipeline.fixtures import make_game
from mbai_gdb_spark.queries import query

GAME_ID, HOME, AWAY = 1001, 10, 20


def _fixture(spark):
    from mbai_gdb_spark.pipeline.fixtures import fixture_frames

    return fixture_frames(spark, game_id=GAME_ID, home_team=HOME, away_team=AWAY, n_ot=1)


def _home_df(spark):
    return spark.createDataFrame([(GAME_ID, HOME)], "game_id long, home_team_id long")


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if hasattr(v, "isoformat"):  # datetime
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    return repr(v)


def _fixture_pbp_cte() -> str:
    """The fixture's play-by-play as a VALUES CTE (exactly the rows the
    Spark side builds via createDataFrame — same generator, same seed)."""
    pbp, _ = make_game(game_id=GAME_ID, home_team=HOME, away_team=AWAY, n_ot=1)
    cols = (
        "action_id",
        "timeActual",
        "period",
        "clock",
        "actionType",
        "subType",
        "shotResult",
        "teamId",
        "personId",
    )
    rows = ",\n        ".join(
        "(" + ", ".join(_sql_literal(r[c]) for c in cols) + ")" for r in pbp
    )
    return f"""
    pbp(action_id, time, period, clock, action_type, sub_type, shot_result,
        team_id, person_id) AS (VALUES
        {rows}
    )"""


# Shared SQL fragments mirroring pipeline.periods / pipeline.actions.
_SQL_PLEN = "(CASE WHEN period <= 4 THEN 720.0 ELSE 300.0 END)"
_SQL_OFFSET = (
    "(CASE WHEN period <= 4 THEN (period - 1) * 720.0"
    " ELSE 2880.0 + (period - 5) * 300.0 END)"
)
_SQL_LOCAL = (
    f"({_SQL_PLEN} - (CAST(regexp_extract(clock, 'PT(\\d+)M', 1) AS DOUBLE) * 60"
    " + CAST(regexp_extract(clock, 'M([\\d.]+)S', 1) AS DOUBLE))"
    " + (CASE WHEN action_type = 'freethrow'"
    "      THEN CAST(string_split(sub_type, ' ')[1] AS DOUBLE) * 0.1 ELSE 0.0 END))"
)
_SQL_GLOBAL = f"({_SQL_OFFSET} + {_SQL_LOCAL})"
_SQL_POINTS = (
    "(CASE WHEN action_type = '2pt' AND shot_result = 'Made' THEN 2"
    " WHEN action_type = '3pt' AND shot_result = 'Made' THEN 3"
    " WHEN action_type = 'freethrow' AND shot_result = 'Made' THEN 1"
    " ELSE 0 END)"
)


def _sql_actions_cte() -> str:
    return f"""
    actions AS (
        SELECT action_id, time, period, team_id, person_id, action_type,
               shot_result,
               {_SQL_GLOBAL} AS global_clock,
               {_SQL_POINTS} AS points
        FROM pbp WHERE action_type NOT IN ('period', 'substitution')
    )"""


@query(
    "nba_score_chain",
    f"""
    WITH {_fixture_pbp_cte()},
    {_sql_actions_cte()},
    scoring AS (
        SELECT period, action_id AS score_action_id, global_clock,
               CASE WHEN team_id = {HOME} THEN points ELSE 0 END AS home_pts,
               CASE WHEN team_id = {AWAY} THEN points ELSE 0 END AS away_pts
        FROM actions WHERE points > 0
    )
    SELECT period, score_action_id, global_clock,
           CAST(SUM(home_pts) OVER w AS BIGINT) AS home_score,
           CAST(SUM(away_pts) OVER w AS BIGINT) AS away_score,
           CAST(SUM(home_pts) OVER w - SUM(away_pts) OVER w AS BIGINT) AS margin,
           CAST(SUM(home_pts) OVER wp AS BIGINT) AS period_home_score,
           CAST(SUM(away_pts) OVER wp AS BIGINT) AS period_away_score,
           CAST(SUM(home_pts) OVER wp - SUM(away_pts) OVER wp AS BIGINT)
               AS period_margin
    FROM scoring
    WINDOW w AS (ORDER BY global_clock, score_action_id ROWS UNBOUNDED PRECEDING),
           wp AS (PARTITION BY period ORDER BY global_clock, score_action_id
                  ROWS UNBOUNDED PRECEDING)
    """,
)
def nba_score_chain(spark, sf_dir):
    """W8 on the real domain: running game + period scores from shaped
    play-by-play (reference MERGE_SCORES, src/queries/game.py:628-707)."""
    from mbai_gdb_spark.pipeline.actions import shape_actions
    from mbai_gdb_spark.pipeline.scores import build_score_chain

    pbp, _ = _fixture(spark)
    scores = build_score_chain(shape_actions(pbp), _home_df(spark))
    return scores.select(
        "period",
        "score_action_id",
        "global_clock",
        "home_score",
        "away_score",
        "margin",
        "period_home_score",
        "period_away_score",
        "period_margin",
    )


@query(
    "nba_action_next_chain",
    f"""
    WITH {_fixture_pbp_cte()},
    {_sql_actions_cte()},
    prio AS (
        SELECT *,
               CASE action_type
                    WHEN 'jumpball' THEN 1 WHEN 'violation' THEN 2
                    WHEN 'foul' THEN 3 WHEN '2pt' THEN 4 WHEN '3pt' THEN 4
                    WHEN 'freethrow' THEN 5 WHEN 'rebound' THEN 6
                    WHEN 'turnover' THEN 7 WHEN 'substitution' THEN 8
                    WHEN 'timeout' THEN 9 ELSE 9 END AS priority
        FROM actions
    )
    SELECT period, action_id, next_action_id, time_delta_us, clock_delta_s FROM (
        SELECT period, action_id,
               LEAD(action_id) OVER w AS next_action_id,
               LEAD(epoch_us(time)) OVER w - epoch_us(time) AS time_delta_us,
               LEAD(global_clock) OVER w - global_clock AS clock_delta_s
        FROM prio
        WINDOW w AS (PARTITION BY period
                     ORDER BY time, global_clock, priority, action_id)
    ) WHERE next_action_id IS NOT NULL
    """,
)
def nba_action_next_chain(spark, sf_dir):
    """W7 on the real domain: per-period global action ordering with
    label-priority tie-break (reference MERGE_NEXT_ACTION,
    src/queries/game.py:744-769)."""
    from mbai_gdb_spark.ops.chain import chain_next, with_priority
    from mbai_gdb_spark.pipeline.actions import ACTION_PRIORITY, shape_actions

    pbp, _ = _fixture(spark)
    actions = shape_actions(pbp)
    prio = with_priority(actions, "action_type", ACTION_PRIORITY, default=9)
    chained = chain_next(
        prio.withColumn("t_us", F.unix_micros(F.col("time").cast("timestamp"))),
        partition_by=["game_id", "period"],
        order_by=[F.col("time"), F.col("global_clock"), F.col("priority"), F.col("action_id")],
        next_cols={
            "action_id": "next_action_id",
            "t_us": "next_t_us",
            "global_clock": "next_global_clock",
        },
    )
    return chained.select(
        "period",
        "action_id",
        "next_action_id",
        (F.col("next_t_us") - F.col("t_us")).alias("time_delta_us"),
        (F.col("next_global_clock") - F.col("global_clock")).alias("clock_delta_s"),
    )


@query(
    "nba_rebound_attribution",
    f"""
    WITH {_fixture_pbp_cte()},
    {_sql_actions_cte()},
    rebounds AS (
        SELECT action_id AS rebound_id, global_clock
        FROM actions WHERE action_type = 'rebound'
    ),
    missed AS (
        SELECT action_id AS shot_id, global_clock AS shot_clock
        FROM actions
        WHERE action_type IN ('2pt', '3pt') AND shot_result = 'Missed'
    ),
    matched AS (
        SELECT r.rebound_id, r.global_clock, m.shot_id
        FROM rebounds r
        JOIN LATERAL (
            SELECT shot_id FROM missed m
            WHERE m.shot_clock <= r.global_clock
              AND r.global_clock - m.shot_clock <= 10.0
            ORDER BY m.shot_clock DESC, m.shot_id DESC LIMIT 1
        ) m ON TRUE
    )
    SELECT rebound_id, shot_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY shot_id
                                     ORDER BY global_clock, rebound_id) AS rn
        FROM matched
    ) WHERE rn = 1
    """,
)
def nba_rebound_attribution(spark, sf_dir):
    """J7/J8 on the real domain: rebound → latest missed shot within 10 s,
    each shot claimed once (intended semantics of the reference's broken
    MERGE_REBOUNDS, src/queries/game.py:506-513 / SURVEY §2.11)."""
    from mbai_gdb_spark.pipeline.actions import attribute_rebounds, shape_actions

    pbp, _ = _fixture(spark)
    return attribute_rebounds(shape_actions(pbp)).select("rebound_id", "shot_id")


_SCHEDULE = [
    (2001, "2024-01-01 19:00:00", 10, 20),
    (2002, "2024-01-03 19:00:00", 20, 30),
    (2003, "2024-01-05 19:00:00", 30, 10),
    (2004, "2024-01-08 19:00:00", 10, 30),
    (2005, "2024-01-09 19:00:00", 20, 10),
    (2006, "2024-01-12 19:00:00", 30, 20),
]


@query(
    "nba_season_next_game",
    f"""
    WITH schedule(game_id, datetime, home_team_id, away_team_id) AS (VALUES
        {", ".join(f"({g}, TIMESTAMP '{d}', {h}, {a})" for g, d, h, a in _SCHEDULE)}
    ),
    team_games AS (
        SELECT home_team_id AS team_id, game_id, datetime FROM schedule
        UNION ALL
        SELECT away_team_id AS team_id, game_id, datetime FROM schedule
    )
    SELECT team_id, game_id, next_game_id, rest_micros FROM (
        SELECT team_id, game_id,
               LEAD(game_id) OVER w AS next_game_id,
               LEAD(epoch_us(datetime)) OVER w - epoch_us(datetime) AS rest_micros
        FROM team_games
        WINDOW w AS (PARTITION BY team_id ORDER BY datetime, game_id)
    ) WHERE next_game_id IS NOT NULL
    """,
)
def nba_season_next_game(spark, sf_dir):
    """W1 on the real domain: per-team NEXT-game chain with rest gaps
    (reference MERGE_SEASON, src/queries/season.py:18-27)."""
    from mbai_gdb_spark.pipeline.season import build_games, team_next_game_chain

    schedule = spark.createDataFrame(
        _SCHEDULE, "game_id long, datetime string, home_team_id long, away_team_id long"
    )
    return team_next_game_chain(build_games(schedule, season_id="2023-24")).select(
        "team_id", "game_id", "next_game_id", "rest_micros"
    )


def _w11_oracle(cte_name: str, cols: list[str], rows, float_cols: set[str]) -> str:
    """Golden-VALUES oracle: SELECT the pinned expected rows, casting the
    float columns to DOUBLE (DuckDB types bare decimal literals as
    DECIMAL, which would break the driver's %.10g float hashing)."""
    from mbai_gdb_spark.pipeline.w11_gold import values_cte

    select = ", ".join(
        f"CAST({c} AS DOUBLE) AS {c}" if c in float_cols else c for c in cols
    )
    return f"WITH {values_cte(cte_name, cols, rows)}\n    SELECT {select} FROM {cte_name}"


def _lineup_pm_oracle() -> str:
    from mbai_gdb_spark.pipeline.w11_gold import _LINEUP_PM_GOLD

    return _w11_oracle(
        "expected_pm",
        [
            "game_id", "team_id", "stint_id", "lineup_id", "period",
            "local_start", "clock_duration", "points_scored",
            "points_conceded", "plus_minus",
        ],
        _LINEUP_PM_GOLD,
        {"local_start", "clock_duration"},
    )


def _player_stints_oracle() -> str:
    from mbai_gdb_spark.pipeline.w11_gold import _PLAYER_STINT_GOLD

    return _w11_oracle(
        "expected_ps",
        [
            "game_id", "team_id", "player_id", "player_stint_id",
            "global_start", "global_end", "clock_duration",
            "first_period", "last_period",
        ],
        _PLAYER_STINT_GOLD,
        {"global_start", "global_end", "clock_duration"},
    )


@query("nba_lineup_plus_minus", _lineup_pm_oracle())
def nba_lineup_plus_minus(spark, sf_dir):
    """Flagship analytic end-to-end: lineup stints (applyInPandas kernel)
    → containment-joined scoring events → plus-minus ledger.  The kernel
    itself is procedural (not SQL-expressible) but the fixture is
    deterministic, so the oracle pins the expected OUTPUT as a golden
    VALUES table (mbai_gdb_spark/pipeline/w11_gold.py) — validated
    independently by the reconciliation invariants in
    tests/test_pipeline_game.py (Σ plus_minus = final margin)."""
    from mbai_gdb_spark.pipeline.lineups import build_lineup_stints
    from mbai_gdb_spark.pipeline.actions import shape_actions
    from mbai_gdb_spark.pipeline.plus_minus import lineup_plus_minus

    pbp, starters = _fixture(spark)
    pm = lineup_plus_minus(shape_actions(pbp), build_lineup_stints(pbp, starters))
    return pm.select(
        "game_id",
        "team_id",
        "stint_id",
        "lineup_id",
        "period",
        "local_start",
        "clock_duration",
        "points_scored",
        "points_conceded",
        "plus_minus",
    )


@query("nba_player_stints", _player_stints_oracle())
def nba_player_stints(spark, sf_dir):
    """Player stints via gaps-and-islands over kernel output (W5/W6).
    Oracle = golden VALUES snapshot of the deterministic fixture (see
    nba_lineup_plus_minus / pipeline/w11_gold.py; stint-partition
    invariants guard the snapshot in tests/test_pipeline_game.py)."""
    from mbai_gdb_spark.pipeline.lineups import build_lineup_stints
    from mbai_gdb_spark.pipeline.stints import build_player_stints

    pbp, starters = _fixture(spark)
    ps = build_player_stints(build_lineup_stints(pbp, starters))
    return ps.select(
        "game_id",
        "team_id",
        "player_id",
        "player_stint_id",
        "global_start",
        "global_end",
        "clock_duration",
        "first_period",
        "last_period",
    )


def _player_dim_oracle() -> str:
    from mbai_gdb_spark.pipeline.players import (
        PLAYER_BIO_COLUMNS,
        synthetic_player_bio,
    )
    from mbai_gdb_spark.pipeline.w11_gold import (
        _LINEUP_PM_GOLD,
        _PLAYER_STINT_GOLD,
        values_cte,
    )

    pids = sorted({r[2] for r in _PLAYER_STINT_GOLD})
    bio = values_cte("bio", PLAYER_BIO_COLUMNS, synthetic_player_bio(pids))
    pm = values_cte(
        "expected_pm",
        [
            "game_id", "team_id", "stint_id", "lineup_id", "period",
            "local_start", "clock_duration", "points_scored",
            "points_conceded", "plus_minus",
        ],
        _LINEUP_PM_GOLD,
    )
    ps = values_cte(
        "expected_ps",
        [
            "game_id", "team_id", "player_id", "player_stint_id",
            "global_start", "global_end", "clock_duration",
            "first_period", "last_period",
        ],
        _PLAYER_STINT_GOLD,
    )
    return f"""
    WITH {bio},
    {pm},
    {ps},
    member AS (
        SELECT DISTINCT CAST(t AS BIGINT) AS player_id, lineup_id
        FROM (SELECT DISTINCT lineup_id FROM expected_pm),
             UNNEST(string_split(lineup_id, '_')) AS u(t)
    ),
    nl AS (
        SELECT player_id, COUNT(DISTINCT lineup_id) AS n_lineups
        FROM member GROUP BY player_id
    ),
    play AS (
        SELECT player_id, COUNT(*) AS n_stints,
               CAST(SUM(CAST(ROUND(clock_duration * 100) AS BIGINT)) AS BIGINT)
                   AS seconds_played_cs
        FROM expected_ps GROUP BY player_id
    )
    SELECT b.player_id, b.first_name, b.last_name, b.birthdate, b.height_in,
           b.weight_lb, b.position, b.school, b.country,
           nl.n_lineups, play.n_stints, play.seconds_played_cs
    FROM bio b
    JOIN nl   ON nl.player_id = b.player_id
    JOIN play ON play.player_id = b.player_id
    """


@query("nba_player_dimension", _player_dim_oracle())
def nba_player_dimension(spark, sf_dir):
    """S3 — the Player node type: 8-column bio projection (reference
    fetch_player_info, src/fetcher.py:60-71) joined with MEMBER_OF
    lineup membership (src/queries/game.py:73-77) and per-player court
    time rolled up from the W11 player stints.  Bio rows are the
    deterministic synthetic fixture (pipeline.players); court time uses
    the exact fixed-point centisecond convention."""
    from mbai_gdb_spark.pipeline.lineups import build_lineup_stints
    from mbai_gdb_spark.pipeline.players import (
        build_players,
        member_of_edges,
        player_bio_frame,
    )
    from mbai_gdb_spark.pipeline.stints import build_player_stints
    from mbai_gdb_spark.pipeline.w11_gold import _PLAYER_STINT_GOLD

    pbp, starters = _fixture(spark)
    ls = build_lineup_stints(pbp, starters)
    ps = build_player_stints(ls)
    pids = sorted({r[2] for r in _PLAYER_STINT_GOLD})
    players = build_players(player_bio_frame(spark, pids))
    nl = (
        member_of_edges(ls)
        .groupBy("player_id")
        .agg(F.countDistinct("lineup_id").alias("n_lineups"))
    )
    play = ps.groupBy("player_id").agg(
        F.count(F.lit(1)).alias("n_stints"),
        F.sum(F.round(F.col("clock_duration") * 100, 0).cast("long")).alias(
            "seconds_played_cs"
        ),
    )
    return players.join(F.broadcast(nl), "player_id").join(
        F.broadcast(play), "player_id"
    )


def _export_ei_oracle() -> str:
    from mbai_gdb_spark.pipeline.w11_gold import (
        _LINEUP_PM_GOLD,
        _PLAYER_STINT_GOLD,
        values_cte,
    )

    pm = values_cte(
        "expected_pm",
        [
            "game_id", "team_id", "stint_id", "lineup_id", "period",
            "local_start", "clock_duration", "points_scored",
            "points_conceded", "plus_minus",
        ],
        _LINEUP_PM_GOLD,
    )
    ps = values_cte(
        "expected_ps",
        [
            "game_id", "team_id", "player_id", "player_stint_id",
            "global_start", "global_end", "clock_duration",
            "first_period", "last_period",
        ],
        _PLAYER_STINT_GOLD,
    )
    offset = (
        "(CASE WHEN period <= 4 THEN (period - 1) * 720.0"
        " ELSE 2880.0 + (period - 5) * 300.0 END)"
    )
    return f"""
    WITH {pm},
    {ps},
    pm AS (
        SELECT stint_id, lineup_id, team_id,
               {offset} + local_start AS g_start,
               {offset} + local_start + clock_duration AS g_end
        FROM expected_pm
    ),
    edges AS (
        SELECT p.player_stint_id, m.stint_id
        FROM expected_ps p
        JOIN pm m ON m.team_id = p.team_id
               AND m.g_start >= p.global_start - 1e-6
               AND m.g_end   <= p.global_end + 1e-6
               AND list_contains(string_split(m.lineup_id, '_'),
                                 CAST(p.player_id AS VARCHAR))
    ),
    ps_idx AS (
        SELECT player_stint_id,
               CAST(ROW_NUMBER() OVER (ORDER BY player_stint_id) - 1 AS BIGINT)
                   AS src_idx
        FROM (SELECT DISTINCT player_stint_id FROM expected_ps)
    ),
    ls_idx AS (
        SELECT stint_id,
               CAST(ROW_NUMBER() OVER (ORDER BY stint_id) - 1 AS BIGINT) AS dst_idx
        FROM (SELECT DISTINCT stint_id FROM expected_pm)
    )
    SELECT e.player_stint_id, e.stint_id, i.src_idx, j.dst_idx
    FROM edges e
    JOIN ps_idx i ON i.player_stint_id = e.player_stint_id
    JOIN ls_idx j ON j.stint_id = e.stint_id
    """


@query("nba_export_edge_index", _export_ei_oracle())
def nba_export_edge_index(spark, sf_dir):
    """S9 as a checkable query: the ON_COURT_WITH edge list in dense
    export coordinates (the [2, E] tensor's rows, flattened with their
    natural keys).  The oracle DERIVES the edges independently from the
    two golden stint tables — a lineup stint belongs to a player stint
    iff its interval is contained and its lineup includes the player —
    and rebuilds the same rank-based dense indices in SQL (reference
    export contract: src/managers/game.py:360-397, 435-457)."""
    from mbai_gdb_spark.export.pyg import dense_index
    from mbai_gdb_spark.pipeline.lineups import build_lineup_stints
    from mbai_gdb_spark.pipeline.stints import (
        build_player_stints,
        player_stint_lineup_edges,
    )

    pbp, starters = _fixture(spark)
    ls = build_lineup_stints(pbp, starters)
    ps = build_player_stints(ls)
    edges = player_stint_lineup_edges(ps)
    ps_idx = dense_index(ps, "player_stint_id", partition_col="game_id")
    ls_idx = dense_index(ls, "stint_id", partition_col="game_id")
    return (
        edges.join(ps_idx, ["game_id", "player_stint_id"])
        .withColumnRenamed("dense_idx", "src_idx")
        .join(ls_idx, ["game_id", "stint_id"])
        .withColumnRenamed("dense_idx", "dst_idx")
        .select("player_stint_id", "stint_id", "src_idx", "dst_idx")
    )


@query(
    "nba_possessions",
    f"""
    WITH {_fixture_pbp_cte()},
    actions AS (
        SELECT action_id, time, period, team_id, person_id, action_type,
               sub_type, shot_result,
               {_SQL_GLOBAL} AS global_clock,
               {_SQL_POINTS} AS points,
               CASE action_type
                    WHEN 'jumpball' THEN 1 WHEN 'violation' THEN 2
                    WHEN 'foul' THEN 3 WHEN '2pt' THEN 4 WHEN '3pt' THEN 4
                    WHEN 'freethrow' THEN 5 WHEN 'rebound' THEN 6
                    WHEN 'turnover' THEN 7 WHEN 'substitution' THEN 8
                    WHEN 'timeout' THEN 9 ELSE 9 END AS priority
        FROM pbp WHERE action_type NOT IN ('period', 'substitution')
    ),
    tagged AS (
        SELECT *,
               CASE WHEN action_type = 'turnover'
                      OR (action_type IN ('2pt', '3pt') AND shot_result = 'Made')
                      OR (action_type = 'rebound' AND sub_type = 'defensive')
                      OR (action_type = 'freethrow' AND shot_result = 'Made'
                          AND sub_type = '2 of 2')
                    THEN 1 ELSE 0 END AS ends
        FROM actions
    )
    SELECT possession_seq,
           MIN(global_clock) AS start_clock,
           MAX(global_clock) AS end_clock,
           COUNT(*) AS n_actions,
           CAST(SUM(points) AS BIGINT) AS points
    FROM (
        SELECT *,
               CAST(COALESCE(SUM(ends) OVER (ORDER BY global_clock, priority, action_id
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0) + 1 AS BIGINT)
                   AS possession_seq
        FROM tagged
    ) GROUP BY possession_seq
    """,
)
def nba_possessions(spark, sf_dir):
    """Possession segmentation — the operator the reference declares in
    its schema but never implements (setup.py:18,32-33); derived here
    with a single running-count window (full oracle)."""
    from mbai_gdb_spark.pipeline.actions import derive_possessions, shape_actions

    pbp, _ = _fixture(spark)
    return derive_possessions(shape_actions(pbp)).select(
        "possession_seq", "start_clock", "end_clock", "n_actions", "points"
    )


_TEAMS = [
    (10, "Springfield Hoops", "SPH", "Springfield", "IL", "Hoop Arena"),
    (20, "Rivertown Giants", "RTG", "Rivertown", "OH", "Giant Dome"),
    (30, "Lakeside Comets", "LSC", "Lakeside", "MI", "Comet Center"),
    (40, "Hillview Foxes", "HVF", "Hillview", "OH", "Fox Den"),
]


@query(
    "nba_team_graph",
    f"""
    WITH teams(id, full_name, abbreviation, city, state, arena) AS (VALUES
        {", ".join("(" + ", ".join([str(t[0])] + [f"'{x}'" for x in t[1:]]) + ")" for t in _TEAMS)}
    )
    SELECT t.id AS team_id, t.abbreviation, t.arena AS arena_name,
           t.city AS city_name, t.state AS state_name,
           COUNT(*) OVER (PARTITION BY t.state) AS teams_in_state
    FROM teams t
    """,
)
def nba_team_graph(spark, sf_dir):
    """Static team-dimension graph (reference MERGE_TEAM,
    src/queries/team.py:3-13): node/edge frames re-joined into a flat
    team summary with a per-state window (proves the edge tables carry
    the same information as the reference's graph)."""
    from pyspark.sql import Window

    from mbai_gdb_spark.pipeline.teams import build_team_graph

    teams = spark.createDataFrame(
        _TEAMS, "id long, full_name string, abbreviation string, city string, state string, arena string"
    )
    g = build_team_graph(teams)
    flat = (
        g["teams"]
        .join(g["home_arena"], g["teams"].id == g["home_arena"].team_id)
        .join(g["in_city"], "team_id")
        .join(g["city_in_state"], "city_name")
    )
    w = Window.partitionBy("state_name")
    return flat.select(
        "team_id",
        "abbreviation",
        "arena_name",
        "city_name",
        "state_name",
        F.count(F.lit(1)).over(w).alias("teams_in_state"),
    )


# --- W2 / W6 / W9 direct driver rows (round 3) -----------------------------
# The last SURVEY §2 rows without their own CORRECTNESS line.  W2 and W9
# are fully SQL-expressible from the fixture play-by-play; W6 re-derives
# the island/union/lead algebra in SQL from the pinned W11 kernel output
# (pipeline/w11_gold.py), so only the procedural kernel is golden — the
# W5/W6 window math is checked for real.


@query(
    "nba_period_chain",
    f"""
    WITH {_fixture_pbp_cte()},
    markers AS (
        SELECT period AS n, MIN(time) AS pstart, MAX(time) AS pend
        FROM pbp WHERE action_type = 'period' GROUP BY period
    )
    SELECT game_id, period_id, next_period_id, gap_s FROM (
        SELECT CAST({GAME_ID} AS BIGINT) AS game_id,
               '{GAME_ID}_' || CAST(n AS VARCHAR) AS period_id,
               LEAD('{GAME_ID}_' || CAST(n AS VARCHAR)) OVER w AS next_period_id,
               CAST(LEAD(epoch_us(pstart)) OVER w - epoch_us(pend) AS DOUBLE) / 1e6
                   AS gap_s
        FROM markers WINDOW w AS (ORDER BY n)
    ) WHERE next_period_id IS NOT NULL
    """,
)
def nba_period_chain(spark, sf_dir):
    """W2: period NEXT chain with inter-period wall-clock gaps (reference
    MERGE_PERIODS next-edges, src/queries/game.py:42-50)."""
    from mbai_gdb_spark.pipeline.periods import build_periods, period_next_chain

    pbp, _ = _fixture(spark)
    return period_next_chain(build_periods(pbp)).select(
        "game_id", "period_id", "next_period_id", "gap_s"
    )


def _cross_period_oracle() -> str:
    from mbai_gdb_spark.pipeline.w11_gold import _LINEUP_STINT_GOLD, values_cte

    ls = values_cte(
        "ls",
        [
            "game_id", "team_id", "period", "stint_id", "lineup_id",
            "global_start", "global_end", "start_time", "end_time",
            "clock_duration",
        ],
        _LINEUP_STINT_GOLD,
    )
    return f"""
    WITH {ls},
    lsx AS (
        SELECT game_id, team_id, stint_id, lineup_id,
               CAST(global_start AS DOUBLE) AS global_start,
               CAST(global_end AS DOUBLE) AS global_end,
               CAST(start_time AS TIMESTAMP) AS start_time,
               CAST(end_time AS TIMESTAMP) AS end_time
        FROM ls
    ),
    member AS (
        SELECT game_id, CAST(p.v AS BIGINT) AS player_id,
               global_start, global_end, start_time, end_time
        FROM lsx, unnest(string_split(lineup_id, '_')) AS p(v)
    ),
    flagged AS (
        SELECT *, CASE WHEN lag(global_end) OVER w IS NULL
                         OR global_start <> lag(global_end) OVER w
                       THEN 1 ELSE 0 END AS newf
        FROM member
        WINDOW w AS (PARTITION BY game_id, player_id ORDER BY global_start)
    ),
    islands AS (
        SELECT *, SUM(newf) OVER (PARTITION BY game_id, player_id
                                  ORDER BY global_start
                                  ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    ),
    pstints AS (
        SELECT game_id,
               'player_' || CAST(player_id AS VARCHAR) AS entity_id,
               CAST(game_id AS VARCHAR) || '_' || CAST(player_id AS VARCHAR)
                   || '_' || CAST(island AS VARCHAR) AS sid,
               MIN(global_start) AS global_start, MAX(global_end) AS global_end,
               MIN(start_time) AS start_time, MAX(end_time) AS end_time
        FROM islands GROUP BY game_id, player_id, island
    ),
    lstints AS (
        SELECT game_id,
               'lineup_' || CAST(team_id AS VARCHAR) || '_' || lineup_id AS entity_id,
               stint_id AS sid, global_start, global_end, start_time, end_time
        FROM lsx
    ),
    unioned AS (SELECT * FROM lstints UNION ALL SELECT * FROM pstints)
    SELECT game_id, entity_id, sid, next_sid, clock_since, time_since FROM (
        SELECT game_id, entity_id, sid,
               LEAD(sid) OVER w AS next_sid,
               LEAD(global_start) OVER w - global_end AS clock_since,
               CAST(LEAD(epoch_us(start_time)) OVER w - epoch_us(end_time)
                    AS DOUBLE) / 1e6 AS time_since
        FROM unioned
        WINDOW w AS (PARTITION BY game_id, entity_id ORDER BY global_start)
    ) WHERE next_sid IS NOT NULL
    """


@query("nba_cross_period_next", _cross_period_oracle())
def nba_cross_period_next(spark, sf_dir):
    """W6: game-wide NEXT chain over lineup AND player stints with
    clock_since / time_since edge props (reference src/queries/
    game.py:184-206).  Oracle re-runs the island+union+lead algebra in
    SQL over the pinned kernel snapshot."""
    from mbai_gdb_spark.pipeline.lineups import build_lineup_stints
    from mbai_gdb_spark.pipeline.stints import (
        build_player_stints,
        cross_period_next_chain,
    )

    pbp, starters = _fixture(spark)
    ls = build_lineup_stints(pbp, starters)
    return cross_period_next_chain(ls, build_player_stints(ls)).select(
        "game_id", "entity_id", "sid", "next_sid", "clock_since", "time_since"
    )


@query(
    "nba_score_next_chain",
    f"""
    WITH {_fixture_pbp_cte()},
    {_sql_actions_cte()},
    scoring AS (
        SELECT action_id AS score_action_id, global_clock
        FROM actions WHERE points > 0
    )
    SELECT game_id, score_action_id, next_score_action_id FROM (
        SELECT CAST({GAME_ID} AS BIGINT) AS game_id, score_action_id,
               LEAD(score_action_id) OVER (ORDER BY global_clock, score_action_id)
                   AS next_score_action_id
        FROM scoring
    ) WHERE next_score_action_id IS NOT NULL
    """,
)
def nba_score_next_chain(spark, sf_dir):
    """W9: NEXT edges over consecutive score states (reference
    MERGE_SCORES next-chain, src/queries/game.py:732-740)."""
    from mbai_gdb_spark.pipeline.actions import shape_actions
    from mbai_gdb_spark.pipeline.scores import build_score_chain, score_next_chain

    pbp, _ = _fixture(spark)
    return score_next_chain(
        build_score_chain(shape_actions(pbp), _home_df(spark))
    ).select("game_id", "score_action_id", "next_score_action_id")
