"""Deterministic synthetic game fixtures (FIXTURES.md contract).

The reference consumes NBA play-by-play JSON; its input contract is
documented in FIXTURES.md (derived from reference src/fetcher.py:100-115
and src/managers/game.py:73-117).  This generator produces schema-true
play-by-play + boxscore-starter frames with the structural requirements
the pipeline's hard paths need: period-start and mid-period subs, OT
periods, missed-shot→rebound windows, assist/block attributions, and
shared-clock free-throw pairs.

Pure Python (driver-side, tiny) — fixtures are test inputs, not data
paths.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

REGULAR_PERIOD_SECONDS = 720.0
OT_PERIOD_SECONDS = 300.0


def period_length(period: int) -> float:
    return REGULAR_PERIOD_SECONDS if period <= 4 else OT_PERIOD_SECONDS


def period_global_offset(period: int) -> float:
    """Seconds of game clock before this period starts (reference clock
    model: 4×720 regulation + 300 per OT, src/managers/game.py:206-213)."""
    if period <= 4:
        return (period - 1) * REGULAR_PERIOD_SECONDS
    return 4 * REGULAR_PERIOD_SECONDS + (period - 5) * OT_PERIOD_SECONDS


def clock_string(period: int, elapsed: float) -> str:
    """ISO-8601 duration of time REMAINING, e.g. 'PT11M32.00S'."""
    remaining = period_length(period) - elapsed
    m = int(remaining // 60)
    s = remaining - m * 60
    return f"PT{m:02d}M{s:05.2f}S"


def make_game(
    game_id: int = 1001,
    home_team: int = 10,
    away_team: int = 20,
    n_ot: int = 1,
    seed: int = 42,
):
    """Generate (pbp_rows, starter_rows) for one synthetic game.

    Returns plain dict lists; callers build Spark frames via
    ``spark.createDataFrame``.
    """
    rng = random.Random(seed)
    t0 = datetime(2024, 1, 15, 19, 0, 0)
    rosters = {
        home_team: list(range(home_team * 100, home_team * 100 + 9)),
        away_team: list(range(away_team * 100, away_team * 100 + 9)),
    }
    starters = {tm: roster[:5] for tm, roster in rosters.items()}
    on_court = {tm: list(s) for tm, s in starters.items()}
    n_periods = 4 + n_ot
    pbp: list[dict] = []
    event_seq = [0]
    wall = [t0]

    def emit(period, elapsed, action_type, **kw):
        event_seq[0] += 1
        row = {
            "game_id": game_id,
            "action_id": event_seq[0],
            "timeActual": wall[0],
            "period": period,
            "clock": clock_string(period, elapsed),
            "actionType": action_type,
            "subType": kw.get("subType"),
            "descriptor": kw.get("descriptor"),
            "x": kw.get("x"),
            "y": kw.get("y"),
            "shotDistance": kw.get("shotDistance"),
            "shotResult": kw.get("shotResult"),
            "teamId": kw.get("teamId"),
            "personId": kw.get("personId"),
            "assistPersonId": kw.get("assistPersonId"),
            "blockPersonId": kw.get("blockPersonId"),
            "stealPersonId": kw.get("stealPersonId"),
            "foulDrawnPersonId": kw.get("foulDrawnPersonId"),
            "jumpBallWonPersonId": kw.get("jumpBallWonPersonId"),
            "jumpBallLostPersonId": kw.get("jumpBallLostPersonId"),
            # source feed's spelling (FIXTURES.md: "Recoverd")
            "jumpBallRecoverdPersonId": kw.get("jumpBallRecoverdPersonId"),
        }
        pbp.append(row)
        return row

    for period in range(1, n_periods + 1):
        plen = period_length(period)
        # Period marker pair (start/end rows; reference reads iloc[0]/[1],
        # src/managers/game.py:129-132).
        wall[0] = wall[0] + timedelta(seconds=120)
        emit(period, 0.0, "period", subType="start")

        # Period-start substitutions from period 2 on (exercises the
        # start-of-period branch of the lineup kernel).
        if period > 1:
            for tm in (home_team, away_team):
                if rng.random() < 0.8:
                    bench = [p for p in rosters[tm] if p not in on_court[tm]]
                    out_p = rng.choice(on_court[tm])
                    in_p = rng.choice(bench)
                    wall[0] += timedelta(seconds=1)
                    emit(period, 0.0, "substitution", subType="out", teamId=tm, personId=out_p)
                    emit(period, 0.0, "substitution", subType="in", teamId=tm, personId=in_p)
                    on_court[tm] = [p for p in on_court[tm] if p != out_p] + [in_p]

        # Opening jumpball (periods 1 and OT in the real feed; every
        # period here to exercise the attribution joins).
        jb_winner = rng.choice((home_team, away_team))
        jb_loser = away_team if jb_winner == home_team else home_team
        wall[0] += timedelta(seconds=2)
        emit(
            period,
            0.0,
            "jumpball",
            subType="recovered",
            teamId=jb_winner,
            jumpBallWonPersonId=rng.choice(on_court[jb_winner]),
            jumpBallLostPersonId=rng.choice(on_court[jb_loser]),
            jumpBallRecoverdPersonId=rng.choice(on_court[jb_winner]),
        )

        elapsed = 0.0
        while elapsed < plen - 60:
            elapsed += rng.uniform(15, 45)
            if elapsed >= plen - 30:
                break
            wall[0] += timedelta(seconds=rng.uniform(10, 40))
            tm = rng.choice((home_team, away_team))
            opp = away_team if tm == home_team else home_team
            actor = rng.choice(on_court[tm])
            roll = rng.random()
            if roll < 0.40:  # field goal attempt
                made = rng.random() < 0.5
                three = rng.random() < 0.3
                kw = dict(
                    teamId=tm,
                    personId=actor,
                    x=round(rng.uniform(0, 50), 1),
                    y=round(rng.uniform(0, 40), 1),
                    shotDistance=round(rng.uniform(1, 28), 1),
                    shotResult="Made" if made else "Missed",
                    descriptor=rng.choice(["pullup", "driving", "step back", None]),
                )
                if made and rng.random() < 0.6:
                    kw["assistPersonId"] = rng.choice(
                        [p for p in on_court[tm] if p != actor]
                    )
                if not made and rng.random() < 0.2:
                    kw["blockPersonId"] = rng.choice(on_court[opp])
                emit(period, elapsed, "3pt" if three else "2pt", **kw)
                if not made and rng.random() < 0.8:
                    # rebound within the 10 s attribution window
                    reb_elapsed = min(elapsed + rng.uniform(1, 8), plen - 1)
                    reb_tm = tm if rng.random() < 0.3 else opp
                    wall[0] += timedelta(seconds=reb_elapsed - elapsed)
                    emit(
                        period,
                        reb_elapsed,
                        "rebound",
                        subType="offensive" if reb_tm == tm else "defensive",
                        teamId=reb_tm,
                        personId=rng.choice(on_court[reb_tm]),
                    )
                    elapsed = reb_elapsed
            elif roll < 0.55:  # foul + free throws sharing one clock
                fouled = rng.choice(on_court[opp])
                emit(
                    period,
                    elapsed,
                    "foul",
                    subType=rng.choice(["personal", "shooting"]),
                    descriptor=rng.choice(["shooting", "loose ball", None]),
                    teamId=tm,
                    personId=actor,
                    foulDrawnPersonId=fouled,
                )
                for attempt in (1, 2):
                    wall[0] += timedelta(seconds=2)
                    emit(
                        period,
                        elapsed,  # same clock for both FTs (FIXTURES.md §4)
                        "freethrow",
                        subType=f"{attempt} of 2",
                        teamId=opp,
                        personId=fouled,
                        shotResult="Made" if rng.random() < 0.75 else "Missed",
                    )
            elif roll < 0.70:  # turnover (maybe steal)
                kw = dict(
                    teamId=tm,
                    personId=actor,
                    subType=rng.choice(["bad pass", "lost ball", "traveling"]),
                )
                if rng.random() < 0.5:
                    kw["stealPersonId"] = rng.choice(on_court[opp])
                emit(period, elapsed, "turnover", **kw)
            elif roll < 0.82:  # mid-period substitution
                bench = [p for p in rosters[tm] if p not in on_court[tm]]
                out_p = rng.choice(on_court[tm])
                in_p = rng.choice(bench)
                emit(period, elapsed, "substitution", subType="out", teamId=tm, personId=out_p)
                wall[0] += timedelta(seconds=1)
                emit(period, elapsed, "substitution", subType="in", teamId=tm, personId=in_p)
                on_court[tm] = [p for p in on_court[tm] if p != out_p] + [in_p]
            elif roll < 0.90:  # violation
                emit(
                    period,
                    elapsed,
                    "violation",
                    subType=rng.choice(["kicked ball", "lane"]),
                    teamId=tm,
                    personId=actor,
                )
            else:  # timeout
                emit(
                    period,
                    elapsed,
                    "timeout",
                    subType=rng.choice(["full", "short"]),
                    teamId=tm,
                )
        wall[0] += timedelta(seconds=60)
        emit(period, plen, "period", subType="end")

    starter_rows = [
        {
            "game_id": game_id,
            "PLAYER_ID": p,
            "TEAM_ID": tm,
            "START_POSITION": pos,
        }
        for tm, ps in starters.items()
        for p, pos in zip(ps, ["F", "F", "C", "G", "G"])
    ]
    return pbp, starter_rows


PBP_DDL = """
    game_id long, action_id long, timeActual timestamp, period int,
    clock string, actionType string, subType string, descriptor string,
    x double, y double, shotDistance double, shotResult string,
    teamId long, personId long, assistPersonId long, blockPersonId long,
    stealPersonId long, foulDrawnPersonId long, jumpBallWonPersonId long,
    jumpBallLostPersonId long, jumpBallRecoverdPersonId long
"""

STARTERS_DDL = "game_id long, PLAYER_ID long, TEAM_ID long, START_POSITION string"


def fixture_frames(spark, **kwargs):
    pbp, starters = make_game(**kwargs)
    return (
        spark.createDataFrame(pbp, PBP_DDL),
        spark.createDataFrame(starters, STARTERS_DDL),
    )
