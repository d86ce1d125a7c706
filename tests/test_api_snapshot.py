"""HTTP-snapshot source adapter: recorded REST documents → source
contracts (EP1 parity with reference src/fetcher.py:16-115).

The play-by-play test is a ROUNDTRIP: the deterministic fixture game is
serialized into live-API-shaped JSON documents, decoded by the adapter,
and must reproduce the original source frame value-for-value — then
flow through the real pipeline (period derivation) unchanged.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbai_gdb_spark.pipeline.fixtures import PBP_DDL, STARTERS_DDL, make_game
from mbai_gdb_spark.schemas import SCHEDULE, TEAM
from mbai_gdb_spark.sources.api_snapshot import (
    read_boxscore_snapshot,
    read_pbp_snapshot,
    read_player_info_snapshot,
    read_schedule_snapshot,
    read_team_snapshot,
)


def _payloads(spark, docs: list[str]):
    return spark.createDataFrame([(d,) for d in docs], "payload string")


def _expected_schema(spark, ddl: str) -> T.StructType:
    return spark.createDataFrame([], ddl).schema


def test_team_snapshot_schema_and_values(spark):
    static = json.dumps(
        {
            "teams": [
                {"id": 1610612738, "full_name": "Boston Celtics",
                 "abbreviation": "BOS", "city": "Boston", "state": "Massachusetts"},
                {"id": 1610612747, "full_name": "Los Angeles Lakers",
                 "abbreviation": "LAL", "city": "Los Angeles", "state": "California"},
            ]
        }
    )
    details = [
        json.dumps(
            {
                "resultSets": [
                    {
                        "name": "TeamBackground",
                        "headers": ["TEAM_ID", "CITY", "ARENA"],
                        "rowSet": [[1610612738, "Boston", "TD Garden"]],
                    }
                ]
            }
        ),
        json.dumps(
            {
                "resultSets": [
                    {
                        "name": "TeamBackground",
                        # different header ORDER — decode must not care
                        "headers": ["ARENA", "TEAM_ID"],
                        "rowSet": [["Crypto.com Arena", 1610612747]],
                    }
                ]
            }
        ),
    ]
    out = read_team_snapshot(_payloads(spark, [static]), _payloads(spark, details))
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in TEAM.fields
    ]
    got = {r.id: (r.abbreviation, r.arena) for r in out.collect()}
    assert got == {
        1610612738: ("BOS", "TD Garden"),
        1610612747: ("LAL", "Crypto.com Arena"),
    }


def test_schedule_snapshot_schema_and_values(spark):
    doc = json.dumps(
        {
            "leagueSchedule": {
                "seasonYear": "2023-24",
                "gameDates": [
                    {
                        "games": [
                            {
                                "gameId": "0022300061",
                                "gameDateTimeUTC": "2023-10-24T23:30:00Z",
                                "homeTeam": {"teamId": 1610612743},
                                "awayTeam": {"teamId": 1610612747},
                            }
                        ]
                    },
                    {
                        "games": [
                            {
                                "gameId": "0022300062",
                                "gameDateTimeUTC": "2023-10-25T00:00:00Z",
                                "homeTeam": {"teamId": 1610612744},
                                "awayTeam": {"teamId": 1610612756},
                            }
                        ]
                    },
                ],
            }
        }
    )
    out = read_schedule_snapshot(_payloads(spark, [doc]))
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in SCHEDULE.fields
    ]
    rows = {r.game_id: r for r in out.collect()}
    assert rows[22300061].home_team_id == 1610612743  # zero-padded id cast
    assert rows[22300062].datetime == "2023-10-25T00:00:00Z"


def _pbp_json_docs(pbp_rows) -> list[str]:
    """Serialize fixture pbp rows into live-API documents, one per game,
    actions carrying only the fields that are present (like the real
    feed, where e.g. assistPersonId appears only on assisted makes)."""
    by_game: dict[int, list[dict]] = {}
    for r in pbp_rows:
        d = dict(r)
        gid = d.pop("game_id")
        d["actionNumber"] = d.pop("action_id")
        t = d.pop("timeActual")
        if t is not None:
            d["timeActual"] = t.isoformat() + "Z"
        action = {k: v for k, v in d.items() if v is not None}
        by_game.setdefault(gid, []).append(action)
    return [
        json.dumps({"game": {"gameId": f"00{gid}", "actions": actions}})
        for gid, actions in by_game.items()
    ]


def test_pbp_snapshot_roundtrips_fixture_game(spark):
    pbp_rows, starter_rows = make_game(
        game_id=1001, home_team=10, away_team=20, n_ot=1
    )
    docs = _pbp_json_docs(pbp_rows)
    out = read_pbp_snapshot(_payloads(spark, docs))
    expected = spark.createDataFrame(pbp_rows, PBP_DDL)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in expected.schema.fields
    ]

    key = lambda r: (r.game_id, r.action_id)
    got = sorted(map(tuple, out.collect()), key=lambda t: (t[0], t[1]))
    want = sorted(map(tuple, expected.collect()), key=lambda t: (t[0], t[1]))
    assert got == want

    # ...and the decoded frame drives the real pipeline identically.
    from mbai_gdb_spark.pipeline.periods import build_periods

    periods = {r.n for r in build_periods(out).collect()}
    assert periods == {1, 2, 3, 4, 5}


def test_boxscore_snapshot_matches_starters_contract(spark):
    _, starter_rows = make_game(game_id=1001, home_team=10, away_team=20, n_ot=0)
    doc = json.dumps(
        {
            "resultSets": [
                {
                    "name": "PlayerStats",
                    "headers": ["GAME_ID", "TEAM_ID", "PLAYER_ID", "START_POSITION"],
                    "rowSet": [
                        [f"00{r['game_id']}", r["TEAM_ID"], r["PLAYER_ID"],
                         r["START_POSITION"] or None]
                        for r in starter_rows
                    ],
                }
            ]
        }
    )
    out = read_boxscore_snapshot(_payloads(spark, [doc]))
    expected = spark.createDataFrame(starter_rows, STARTERS_DDL)
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in expected.schema.fields
    ]
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, expected.collect()))
    assert got == want


def test_player_info_snapshot_units_and_schema(spark):
    doc = json.dumps(
        {
            "resultSets": [
                {
                    "name": "CommonPlayerInfo",
                    "headers": [
                        "PERSON_ID", "FIRST_NAME", "LAST_NAME", "BIRTHDATE",
                        "HEIGHT", "WEIGHT", "POSITION", "SCHOOL", "COUNTRY",
                    ],
                    "rowSet": [
                        [201939, "Stephen", "Curry", "1988-03-14T00:00:00",
                         "6-2", 185, "Guard", "Davidson", "USA"]
                    ],
                }
            ]
        }
    )
    out = read_player_info_snapshot(_payloads(spark, [doc]))
    from mbai_gdb_spark.pipeline.players import PLAYER_BIO_COLUMNS

    assert out.columns == PLAYER_BIO_COLUMNS
    r = out.collect()[0]
    assert r.height_in == 74  # "6-2" → inches
    assert r.weight_lb == 185
    assert r.birthdate == "1988-03-14"
    assert isinstance(r.player_id, int)
