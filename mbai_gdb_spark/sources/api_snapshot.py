"""HTTP-snapshot source adapter (EP1 full source parity).

The reference ingests live from rate-limited REST endpoints
(reference src/fetcher.py:16-115: fetch_teams / fetch_player_ids /
fetch_player_info / fetch_schedule / fetch_boxscore / fetch_pbp).
Rate-limited per-entity HTTP loops don't belong inside a distributed
engine; the Spark-native equivalent is a LANDING ZONE of recorded
response documents (one JSON payload per row, written by any thin
collector) decoded declaratively: ``from_json`` with an explicit
payload schema → explode → project/cast to the engine's source
contracts (schemas.py / pipeline.fixtures DDLs).  Decoding is pure
column algebra — parallel, retry-free, and replayable, and the same
transforms serve a Structured Streaming source pointed at the landing
zone.  Nothing in this module performs network I/O.

Two payload families:

- the stats-API "resultSets" tabular convention
  (``{"resultSets": [{"name", "headers", "rowSet"}]}``) — decoded
  generically by :func:`result_set_columns` via array_position on the
  header row, so column ORDER in the payload is irrelevant;
- the live-API nested-document convention (schedule's
  gameDates/games, play-by-play's game.actions) — decoded with nested
  StructTypes + explode.

Values arrive as strings (from_json coerces scalars) and are cast at
the projection edge; absent fields are NULL (the honest form of the
reference's pandas ``fillna(-1)``, fetcher.py:115).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- generic "resultSets" decoding -----------------------------------------

RESULT_SETS_SCHEMA = T.StructType(
    [
        T.StructField(
            "resultSets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("headers", T.ArrayType(T.StringType())),
                        T.StructField(
                            "rowSet", T.ArrayType(T.ArrayType(T.StringType()))
                        ),
                    ]
                )
            ),
        )
    ]
)


def _header_cell(headers: Column, row: Column, name: str) -> Column:
    """row[position of ``name`` in headers] — NULL when absent."""
    pos = F.array_position(headers, F.lit(name))
    return F.when(pos > 0, F.element_at(row, pos.cast("int")))


def result_set_columns(
    payload_df: DataFrame,
    set_name: str,
    columns: dict[str, str],
    payload_col: str = "payload",
) -> DataFrame:
    """Decode one named resultSet from each payload document into a
    column per ``{output_name: HEADER_NAME}`` entry (string-typed; cast
    downstream).  One explode per level, no Python in the loop."""
    sets = payload_df.select(
        F.explode(
            F.from_json(F.col(payload_col), RESULT_SETS_SCHEMA)["resultSets"]
        ).alias("rs")
    ).filter(F.col("rs.name") == set_name)
    rows = sets.select(
        F.col("rs.headers").alias("__headers__"),
        F.explode("rs.rowSet").alias("__row__"),
    )
    return rows.select(
        *[
            _header_cell(F.col("__headers__"), F.col("__row__"), hdr).alias(out)
            for out, hdr in columns.items()
        ]
    )


# --- teams (fetch_teams: static list + TeamDetails arena) ------------------

STATIC_TEAMS_SCHEMA = T.StructType(
    [
        T.StructField(
            "teams",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("id", T.LongType()),
                        T.StructField("full_name", T.StringType()),
                        T.StructField("abbreviation", T.StringType()),
                        T.StructField("city", T.StringType()),
                        T.StructField("state", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def read_team_snapshot(
    static_payloads: DataFrame, details_payloads: DataFrame
) -> DataFrame:
    """TEAM contract from a static team-list document joined with per-
    team TeamDetails documents (arena from the Background resultSet) —
    the snapshot form of fetcher.py:16-47.  The details side is tiny
    (one row per team) → broadcast."""
    teams = static_payloads.select(
        F.explode(F.from_json("payload", STATIC_TEAMS_SCHEMA)["teams"]).alias("t")
    ).select("t.id", "t.full_name", "t.abbreviation", "t.city", "t.state")
    details = result_set_columns(
        details_payloads,
        "TeamBackground",
        {"id": "TEAM_ID", "arena": "ARENA"},
    ).select(F.col("id").cast("long").alias("id"), "arena")
    return teams.join(F.broadcast(details), "id", "left").select(
        F.col("id").cast("long").alias("id"),
        "full_name",
        "abbreviation",
        "city",
        "state",
        "arena",
    )


# --- schedule (fetch_schedule / ScheduleLeagueV2) --------------------------

SCHEDULE_SCHEMA = T.StructType(
    [
        T.StructField(
            "leagueSchedule",
            T.StructType(
                [
                    T.StructField("seasonYear", T.StringType()),
                    T.StructField(
                        "gameDates",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "games",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "gameId", T.StringType()
                                                    ),
                                                    T.StructField(
                                                        "gameDateTimeUTC",
                                                        T.StringType(),
                                                    ),
                                                    T.StructField(
                                                        "homeTeam",
                                                        T.StructType(
                                                            [
                                                                T.StructField(
                                                                    "teamId",
                                                                    T.LongType(),
                                                                )
                                                            ]
                                                        ),
                                                    ),
                                                    T.StructField(
                                                        "awayTeam",
                                                        T.StructType(
                                                            [
                                                                T.StructField(
                                                                    "teamId",
                                                                    T.LongType(),
                                                                )
                                                            ]
                                                        ),
                                                    ),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


def read_schedule_snapshot(payloads: DataFrame) -> DataFrame:
    """SCHEDULE contract (datetime kept as the UTC string, exactly like
    fetcher.py:75-83) from ScheduleLeagueV2 documents: two explodes
    (gameDates → games) + casts.  Leading-zero gameIds cast cleanly."""
    games = (
        payloads.select(
            F.explode(
                F.from_json("payload", SCHEDULE_SCHEMA)["leagueSchedule"]["gameDates"]
            ).alias("gd")
        )
        .select(F.explode("gd.games").alias("g"))
    )
    return games.select(
        F.col("g.gameDateTimeUTC").alias("datetime"),
        F.col("g.gameId").cast("long").alias("game_id"),
        F.col("g.homeTeam.teamId").alias("home_team_id"),
        F.col("g.awayTeam.teamId").alias("away_team_id"),
    )


# --- play-by-play (fetch_pbp / live PlayByPlay) ----------------------------

_PBP_ACTION_FIELDS: list[tuple[str, str, T.DataType]] = [
    ("actionNumber", "action_id", T.LongType()),
    ("timeActual", "timeActual", T.TimestampType()),
    ("period", "period", T.IntegerType()),
    ("clock", "clock", T.StringType()),
    ("actionType", "actionType", T.StringType()),
    ("subType", "subType", T.StringType()),
    ("descriptor", "descriptor", T.StringType()),
    ("x", "x", T.DoubleType()),
    ("y", "y", T.DoubleType()),
    ("shotDistance", "shotDistance", T.DoubleType()),
    ("shotResult", "shotResult", T.StringType()),
    ("teamId", "teamId", T.LongType()),
    ("personId", "personId", T.LongType()),
    ("assistPersonId", "assistPersonId", T.LongType()),
    ("blockPersonId", "blockPersonId", T.LongType()),
    ("stealPersonId", "stealPersonId", T.LongType()),
    ("foulDrawnPersonId", "foulDrawnPersonId", T.LongType()),
    ("jumpBallWonPersonId", "jumpBallWonPersonId", T.LongType()),
    ("jumpBallLostPersonId", "jumpBallLostPersonId", T.LongType()),
    ("jumpBallRecoverdPersonId", "jumpBallRecoverdPersonId", T.LongType()),
]

PBP_SCHEMA = T.StructType(
    [
        T.StructField(
            "game",
            T.StructType(
                [
                    T.StructField("gameId", T.StringType()),
                    T.StructField(
                        "actions",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(src, T.StringType())
                                    for src, _, _ in _PBP_ACTION_FIELDS
                                ]
                            )
                        ),
                    ),
                ]
            ),
        )
    ]
)


def read_pbp_snapshot(payloads: DataFrame) -> DataFrame:
    """Play-by-play source contract (pipeline.fixtures.PBP_DDL) from
    live-API documents (fetcher.py:102-115): game_id rides down from the
    envelope, one row per action, every id/measure cast from its string
    form.  Absent ids stay NULL (the reference's fillna(-1) is a pandas
    artifact, not domain data)."""
    parsed = payloads.select(F.from_json("payload", PBP_SCHEMA)["game"].alias("g"))
    actions = parsed.select(
        F.col("g.gameId").cast("long").alias("game_id"),
        F.explode("g.actions").alias("a"),
    )
    return actions.select(
        "game_id",
        *[
            F.col(f"a.{src}").cast(dtype).alias(out)
            for src, out, dtype in _PBP_ACTION_FIELDS
        ],
    )


# --- boxscore starters (fetch_boxscore / BoxScoreTraditionalV2) ------------


def read_boxscore_snapshot(payloads: DataFrame) -> DataFrame:
    """Starters source contract (pipeline.fixtures.STARTERS_DDL) from
    BoxScoreTraditionalV2 documents' PlayerStats resultSet
    (fetcher.py:88-96).  GAME_ID arrives zero-padded ("0012345") — the
    long cast normalizes it, same as the reference's to_numeric."""
    cols = result_set_columns(
        payloads,
        "PlayerStats",
        {
            "game_id": "GAME_ID",
            "PLAYER_ID": "PLAYER_ID",
            "TEAM_ID": "TEAM_ID",
            "START_POSITION": "START_POSITION",
        },
    )
    return cols.select(
        F.col("game_id").cast("long").alias("game_id"),
        F.col("PLAYER_ID").cast("long").alias("PLAYER_ID"),
        F.col("TEAM_ID").cast("long").alias("TEAM_ID"),
        F.coalesce("START_POSITION", F.lit("")).alias("START_POSITION"),
    )


# --- player info (fetch_player_info / CommonPlayerInfo) --------------------


def read_player_info_snapshot(payloads: DataFrame) -> DataFrame:
    """Player-bio contract (pipeline.players.PLAYER_BIO_COLUMNS) from
    CommonPlayerInfo documents (fetcher.py:60-71): the reference keeps
    FIRST_NAME..COUNTRY; HEIGHT arrives as "6-10" and is converted to
    inches, WEIGHT to pounds — column algebra, no UDF."""
    cols = result_set_columns(
        payloads,
        "CommonPlayerInfo",
        {
            "player_id": "PERSON_ID",
            "first_name": "FIRST_NAME",
            "last_name": "LAST_NAME",
            "birthdate": "BIRTHDATE",
            "height": "HEIGHT",
            "weight": "WEIGHT",
            "position": "POSITION",
            "school": "SCHOOL",
            "country": "COUNTRY",
        },
    )
    feet = F.split("height", "-").getItem(0).cast("int")
    inches = F.split("height", "-").getItem(1).cast("int")
    return cols.select(
        F.col("player_id").cast("long").alias("player_id"),
        "first_name",
        "last_name",
        F.substring("birthdate", 1, 10).alias("birthdate"),
        (feet * 12 + inches).alias("height_in"),
        F.col("weight").cast("int").alias("weight_lb"),
        "position",
        "school",
        "country",
    )
