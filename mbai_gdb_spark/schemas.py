"""Explicit StructType registry (schema-on-write — stricter than the
reference's schema-optional store; SURVEY §1.5).

One StructType per entity of the domain model (SURVEY §1.2) plus the
source contracts (FIXTURES.md).  The uniqueness constraints the
reference creates as DDL (src/queries/setup.py:1-34) map to the KEYS
dict consumed by ``io.write_insert_if_absent``."""

from __future__ import annotations

from pyspark.sql import types as T

# --- source contracts ------------------------------------------------------

TEAM = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("full_name", T.StringType()),
        T.StructField("abbreviation", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("arena", T.StringType()),
    ]
)

SCHEDULE = T.StructType(
    [
        T.StructField("datetime", T.StringType()),
        T.StructField("game_id", T.LongType(), False),
        T.StructField("home_team_id", T.LongType()),
        T.StructField("away_team_id", T.LongType()),
    ]
)

# --- derived entity tables (pipeline outputs) ------------------------------

PERIOD = T.StructType(
    [
        T.StructField("game_id", T.LongType(), False),
        T.StructField("n", T.IntegerType(), False),
        T.StructField("start", T.TimestampType()),
        T.StructField("end", T.TimestampType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("global_offset", T.DoubleType()),
        T.StructField("period_id", T.StringType(), False),
    ]
)

LINEUP_STINT = T.StructType(
    [
        T.StructField("stint_id", T.StringType(), False),
        T.StructField("game_id", T.LongType(), False),
        T.StructField("team_id", T.LongType(), False),
        T.StructField("period", T.IntegerType()),
        T.StructField("lineup_id", T.StringType()),
        T.StructField("player_ids", T.ArrayType(T.LongType())),
        T.StructField("local_start", T.DoubleType()),
        T.StructField("local_end", T.DoubleType()),
        T.StructField("clock_duration", T.DoubleType()),
        T.StructField("global_start", T.DoubleType()),
        T.StructField("global_end", T.DoubleType()),
    ]
)

ACTION = T.StructType(
    [
        T.StructField("game_id", T.LongType(), False),
        T.StructField("action_id", T.LongType(), False),
        T.StructField("time", T.TimestampType()),
        T.StructField("period", T.IntegerType()),
        T.StructField("team_id", T.LongType()),
        T.StructField("player_id", T.LongType()),
        T.StructField("action_type", T.StringType()),
        T.StructField("labels", T.ArrayType(T.StringType())),
        T.StructField("points", T.IntegerType()),
        T.StructField("local_clock", T.DoubleType()),
        T.StructField("global_clock", T.DoubleType()),
    ]
)

# unique-key registry (the reference's uniqueness constraints)
KEYS: dict[str, list[str]] = {
    "teams": ["id"],
    "games": ["game_id"],
    "periods": ["period_id"],
    "lineup_stints": ["stint_id"],
    "actions": ["game_id", "action_id"],
}
