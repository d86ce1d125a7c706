"""Player dimension (S3) + membership edges.

The reference fetches an 8-column bio projection per player
(fetch_player_info, src/fetcher.py:60-71: FIRST_NAME, LAST_NAME,
BIRTHDATE, HEIGHT, WEIGHT, POSITION, SCHOOL, COUNTRY) and creates
(Player)-[:MEMBER_OF]->(LineUp) edges from lineup membership
(src/queries/game.py:73-77).  The rebuild models Player as a proper
node/dimension table with those properties, plus the MEMBER_OF edge
table derived from lineup stints.

The driver's fixture tables carry no NBA bio feed, so — exactly like
the teams fixture in queries_nba — a deterministic synthetic bio is
generated per player id; the oracle inlines the same rows as VALUES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PLAYER_BIO_COLUMNS = [
    "player_id",
    "first_name",
    "last_name",
    "birthdate",
    "height_in",
    "weight_lb",
    "position",
    "school",
    "country",
]

_POSITIONS = ("Guard", "Forward", "Center")


def synthetic_player_bio(player_ids) -> list[tuple]:
    """Deterministic 8-column bio row per player id (pure function of
    the id — Python and SQL VALUES derive from the same list)."""
    rows = []
    for pid in sorted(int(p) for p in player_ids):
        rows.append(
            (
                pid,
                f"First{pid}",
                f"Last{pid}",
                f"{1990 + pid % 10:04d}-{1 + pid % 12:02d}-{1 + pid % 28:02d}",
                72 + pid % 12,
                180 + (pid * 7) % 60,
                _POSITIONS[pid % 3],
                f"College {pid % 5}",
                "USA" if pid % 4 else "Canada",
            )
        )
    return rows


def player_bio_frame(spark: SparkSession, player_ids) -> DataFrame:
    return spark.createDataFrame(
        synthetic_player_bio(player_ids),
        "player_id long, first_name string, last_name string, birthdate string,"
        " height_in long, weight_lb long, position string, school string,"
        " country string",
    )


def build_players(bio: DataFrame) -> DataFrame:
    """S3: the typed 8-column projection, one row per player (the
    reference's cols2keep list, src/fetcher.py:62-66)."""
    return bio.select(*PLAYER_BIO_COLUMNS).dropDuplicates(["player_id"])


def member_of_edges(lineup_stints: DataFrame) -> DataFrame:
    """(Player)-[:MEMBER_OF]->(LineUp): distinct membership pairs from
    lineup stints (reference src/queries/game.py:73-77 — created once
    per lineup, independent of how many stints the lineup played)."""
    return (
        lineup_stints.select(
            "team_id", "lineup_id", F.explode("player_ids").alias("player_id")
        )
        .distinct()
    )
