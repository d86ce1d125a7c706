"""Static team dimension graph (reference MERGE_TEAM,
src/queries/team.py:3-13, fed by fetch_teams src/fetcher.py:16-48).

Builds the Team / Arena / City / State node frames and the
HOME_ARENA / IN_CITY / IN_STATE edges from the teams source — pure
projection + dropDuplicates (the MERGE-by-unique-key semantics of the
reference's constraints, setup.py:2-8)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_team_graph(teams: DataFrame) -> dict[str, DataFrame]:
    """teams: (id, full_name, abbreviation, city, state, arena) →
    node/edge frames keyed like the reference's constraint set."""
    team_nodes = teams.select(
        "id", "full_name", "abbreviation"
    ).dropDuplicates(["id"])
    arena_nodes = teams.select(F.col("arena").alias("name")).dropDuplicates(["name"])
    city_nodes = teams.select(F.col("city").alias("name")).dropDuplicates(["name"])
    state_nodes = teams.select(F.col("state").alias("name")).dropDuplicates(["name"])
    return {
        "teams": team_nodes,
        "arenas": arena_nodes,
        "cities": city_nodes,
        "states": state_nodes,
        "home_arena": teams.select(
            F.col("id").alias("team_id"), F.col("arena").alias("arena_name")
        ).dropDuplicates(),
        "in_city": teams.select(
            F.col("id").alias("team_id"), F.col("city").alias("city_name")
        ).dropDuplicates(),
        "city_in_state": teams.select(
            F.col("city").alias("city_name"), F.col("state").alias("state_name")
        ).dropDuplicates(),
    }
