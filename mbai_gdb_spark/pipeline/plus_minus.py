"""Lineup / player plus-minus (A4/A5 — the reference's marquee analytic).

The reference's SET_PLUS_MINUS (src/queries/game.py:773-809) is disabled
and depends on edges that are never created (SURVEY §2.11); this module
implements the intended semantics directly from the score events:

  plus_minus(stint) = points scored by the stint's team while on court
                    − points scored by the opponent in that interval.

Implementation: one containment join from scoring events to each team's
stint intervals (J3 — [start, end) so a stint boundary attributes the
point to the lineup on court when it was scored), then conditional sums
(A4) and a player-stint rollup (A5)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.intervals import interval_join


def lineup_plus_minus(
    actions: DataFrame, lineup_stints: DataFrame
) -> DataFrame:
    """Per lineup-stint: points_scored, points_conceded, plus_minus.

    Every scoring event joins to BOTH teams' containing stints on the
    game equi key; 'for' vs 'against' is a conditional on team match —
    one join, no per-team passes."""
    scoring = actions.filter(F.col("points") > 0).select(
        "game_id",
        F.col("team_id").alias("scoring_team_id"),
        "points",
        "global_clock",
    )
    stints = lineup_stints.select(
        "game_id",
        "team_id",
        "stint_id",
        "global_start",
        "global_end",
    )
    joined = interval_join(
        scoring,
        stints,
        equi_keys=["game_id"],
        event_time="global_clock",
        start="global_start",
        end="global_end",
        closed="left",
    )
    is_for = F.col("scoring_team_id") == F.col("team_id")
    per_stint = joined.groupBy("game_id", "team_id", "stint_id").agg(
        F.sum(F.when(is_for, F.col("points")).otherwise(0)).alias("points_scored"),
        F.sum(F.when(~is_for, F.col("points")).otherwise(0)).alias("points_conceded"),
    )
    # Left join back so scoreless stints keep 0/0 (OPTIONAL MATCH, J6).
    return (
        lineup_stints.join(
            per_stint.select("stint_id", "points_scored", "points_conceded"),
            "stint_id",
            "left",
        )
        .withColumn("points_scored", F.coalesce("points_scored", F.lit(0)))
        .withColumn("points_conceded", F.coalesce("points_conceded", F.lit(0)))
        .withColumn("plus_minus", F.col("points_scored") - F.col("points_conceded"))
    )


def player_plus_minus(
    lineup_pm: DataFrame, player_stint_edges: DataFrame
) -> DataFrame:
    """A5 rollup: player-stint plus-minus = sum over its lineup stints
    (reference src/queries/game.py:797-808)."""
    return (
        player_stint_edges.join(
            lineup_pm.select("stint_id", "points_scored", "points_conceded"),
            "stint_id",
        )
        .groupBy("game_id", "player_id", "player_stint_id")
        .agg(
            F.sum("points_scored").alias("points_scored"),
            F.sum("points_conceded").alias("points_conceded"),
            (F.sum("points_scored") - F.sum("points_conceded")).alias("plus_minus"),
        )
    )


class _LazyTables(dict):
    """Pipeline table set whose DataFrames are CONSTRUCTED on first
    access (memoized; plain dict writes still work for extra keys like
    the optional ``players`` dimension).

    r15 (guide §7.3): plan CONSTRUCTION is real single-threaded driver
    time — building all 16 tables costs ~1.9 s per call regardless of
    corpus size (measured; ``action_edges`` alone ~0.4 s of analyzer
    walks), while a consumer that materializes the bench's 4 outputs
    touches only 8 of them.  Laziness charges each table's analyzer
    cost to whoever actually reads it; ``items()``/``values()``
    construct everything, so full-set consumers (the PyG export, the
    pipeline tests) see the exact same dict they always did."""

    def __init__(self, builders: dict) -> None:
        super().__init__()
        self._builders = dict(builders)

    def __missing__(self, k):
        df = self._builders[k]()  # KeyError for unknown names, as before
        self[k] = df
        return df

    def __contains__(self, k) -> bool:
        return super().__contains__(k) or k in self._builders

    def _names(self) -> list:
        extras = [k for k in super().keys() if k not in self._builders]
        return list(self._builders) + extras

    def __iter__(self):
        return iter(self._names())

    def __len__(self) -> int:
        return len(self._names())

    def keys(self):
        return self._names()

    def values(self):
        return [self[k] for k in self._names()]

    def items(self):
        return [(k, self[k]) for k in self._names()]

    def get(self, k, default=None):
        try:
            return self[k]
        except KeyError:
            return default


def game_pipeline(
    pbp: DataFrame,
    starters: DataFrame,
    home_teams: DataFrame,
    persist_intermediates: bool = True,
) -> dict:
    """EP2 end-to-end: periods → lineups → stints → actions → scores →
    plus-minus.  Returns the full table set (lazy DataFrames,
    constructed on first access — see :class:`_LazyTables`).

    ``persist_intermediates`` caches the fan-out points downstream
    tables reuse — the lineup-kernel output, the shaped actions, the
    player stints, and (r15) the lineup plus-minus, which both the
    ``lineup_plus_minus`` output and the ``player_plus_minus`` rollup
    consume: uncached, materializing both outputs ran the containment
    join + aggregation twice (measured ~1.4 s duplicated at the
    2000-game tier).  (At cluster scale the same role is played by
    checkpointing or writing these tables; the DAG shape is
    identical.)"""
    from mbai_gdb_spark.pipeline.actions import (
        action_next_chain,
        attribute_rebounds,
        build_action_edges,
        join_actions_to_stints,
        shape_actions,
    )
    from mbai_gdb_spark.pipeline.lineups import build_lineup_stints, on_court_next_edges
    from mbai_gdb_spark.pipeline.periods import build_periods, period_next_chain
    from mbai_gdb_spark.pipeline.scores import build_score_chain, score_next_chain
    from mbai_gdb_spark.pipeline.stints import (
        build_player_stints,
        cross_period_next_chain,
        player_stint_lineup_edges,
    )

    def _maybe_persist(df: DataFrame) -> DataFrame:
        return df.persist() if persist_intermediates else df

    t: _LazyTables = _LazyTables(
        {
            "periods": lambda: build_periods(pbp),
            "period_next": lambda: period_next_chain(t["periods"]),
            "lineup_stints": lambda: _maybe_persist(
                build_lineup_stints(pbp, starters)
            ),
            "lineup_next": lambda: on_court_next_edges(t["lineup_stints"]),
            "player_stints": lambda: _maybe_persist(
                build_player_stints(t["lineup_stints"])
            ),
            "stint_edges": lambda: player_stint_lineup_edges(t["player_stints"]),
            "stint_next": lambda: cross_period_next_chain(
                t["lineup_stints"], t["player_stints"]
            ),
            "actions": lambda: _maybe_persist(shape_actions(pbp)),
            "actions_attributed": lambda: join_actions_to_stints(
                t["actions"], t["lineup_stints"]
            ),
            "action_edges": lambda: build_action_edges(
                t["actions"], t["lineup_stints"], t["player_stints"]
            ),
            "rebound_attribution": lambda: attribute_rebounds(t["actions"]),
            "action_next": lambda: action_next_chain(t["actions"]),
            "scores": lambda: build_score_chain(t["actions"], home_teams),
            "score_next": lambda: score_next_chain(t["scores"]),
            "lineup_plus_minus": lambda: _maybe_persist(
                lineup_plus_minus(t["actions"], t["lineup_stints"])
            ),
            "player_plus_minus": lambda: player_plus_minus(
                t["lineup_plus_minus"], t["stint_edges"]
            ),
        }
    )
    return t


def materialize_outputs(
    tables: dict,
    output_names: tuple[str, ...],
    writer=None,
    max_workers: int = 4,
) -> None:
    """Materialize several independent pipeline outputs CONCURRENTLY.

    Spark jobs submitted from different threads overlap their scheduling
    and stage gaps (standard practice for multi-sink pipelines; at
    cluster scale the same shape applies with the FAIR scheduler).  The
    persisted fan-out tables are eagerly computed FIRST — concurrent
    jobs racing a cold lazy cache would each recompute the kernel.

    ``writer(df)`` performs the sink write; default is a noop-format
    write (benchmark mode).
    """
    from concurrent.futures import ThreadPoolExecutor

    if writer is None:
        def writer(df):
            df.write.format("noop").mode("overwrite").save()

    # Dependency-ordered waves (r15): wave 2's tables read wave 1's
    # caches, so warming them together used to COMPUTE the kernel
    # twice (two threads each filling the cold lineup_stints cache
    # partition-by-partition).  Within a wave the tables are
    # independent.  Only cached outputs that a requested output
    # actually needs are warmed — lineup_plus_minus feeds both the
    # plus-minus outputs, so its cache is a fan-out point too.
    needed = set(output_names)
    waves = (
        ("lineup_stints", "actions"),
        ("player_stints", "lineup_plus_minus"),
    )
    for wave in waves:
        group = [
            tables[n]
            for n in wave
            if (
                n in tables
                and (n != "lineup_plus_minus"
                     or needed & {"lineup_plus_minus", "player_plus_minus"})
                and tables[n].is_cached
            )
        ]
        if group:
            with ThreadPoolExecutor(len(group)) as ex:
                list(ex.map(lambda d: d.count(), group))
    with ThreadPoolExecutor(max_workers) as ex:
        list(ex.map(lambda n: writer(tables[n]), output_names))
