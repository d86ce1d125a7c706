"""Action shaping, stint attribution joins, rebound as-of attribution.

Re-expresses the reference's eight per-type Cypher writers
(src/queries/game.py:209-591) as one shaped actions table plus reusable
joins:

- shaping (P5): clock parsing, dual clocks, points, label taxonomy —
  pure column algebra, no UDFs (the reference does this row-by-row in
  Python, src/managers/game.py:205-274);
- containment join (J3): action → containing team stint on
  (game, team) + global-clock range — hash join w/ residual;
- actor resolution (J4): action → acting player's PlayerStint;
- opponent attribution (J5): drawn-foul / steal / block credited to the
  *other* team's player (equi-join after resolving the opponent's id);
- rebound as-of attribution (J7/J8): rebound → latest missed shot ≤10 s
  back, each shot claimed by at most one rebound (greedy earliest
  rebound wins — deterministic; the reference's version is unscoped and
  order-dependent, SURVEY §2.11);
- global action NEXT chain (W7): time + label-priority ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.chain import chain_next, with_priority
from mbai_gdb_spark.ops.intervals import asof_join, interval_join
from mbai_gdb_spark.pipeline.periods import (
    clock_seconds_remaining,
    period_global_offset,
    period_len,
)

ACTION_PRIORITY = {
    "jumpball": 1,
    "violation": 2,
    "foul": 3,
    "2pt": 4,
    "3pt": 4,
    "freethrow": 5,
    "rebound": 6,
    "turnover": 7,
    "timeout": 9,
    "substitution": 8,
}

SCORING_TYPES = ("2pt", "3pt", "freethrow")


def shape_actions(pbp: DataFrame) -> DataFrame:
    """Normalize play-by-play into the typed actions table with dual
    clocks, points, and a label array (multi-label taxonomy → array +
    boolean hot columns, SURVEY §1.4)."""
    plen = period_len(F.col("period"))
    local_clock = plen - clock_seconds_remaining(F.col("clock"))
    a = pbp.filter(~F.col("actionType").isin("period", "substitution"))
    points = (
        F.when(
            (F.col("actionType") == "2pt") & (F.col("shotResult") == "Made"), 2
        )
        .when((F.col("actionType") == "3pt") & (F.col("shotResult") == "Made"), 3)
        .when(
            (F.col("actionType") == "freethrow") & (F.col("shotResult") == "Made"), 1
        )
        .otherwise(0)
    )
    # Free-throw pairs share a clock value; the reference adds +100 ms per
    # attempt to keep siblings ordered (src/queries/game.py:446).  Keep
    # that ordering nudge — it is load-bearing for the NEXT/score chains.
    ft_attempt = F.when(
        F.col("actionType") == "freethrow",
        F.split(F.col("subType"), " ").getItem(0).cast("double"),
    ).otherwise(F.lit(0.0))
    local_adj = local_clock + ft_attempt * 0.1
    labels = F.array_compact(
        F.array(
            F.col("actionType"),
            F.col("subType"),
            F.col("descriptor"),
            F.col("shotResult"),
        )
    )
    # Jumpball rows name the recoverer via their own column (source feed's
    # "Recoverd" spelling, FIXTURES.md §4); treat them as the acting player.
    actor = F.when(
        F.col("actionType") == "jumpball",
        F.coalesce(F.col("jumpBallRecoverdPersonId"), F.col("personId")),
    ).otherwise(F.col("personId"))
    return a.select(
        "game_id",
        F.col("action_id"),
        F.col("timeActual").alias("time"),
        "period",
        F.col("teamId").alias("team_id"),
        actor.alias("player_id"),
        F.col("jumpBallWonPersonId").alias("jump_won_player_id"),
        F.col("jumpBallLostPersonId").alias("jump_lost_player_id"),
        F.col("assistPersonId").alias("assist_player_id"),
        F.col("blockPersonId").alias("block_player_id"),
        F.col("stealPersonId").alias("steal_player_id"),
        F.col("foulDrawnPersonId").alias("foul_drawn_player_id"),
        F.col("actionType").alias("action_type"),
        F.col("subType").alias("sub_type"),
        "descriptor",
        "x",
        "y",
        F.col("shotDistance").alias("distance"),
        (F.col("shotResult") == "Made").alias("is_made"),
        points.alias("points"),
        labels.alias("labels"),
        local_adj.alias("local_clock"),
        (period_global_offset(F.col("period")) + local_adj).alias("global_clock"),
    )


def join_actions_to_stints(actions: DataFrame, lineup_stints: DataFrame) -> DataFrame:
    """J3: each action → the acting team's containing lineup stint
    ([start, end) on the global clock; equi keys game+team)."""
    stints = lineup_stints.select(
        "game_id",
        "team_id",
        F.col("stint_id"),
        F.col("player_ids").alias("stint_player_ids"),
        F.col("global_start"),
        F.col("global_end"),
    )
    return interval_join(
        actions.filter(F.col("team_id").isNotNull()),
        stints,
        equi_keys=["game_id", "team_id"],
        event_time="global_clock",
        start="global_start",
        end="global_end",
        closed="left",
    ).drop("global_start", "global_end")


def resolve_actor_stints(
    attributed: DataFrame, player_stint_edges: DataFrame
) -> DataFrame:
    """J4/J6: acting player's PlayerStint via the ON_COURT_WITH edge; LEFT
    join keeps team-only actions (timeouts etc.) with a null actor stint
    — the reference's OPTIONAL MATCH fallback."""
    edges = player_stint_edges.select(
        "game_id",
        F.col("player_id"),
        "stint_id",
        F.col("player_stint_id").alias("actor_player_stint_id"),
    )
    return attributed.join(edges, ["game_id", "player_id", "stint_id"], "left")


def attribute_rebounds(actions: DataFrame) -> DataFrame:
    """J7 + J8: rebound → the latest missed field goal within 10 s of
    game clock, game-scoped, each shot claimed at most once (earliest
    rebound wins).  As-of via union-timeline window; claim-once via a
    second top-1 window — both deterministic.

    The reference's version (src/queries/game.py:506-513) lacks game
    scoping and is MERGE-order-dependent; this implements the intended
    semantics (SURVEY §2.11)."""
    rebounds = actions.filter(F.col("action_type") == "rebound").select(
        "game_id",
        F.col("action_id").alias("rebound_id"),
        F.col("global_clock"),
    )
    missed = actions.filter(
        F.col("action_type").isin("2pt", "3pt") & ~F.col("is_made")
    ).select(
        "game_id",
        F.col("global_clock").alias("shot_clock"),
        F.col("action_id").alias("shot_id"),
    )
    matched = asof_join(
        rebounds,
        missed,
        by=["game_id"],
        left_ts="global_clock",
        right_ts="shot_clock",
        right_cols=["shot_id"],
        tolerance_seconds=10.0,
        direction="backward",
        how="inner",
        numeric=True,
    )
    within = matched
    # Claim-once: if several rebounds resolved to the same shot, the
    # earliest rebound keeps it.
    w = Window.partitionBy("game_id", "shot_id").orderBy(
        F.col("global_clock"), F.col("rebound_id")
    )
    return (
        within.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select("game_id", "rebound_id", "shot_id")
    )


def action_next_chain(actions: DataFrame) -> DataFrame:
    """W7: global per-period action ordering (time, global_clock,
    label priority) → NEXT edges with time/clock deltas."""
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
        "game_id",
        "period",
        "action_id",
        "next_action_id",
        ((F.col("next_t_us") - F.col("t_us")).cast("double") / 1e6).alias("time_delta_s"),
        (F.col("next_global_clock") - F.col("global_clock")).alias("clock_delta_s"),
    )


# Edge-type mapping: actionType → primary-actor edge label (reference
# relationship inventory, SURVEY §1.3 / src/queries/game.py:237-591).
PRIMARY_EDGE_TYPES = {
    "2pt": "TOOK_SHOT",
    "3pt": "TOOK_SHOT",
    "freethrow": "TOOK_SHOT",
    "foul": "COMMITTED_FOUL",
    "rebound": "REBOUNDED",
    "turnover": "LOST_BALL",
    "violation": "COMMITTED_VIOLATION",
    "jumpball": "RECOVERED_JUMPBALL",
}

# (column, edge label) for secondary actors.  Assists are same-team;
# blocks/steals/drawn fouls credit the OPPONENT's player (J5 —
# reference src/queries/game.py:346-357, 417-427, 557-567).
SECONDARY_EDGE_COLS = [
    ("assist_player_id", "ASSISTED"),
    ("block_player_id", "BLOCKED"),
    ("steal_player_id", "STOLE_BALL"),
    ("foul_drawn_player_id", "DREW_FOUL"),
    ("jump_won_player_id", "WON_JUMPBALL"),
    ("jump_lost_player_id", "LOST_JUMPBALL"),
]


def resolve_player_stint_at(
    events: DataFrame, player_col: str, player_stints: DataFrame, out_col: str
) -> DataFrame:
    """Attach the player-stint containing each event's global clock for
    the player named in ``player_col`` (equi keys game+player, residual
    [start, end) range — a J3-shaped hash join, works for EITHER team's
    players so opponent attribution needs no special casing)."""
    ps = player_stints.select(
        F.col("game_id").alias("__ps_game__"),
        F.col("player_id").alias("__ps_player__"),
        F.col("player_stint_id").alias(out_col),
        F.col("global_start").alias("__ps_start__"),
        F.col("global_end").alias("__ps_end__"),
    )
    # Single-pass LEFT join with the range residual inside the join
    # condition: events whose player has no containing stint (or a null
    # player) keep their row with a null resolution.  Stints partition a
    # player's time, so at most one interval matches — no fan-out.
    cond = (
        (F.col("game_id") == F.col("__ps_game__"))
        & (F.col(player_col) == F.col("__ps_player__"))
        & (F.col("global_clock") >= F.col("__ps_start__"))
        & (F.col("global_clock") < F.col("__ps_end__"))
    )
    return events.join(ps, cond, "left").drop(
        "__ps_game__", "__ps_player__", "__ps_start__", "__ps_end__"
    )


def build_action_edges(
    actions: DataFrame, lineup_stints: DataFrame, player_stints: DataFrame
) -> DataFrame:
    """The full typed edge table set in long format:
    (game_id, edge_type, src_kind, src_id, action_id).

    - primary actor → PlayerStint edge per action type; when the action
      has no personId (team-level: timeouts, team rebounds/turnovers)
      the edge falls back to the team's LineUpStint (J6 OPTIONAL MATCH
      fallback, reference src/queries/game.py:237-259);
    - secondary actors (assist / block / steal / drawn foul) resolve via
      their own player-stint containment — including opponent players.
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in PRIMARY_EDGE_TYPES.items() for x in kv]
    )
    attributed = join_actions_to_stints(actions, lineup_stints)
    with_actor = resolve_player_stint_at(
        attributed.filter(F.col("action_type") != "timeout"),
        "player_id",
        player_stints,
        "actor_stint_id",
    )
    primary_player = with_actor.filter(F.col("actor_stint_id").isNotNull()).select(
        "game_id",
        mapping[F.col("action_type")].alias("edge_type"),
        F.lit("player_stint").alias("src_kind"),
        F.col("actor_stint_id").alias("src_id"),
        "action_id",
    )
    # team-level fallback: no resolvable player → lineup-stint edge
    primary_team = with_actor.filter(F.col("actor_stint_id").isNull()).select(
        "game_id",
        mapping[F.col("action_type")].alias("edge_type"),
        F.lit("lineup_stint").alias("src_kind"),
        F.col("stint_id").alias("src_id"),
        "action_id",
    )
    timeouts = attributed.filter(F.col("action_type") == "timeout").select(
        "game_id",
        F.lit("CALLED_TIMEOUT").alias("edge_type"),
        F.lit("lineup_stint").alias("src_kind"),
        F.col("stint_id").alias("src_id"),
        "action_id",
    )
    edges = primary_player.unionByName(primary_team).unionByName(timeouts)

    # Secondary actors: melt the six columns to long format and resolve
    # with ONE containment join over a single pass of the actions source
    # (the per-column loop re-read the events frame 6×).
    stack_args = ", ".join(
        f"'{label}', {col}" for col, label in SECONDARY_EDGE_COLS
    )
    melted = actions.select(
        "game_id",
        "action_id",
        "global_clock",
        F.expr(
            f"stack({len(SECONDARY_EDGE_COLS)}, {stack_args})"
            " AS (edge_type, sec_player_id)"
        ),
    ).filter(F.col("sec_player_id").isNotNull())
    resolved = resolve_player_stint_at(
        melted, "sec_player_id", player_stints, "sec_stint_id"
    )
    secondary = resolved.filter(F.col("sec_stint_id").isNotNull()).select(
        "game_id",
        "edge_type",
        F.lit("player_stint").alias("src_kind"),
        F.col("sec_stint_id").alias("src_id"),
        "action_id",
    )
    return edges.unionByName(secondary)


def derive_possessions(actions: DataFrame) -> DataFrame:
    """Possession segmentation — implements the node type the reference
    declares but never creates (constraints at src/queries/setup.py:18,
    32-33; SURVEY §1.2 roadmap stub).

    A possession ends at: a turnover, a made field goal, a defensive
    rebound, or the final made free throw of a trip ('2 of 2').  The
    possession index is a running count of ENDED possessions strictly
    before each action (so the ending action still belongs to its
    possession) — one window over the game partition.
    """
    ends = (
        (F.col("action_type") == "turnover")
        | (F.col("action_type").isin("2pt", "3pt") & F.col("is_made"))
        | ((F.col("action_type") == "rebound") & (F.col("sub_type") == "defensive"))
        | (
            (F.col("action_type") == "freethrow")
            & F.col("is_made")
            & (F.col("sub_type") == "2 of 2")
        )
    ).cast("int")
    prio = with_priority(actions, "action_type", ACTION_PRIORITY, default=9)
    order = [F.col("global_clock"), F.col("priority"), F.col("action_id")]
    w_prev = (
        Window.partitionBy("game_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tagged = prio.withColumn("__ends__", ends).withColumn(
        "possession_seq",
        (F.coalesce(F.sum("__ends__").over(w_prev), F.lit(0)) + 1).cast("long"),
    )
    return tagged.groupBy("game_id", "possession_seq").agg(
        F.min("global_clock").alias("start_clock"),
        F.max("global_clock").alias("end_clock"),
        F.count(F.lit(1)).alias("n_actions"),
        F.sum("points").alias("points"),
    )
