"""Lineup reconstruction kernel (W11 — the one genuinely procedural
operator; reference src/managers/game.py:139-199).

Semantics (re-derived, not ported): per (game, team), walk substitution
events in period/clock order maintaining the 5-man on-court set.
Period 1 starts from the boxscore starters; later periods carry the
previous period's closing lineup.  Substitutions at the period-start
clock replace members *before* the period's opening stint is emitted
(the reference's start_mask branch); mid-period changes close the
current stint and open a new one.  A stint is emitted only when the
lineup actually changes (emit-on-change, reference game.py:183-193).

Spark shape: ``groupBy(game_id, team_id).applyInPandas`` — bounded state
(one game's substitutions ≈ dozens of rows per key), Arrow-batched, and
embarrassingly parallel across the (game, team) key space: the layout
that holds at a 100 TB season corpus.  Everything downstream of this
kernel is pure column algebra again.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbai_gdb_spark.pipeline.periods import (
    clock_seconds_remaining,
    period_global_offset,
    period_len,
)

LINEUP_STINT_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.LongType()),
        T.StructField("team_id", T.LongType()),
        T.StructField("period", T.IntegerType()),
        T.StructField("stint_seq", T.IntegerType()),
        T.StructField("lineup_id", T.StringType()),
        T.StructField("player_ids", T.ArrayType(T.LongType())),
        T.StructField("local_start", T.DoubleType()),
        T.StructField("start_time", T.TimestampType()),
    ]
)


def _reconstruct(key, pdf):
    """Grouped-map kernel: one (game, team)'s starters + substitutions →
    lineup-change events (stint openings).

    r14 (guide §4.2): the per-group body is PLAIN PYTHON over column
    lists — a group is ~dozens of rows, where pandas' sort_values /
    boolean masks / groupby cost milliseconds of framework overhead per
    call while the actual state walk is microseconds; across a season
    corpus (4,000 groups at the 2,000-game bench tier) the pandas
    version spent ~95 % of kernel task time in that overhead.  The
    event semantics are UNCHANGED: stable (period, elapsed, action_id)
    sub order, NaN-elapsed rows ignored (the pandas version's ==/>
    masks and groupby dropped them too), period-start subs applied
    before the opening stint, emit-on-change."""
    def _num(x):
        # NaN (float) and None (object column) both read as "absent".
        return x is not None and x == x

    game_id, team_id = int(key[0]), int(key[1])
    kinds = pdf["kind"].tolist()
    player_ids = pdf["player_id"].tolist()
    period_col = pdf["period"].tolist()
    elapsed_col = pdf["elapsed"].tolist()
    action_col = pdf["action_id"].tolist()
    sub_type_col = pdf["sub_type"].tolist()
    time_col = pdf["time"].tolist()

    starters = sorted(
        int(p) for p, kd in zip(player_ids, kinds) if kd == "starter" and _num(p)
    )
    # Wall-clock period starts (reference stints carry start_time/
    # end_time alongside the game clocks, src/queries/game.py:105-125).
    period_start = {
        int(period_col[i]): time_col[i]
        for i in range(len(kinds))
        if kinds[i] == "period" and _num(period_col[i])
    }
    periods = sorted(period_start)
    # Stable sub order on the (period, elapsed, action_id) KEY ONLY —
    # sub_type/player_id never participate in the comparison (advice
    # r14: a None sub_type under a duplicated action_id made the bare
    # tuple sort raise TypeError).  NaN/None period, action_id or
    # player_id and NaN/negative elapsed are skipped like NaN elapsed
    # always was (the pre-r14 pandas masks/groupby dropped such rows
    # silently; the int() casts here would crash the task instead).
    subs = sorted(
        (
            (int(period_col[i]), float(elapsed_col[i]), int(action_col[i]),
             sub_type_col[i], int(player_ids[i]), time_col[i])
            for i in range(len(kinds))
            if kinds[i] == "sub"
            and _num(period_col[i])
            and _num(action_col[i])
            and _num(player_ids[i])
            and _num(elapsed_col[i])
            and elapsed_col[i] >= 0.0
        ),
        key=lambda r: r[:3],
    )

    out_rows = []
    on_court = set(starters)
    si, n_subs = 0, len(subs)
    for period in periods:
        # Apply period-start substitutions (elapsed == 0) before
        # emitting the opening stint.  Subs are sorted by period, so a
        # single cursor walks them once.
        while si < n_subs and subs[si][0] < period:
            si += 1  # subs in a period with no marker row: ignored, as before
        while si < n_subs and subs[si][0] == period and subs[si][1] == 0.0:
            sub_type, player_id = subs[si][3], subs[si][4]
            if sub_type == "out":
                on_court.discard(player_id)
            else:
                on_court.add(player_id)
            si += 1
        seq = 0
        current = tuple(sorted(on_court))
        if len(current) == 5:
            out_rows.append(
                (game_id, team_id, period, seq, current, 0.0,
                 period_start.get(period))
            )
        # Mid-period changes: emit a new stint whenever the set is full
        # and different from the last emitted lineup; rows sharing an
        # elapsed value apply together (one group).
        while si < n_subs and subs[si][0] == period:
            elapsed = subs[si][1]
            wall = None
            while (
                si < n_subs
                and subs[si][0] == period
                and subs[si][1] == elapsed
            ):
                sub_type, player_id, t = subs[si][3], subs[si][4], subs[si][5]
                if sub_type == "out":
                    on_court.discard(player_id)
                else:
                    on_court.add(player_id)
                wall = t
                si += 1
            nxt = tuple(sorted(on_court))
            if len(nxt) == 5 and nxt != current:
                seq += 1
                out_rows.append(
                    (game_id, team_id, period, seq, nxt, float(elapsed), wall)
                )
                current = nxt
    return pd.DataFrame(
        {
            "game_id": [r[0] for r in out_rows],
            "team_id": [r[1] for r in out_rows],
            "period": [r[2] for r in out_rows],
            "stint_seq": [r[3] for r in out_rows],
            "lineup_id": ["_".join(str(x) for x in r[4]) for r in out_rows],
            "player_ids": [list(r[4]) for r in out_rows],
            "local_start": [r[5] for r in out_rows],
            "start_time": [r[6] for r in out_rows],
        },
        columns=[f.name for f in LINEUP_STINT_SCHEMA.fields],
    )


def kernel_input(pbp: DataFrame, starters: DataFrame) -> DataFrame:
    """The W11 kernel's input relation: starters + substitutions +
    per-(team, period) marker rows, one schema (shared by the batch
    applyInPandas kernel and the streaming stateful engine)."""
    plen = period_len(F.col("period"))
    subs = pbp.filter(F.col("actionType") == "substitution").select(
        "game_id",
        F.col("teamId").alias("team_id"),
        "period",
        F.col("action_id"),
        (plen - clock_seconds_remaining(F.col("clock"))).alias("elapsed"),
        F.col("subType").alias("sub_type"),
        F.col("personId").alias("player_id"),
        F.col("timeActual").alias("time"),
        F.lit("sub").alias("kind"),
    )
    # One 'period' row per (team, period) so the kernel knows the period
    # roster carries over even with no subs; carries the period's wall
    # start time for stint start_time derivation.
    period_rows = (
        pbp.filter(F.col("actionType") == "period")
        .groupBy("game_id", "period")
        .agg(F.min("timeActual").alias("time"))
        .join(
            starters.select("game_id", F.col("TEAM_ID").alias("team_id")).distinct(),
            "game_id",
        )
        .select(
            "game_id",
            "team_id",
            "period",
            F.lit(None).cast("long").alias("action_id"),
            F.lit(None).cast("double").alias("elapsed"),
            F.lit(None).cast("string").alias("sub_type"),
            F.lit(None).cast("long").alias("player_id"),
            "time",
            F.lit("period").alias("kind"),
        )
    )
    starter_rows = starters.filter(F.col("START_POSITION") != "").select(
        "game_id",
        F.col("TEAM_ID").alias("team_id"),
        F.lit(1).cast("int").alias("period"),
        F.lit(None).cast("long").alias("action_id"),
        F.lit(None).cast("double").alias("elapsed"),
        F.lit(None).cast("string").alias("sub_type"),
        F.col("PLAYER_ID").alias("player_id"),
        F.lit(None).cast("timestamp").alias("time"),
        F.lit("starter").alias("kind"),
    )
    return subs.unionByName(period_rows).unionByName(starter_rows)


def _kernel_parallelism(df: DataFrame) -> int:
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):  # "auto" under some AQE configs
        return df.sparkSession.sparkContext.defaultParallelism


def lineup_change_events(pbp: DataFrame, starters: DataFrame) -> DataFrame:
    """Run the W11 kernel; returns stint-opening events
    (game_id, team_id, period, stint_seq, lineup_id, player_ids,
    local_start).

    The explicit ``repartition(n, keys)`` below pins the kernel's
    fan-out.  Without it, AQE's partition coalescing — which sizes
    post-shuffle partitions by SHUFFLE BYTES and is blind to Python
    compute cost — merges the kernel input into one or two partitions
    (a multi-game corpus is only a few MB) and runs the ~12 ms/group
    Python kernel almost serially: measured 42.6 s → 5.5 s for 2000
    games on local[32].  A user-specified repartition with an explicit
    partition count is exempt from coalescing, and groupBy on the same
    keys reuses its partitioning, so this adds no extra exchange."""
    kin = kernel_input(pbp, starters)
    kin = kin.repartition(_kernel_parallelism(kin), "game_id", "team_id")
    return kin.groupBy("game_id", "team_id").applyInPandas(
        _reconstruct, LINEUP_STINT_SCHEMA
    )


def build_lineup_stints(pbp: DataFrame, starters: DataFrame) -> DataFrame:
    """Full lineup-stint table: change events + lead() window for end
    times and durations (W3 — successor-derived durations with period-end
    coalesce, reference src/queries/game.py:99-125)."""
    from pyspark.sql import Window

    events = lineup_change_events(pbp, starters)
    w = Window.partitionBy("game_id", "team_id", "period").orderBy("local_start")
    plen = period_len(F.col("period"))
    # Wall-clock period ends close each period's last stint (reference
    # end_time coalesce, src/queries/game.py:118-125).
    period_ends = (
        pbp.filter(F.col("actionType") == "period")
        .groupBy("game_id", "period")
        .agg(F.max("timeActual").alias("__period_end_time__"))
    )
    out = (
        events.withColumn("local_end", F.coalesce(F.lead("local_start").over(w), plen))
        .withColumn("clock_duration", F.col("local_end") - F.col("local_start"))
        .withColumn("global_start", period_global_offset(F.col("period")) + F.col("local_start"))
        .withColumn("global_end", period_global_offset(F.col("period")) + F.col("local_end"))
        .join(F.broadcast(period_ends), ["game_id", "period"])
        .withColumn(
            "end_time",
            F.coalesce(F.lead("start_time").over(w), F.col("__period_end_time__")),
        )
        .withColumn(
            "time_duration",
            (
                F.unix_micros(F.col("end_time")) - F.unix_micros(F.col("start_time"))
            ).cast("double")
            / 1e6,
        )
        .drop("__period_end_time__")
        .withColumn(
            "stint_id",
            F.concat_ws(
                "_", "game_id", "team_id", "period", F.col("stint_seq").cast("string")
            ),
        )
    )
    return out


def on_court_next_edges(lineup_stints: DataFrame) -> DataFrame:
    """W4: consecutive lineup stints within a period → NEXT edges."""
    from mbai_gdb_spark.ops.chain import chain_next

    return chain_next(
        lineup_stints,
        partition_by=["game_id", "team_id", "period"],
        order_by=["local_start"],
        next_cols={"stint_id": "next_stint_id"},
    ).select("game_id", "team_id", "period", "stint_id", "next_stint_id")
