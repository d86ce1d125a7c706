"""Streaming lineup engine: the W11 kernel as a live stateful operator.

The batch kernel (pipeline.lineups) reconstructs 5-man lineups per
(game, team) with applyInPandas.  This module runs the SAME semantics
over a live play-by-play feed with ``applyInPandasWithState``: the
on-court set persists in the state store across micro-batches, and
stint-opening events are emitted incrementally as substitutions arrive.

Ordering contract: events for a key must arrive in (period, clock)
order across micro-batches — true of a live pbp feed (and of the
file-per-period test harness).  A production deployment facing
out-of-order delivery would buffer behind a watermark before this
operator; the state logic is unchanged.

State per key: the on-court player set + the last emitted lineup —
O(roster) bytes, keyed by (game_id, team_id): tiny, partitioned, and
evictable after the game ends (timeout).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from mbai_gdb_spark.pipeline.lineups import LINEUP_STINT_SCHEMA

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("players", T.StringType()),       # '_'-joined on-court ids
        T.StructField("last_emitted", T.StringType()),  # last lineup_id emitted
        T.StructField("period", T.IntegerType()),
        T.StructField("seq", T.IntegerType()),
    ]
)


def _lineup_id(players: set[int]) -> str:
    return "_".join(str(p) for p in sorted(players))


def _update_lineups(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    game_id, team_id = int(key[0]), int(key[1])
    if state.exists:
        players_str, last_emitted, cur_period, seq = state.get
        on_court = {int(p) for p in players_str.split("_") if p}
    else:
        on_court, last_emitted, cur_period, seq = set(), "", 0, -1

    out = []
    pdf = pd.concat(list(pdfs), ignore_index=True)
    starters = pdf[pdf.kind == "starter"]
    for p in starters.player_id.dropna():
        on_court.add(int(p))
    subs = pdf[pdf.kind == "sub"].sort_values(
        ["period", "elapsed", "action_id"], kind="mergesort"
    )
    marker = pdf[pdf.kind == "period"]
    period_time = {int(r.period): r.time for _, r in marker.iterrows()}
    periods = sorted(set(marker["period"]) | set(subs.period.unique()))
    for period in periods:
        if period < cur_period:
            continue  # stale replay — state already covers it
        if period > cur_period:
            cur_period, seq = int(period), -1
        period_subs = subs[subs.period == period]
        at_start = period_subs[period_subs.elapsed == 0.0]
        for _, r in at_start.iterrows():
            (on_court.discard if r.sub_type == "out" else on_court.add)(int(r.player_id))
        if seq == -1 and len(on_court) == 5:
            seq = 0
            last_emitted = _lineup_id(on_court)
            out.append(
                (period, seq, last_emitted, sorted(on_court), 0.0,
                 period_time.get(int(period)))
            )
        for elapsed, grp in period_subs[period_subs.elapsed > 0.0].groupby(
            "elapsed", sort=True
        ):
            wall = None
            for _, r in grp.iterrows():
                (on_court.discard if r.sub_type == "out" else on_court.add)(
                    int(r.player_id)
                )
                wall = r.time
            lid = _lineup_id(on_court)
            if len(on_court) == 5 and lid != last_emitted:
                seq += 1
                last_emitted = lid
                out.append((period, seq, lid, sorted(on_court), float(elapsed), wall))

    state.update((_lineup_id(on_court), last_emitted, cur_period, seq))
    yield pd.DataFrame(
        [
            {
                "game_id": game_id,
                "team_id": team_id,
                "period": p,
                "stint_seq": s,
                "lineup_id": lid,
                "player_ids": ids,
                "local_start": e,
                "start_time": w,
            }
            for (p, s, lid, ids, e, w) in out
        ],
        columns=[f.name for f in LINEUP_STINT_SCHEMA.fields],
    )


def streaming_lineup_changes(kernel_stream: DataFrame) -> DataFrame:
    """Stint-opening events from a streaming kernel-input relation
    (schema of ``pipeline.lineups.kernel_input``)."""
    return kernel_stream.groupBy("game_id", "team_id").applyInPandasWithState(
        _update_lineups,
        outputStructType=LINEUP_STINT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kernel_input_from_payload_stream(
    payloads: DataFrame, game_teams: DataFrame
) -> DataFrame:
    """Live-feed wiring: a landing zone of RAW REST payload documents
    (live play-by-play docs AND boxscore snapshots mixed in one stream,
    as a poller would write them) decoded into the kernel-input
    relation STATELESSLY, so the stateful lineup engine is the only
    stateful operator in the query.

    - substitutions / period markers: ``sources.api_snapshot.
      read_pbp_snapshot`` (from_json + explode, stateless).  Period
      rows use the 'start' marker directly instead of the batch path's
      min() aggregation (identical value: start < end), fanned out per
      team via a STREAM-STATIC join with ``game_teams``
      (game_id, team_id) — a static dimension the consumer knows from
      the schedule.
    - starters: ``read_boxscore_snapshot`` over the same payload
      stream (boxscore documents simply don't match the pbp schema and
      vice versa — from_json yields NULLs, filtered out per branch).
    """
    from pyspark.sql import functions as F

    from mbai_gdb_spark.pipeline.periods import (
        clock_seconds_remaining,
        period_len,
    )
    from mbai_gdb_spark.sources.api_snapshot import (
        read_boxscore_snapshot,
        read_pbp_snapshot,
    )

    pbp = read_pbp_snapshot(payloads).filter(F.col("action_id").isNotNull())
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
    period_rows = (
        pbp.filter(
            (F.col("actionType") == "period") & (F.col("subType") == "start")
        )
        .join(F.broadcast(game_teams), "game_id")
        .select(
            "game_id",
            "team_id",
            "period",
            F.lit(None).cast("long").alias("action_id"),
            F.lit(None).cast("double").alias("elapsed"),
            F.lit(None).cast("string").alias("sub_type"),
            F.lit(None).cast("long").alias("player_id"),
            F.col("timeActual").alias("time"),
            F.lit("period").alias("kind"),
        )
    )
    starter_rows = (
        read_boxscore_snapshot(payloads)
        .filter(F.col("START_POSITION") != "")
        .select(
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
    )
    return subs.unionByName(period_rows).unionByName(starter_rows)
