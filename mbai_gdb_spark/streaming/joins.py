"""Watermarked stream-stream interval + as-of joins — the incremental
twins of the batch purchase→click attribution and the J7 as-of join
(j3/j7 family, ops.intervals).

Spark buffers both sides in state and emits a match as soon as the pair
arrives; the event-time range condition PLUS watermarks on both inputs
let the engine evict buffered rows once no future match is possible, so
state is bounded by (rate × tolerance + watermark horizon) per side —
the only stream-stream join shape that survives unbounded streams.

The join condition keeps the user_id equi key, so state is partitioned
by user exactly like the batch hash join; the time range is a residual.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

if TYPE_CHECKING:  # pandas is only needed by the rebound twin's kernel
    import pandas as pd


def purchase_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    tolerance_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Each purchase joined to every click by the same user within the
    preceding ``tolerance_minutes`` (click_ts <= purchase_ts).  Works on
    two STREAMING inputs (each gets its own watermark) and, unchanged,
    on batch frames — the test asserts stream ≡ batch.

    Output: (user_id, purchase_id, purchase_ts, click_id, click_ts,
    purchase_cents)."""
    c = (
        clicks.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.round(F.col("value") * 100, 0).cast("long").alias("purchase_cents"),
        )
    )
    cond = (
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr(f"INTERVAL {tolerance_minutes} MINUTES")
        )
    )
    return p.join(c, cond, "inner").select(
        "user_id",
        "purchase_id",
        "purchase_ts",
        "click_id",
        "click_ts",
        "purchase_cents",
    )


def asof_click_to_view(
    clicks: DataFrame,
    views: DataFrame,
    tolerance_seconds: int = 600,
    watermark: str = "30 minutes",
    agg_window: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of the J7 as-of-with-tolerance join
    (``ops.intervals.asof_join`` as used by ``j7_asof_click_to_view``):
    each click matched to the SINGLE latest view by the same user at or
    before it, within ``tolerance_seconds``; clicks with no such view
    are dropped (inner as-of).

    Two chained stateful operators, both state-bounded by watermarks:

    1. a stream-stream range join (user equi key + event-time range
       residual) buffers each side only within (tolerance + watermark
       horizon) — the interval-join shape above;
    2. a windowed ``MAX(struct(view_ts, view_event_id))`` per click
       reduces the candidate set to the as-of winner.  The struct-max
       mirrors the batch tie order ``ORDER BY ts DESC, event_id DESC``,
       and grouping by (click_event_id, window(click_ts)) gives the
       aggregation the event-time window append mode needs to finalize
       groups as the watermark passes — a click's candidates all share
       its timestamp, so the window never splits a group.

    Works unchanged on batch frames (withWatermark is a no-op there);
    the test asserts stream ≡ batch ≡ the j7 oracle fixture.

    Output: (user_id, click_event_id, click_ts, view_event_id,
    view_ts, micros_since_view).
    """
    v = (
        views.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_event_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        clicks.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            F.col("event_id").alias("click_event_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    cond = (
        (F.col("v_user_id") == F.col("user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (
            F.col("view_ts")
            >= F.col("click_ts") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        )
    )
    cand = c.join(v, cond, "inner")
    picked = (
        cand.groupBy(
            "user_id",
            "click_event_id",
            F.window("click_ts", agg_window).alias("_w"),
        )
        .agg(
            F.max(F.struct("view_ts", "view_event_id")).alias("_best"),
            F.max("click_ts").alias("click_ts"),
        )
        .drop("_w")
    )
    return picked.select(
        "user_id",
        "click_event_id",
        "click_ts",
        F.col("_best.view_event_id").alias("view_event_id"),
        F.col("_best.view_ts").alias("view_ts"),
        (
            F.unix_micros(F.col("click_ts"))
            - F.unix_micros(F.col("_best.view_ts"))
        ).alias("micros_since_view"),
    )


# ---------------------------------------------------------------------------
# Streaming rebound→shot attribution (the J7+J8 claim-once kernel's twin)
# ---------------------------------------------------------------------------

REBOUND_ATTR_SCHEMA = T.StructType(
    [
        T.StructField("game_id", T.LongType()),
        T.StructField("rebound_id", T.LongType()),
        T.StructField("shot_id", T.LongType()),
    ]
)

# Pending per-game state: parallel arrays of (id, event-time micros) for
# the buffered missed shots and rebounds still inside the watermark
# horizon.  Bounded: a shot is evicted once watermark passes
# shot_ts + tolerance (no future rebound can reference it), a rebound
# once its claim resolves — so state per game is O(rate × (tolerance +
# watermark slack)), never O(game length).
_RA_STATE = T.StructType(
    [
        T.StructField("shot_ids", T.ArrayType(T.LongType())),
        T.StructField("shot_ts", T.ArrayType(T.LongType())),
        T.StructField("reb_ids", T.ArrayType(T.LongType())),
        T.StructField("reb_ts", T.ArrayType(T.LongType())),
    ]
)


def _make_rebound_update(tolerance_us: int):
    """Build the applyInPandasWithState update function.

    Finalization logic (all driven by the event-time watermark, so the
    result is independent of micro-batch boundaries):

    - a REBOUND's candidate set is complete once wm > rebound_ts (every
      missed shot at or before it has arrived); its as-of pick is the
      MAX (shot_ts, shot_id) among shots in [rebound_ts - tolerance,
      rebound_ts] — the batch asof_join's latest-shot semantics with the
      exact-tie pinned to the higher shot_id (the batch window leaves
      same-timestamp right rows unordered; the twin is deterministic).
    - a SHOT's claim is decidable once wm > shot_ts + tolerance: every
      rebound that could pick it is then finalized too (their ts is at
      most shot_ts + tolerance < wm).  The earliest claimant —
      MIN (rebound_ts, rebound_id), the batch claim-once window order —
      is emitted; ALL claimants (winner and losers) leave the state,
      mirroring the batch pass where losing rebounds are dropped, not
      reassigned.
    - a finalized rebound with NO candidate shot is dropped silently
      (inner as-of).
    """

    def _update(key, pdfs: "Iterator[pd.DataFrame]", state: GroupState):
        import pandas as pd

        if state.exists:
            s_ids, s_ts, r_ids, r_ts = state.get
            shots = dict(zip(s_ids, s_ts))
            rebs = dict(zip(r_ids, r_ts))
        else:
            shots, rebs = {}, {}
        wm_us = state.getCurrentWatermarkMs() * 1000
        for pdf in pdfs:
            if pdf.empty:
                continue
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            for kind, rid, t in zip(
                pdf["kind"].tolist(), pdf["id"].tolist(), ts_us
            ):
                if t < wm_us:
                    continue  # late past the watermark: dropped, as documented
                if kind == "s":
                    shots[int(rid)] = t
                else:
                    rebs[int(rid)] = t
        out_rows: list[tuple[int, int, int]] = []
        if wm_us > 0:
            # As-of pick for every finalized rebound (candidate set complete).
            picks: dict[int, tuple[int, int] | None] = {}
            for rid, rts in rebs.items():
                if rts < wm_us:
                    best = None
                    for sid, sts in shots.items():
                        if rts - tolerance_us <= sts <= rts and (
                            best is None or (sts, sid) > best
                        ):
                            best = (sts, sid)
                    picks[rid] = best
            # Claim-once on every shot past its claim horizon.
            for sid in [s for s, t in shots.items() if t + tolerance_us < wm_us]:
                claimants = [
                    (rebs[rid], rid)
                    for rid, b in picks.items()
                    if b is not None and b[1] == sid
                ]
                if claimants:
                    _, win_rid = min(claimants)
                    out_rows.append((key[0], win_rid, sid))
                for _, rid in claimants:
                    rebs.pop(rid, None)
                    picks.pop(rid, None)
                shots.pop(sid)
            # Finalized rebounds with no candidates: inner semantics, drop.
            for rid, b in list(picks.items()):
                if b is None:
                    rebs.pop(rid, None)
                    picks.pop(rid, None)
        if not shots and not rebs:
            state.remove()
        else:
            state.update(
                (
                    list(shots.keys()),
                    list(shots.values()),
                    list(rebs.keys()),
                    list(rebs.values()),
                )
            )
            # Wake at the earliest future decision point even if the
            # game goes quiet: the next shot-claim horizon or rebound
            # finalization.  Must sit strictly past the current watermark.
            nxt_us = min(
                [t + tolerance_us for t in shots.values()]
                + [t for t in rebs.values()]
            )
            state.setTimeoutTimestamp(
                max(nxt_us // 1000 + 1, state.getCurrentWatermarkMs() + 1)
            )
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["game_id", "rebound_id", "shot_id"]
            )

    return _update


def rebound_attribution(
    rebounds: DataFrame,
    missed_shots: DataFrame,
    tolerance_seconds: float = 10.0,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming twin of ``pipeline.actions.attribute_rebounds`` (the
    greedy claim-once rebound→latest-missed-shot attribution): each
    rebound resolves to the latest missed shot within
    ``tolerance_seconds`` before it, each shot is claimed by at most one
    rebound (earliest wins), losing rebounds are dropped.

    The batch version is two window passes over a game-scoped union
    timeline; the chained built-in streaming shape (interval join →
    per-rebound agg → per-shot agg) is NOT expressible because the
    second keyed aggregation would have to window on the SHOT's
    timestamp, whose event-time/watermark metadata does not survive the
    first aggregation.  Instead this is ONE custom stateful operator —
    the watermark + per-game claimed-set state the batch kernel implies:
    both inputs union-tagged into a single watermarked stream, state
    keyed by game_id, finalization purely watermark-driven (see
    :func:`_make_rebound_update`), so output is independent of
    micro-batch boundaries and replay-safe under checkpointing.

    Inputs: ``rebounds (game_id, rebound_id, ts)`` and ``missed_shots
    (game_id, shot_id, ts)``; event-time timestamps (the batch kernel's
    numeric game-clock seconds map 1:1 onto a timestamp axis).  Unlike
    the stateless twins this CANNOT run on batch frames
    (applyInPandasWithState is streaming-only); the equivalence test
    feeds the same fixture to both implementations instead.

    Output: (game_id, rebound_id, shot_id) — the batch kernel's exact
    schema.
    """
    r = rebounds.select(
        "game_id",
        F.lit("r").alias("kind"),
        F.col("rebound_id").alias("id"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    s = missed_shots.select(
        "game_id",
        F.lit("s").alias("kind"),
        F.col("shot_id").alias("id"),
        F.col("ts").cast("timestamp").alias("ts"),
    )
    tagged = r.unionByName(s).withWatermark("ts", watermark)
    return tagged.groupBy("game_id").applyInPandasWithState(
        _make_rebound_update(int(tolerance_seconds * 1_000_000)),
        outputStructType=REBOUND_ATTR_SCHEMA,
        stateStructType=_RA_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
