"""Interval containment joins, as-of joins, gaps-and-islands.

These are the reference's signature temporal operators:

- Point-in-interval join (J3): event time ∈ [stint.start, stint.end) for
  the event's (game, team) — appears 9× in the reference
  (src/queries/game.py:233-235, 287-289, 332-334, 400-402, 464-466,
  492-494, 544-545, 589-590, 600-612).
- As-of join with tolerance + claim-once (J7): rebound → latest missed
  shot within 10 s (src/queries/game.py:506-513).
- Gaps-and-islands (W5): a player's consecutive stints merged into runs
  (src/queries/game.py:134-182, flag + prefix-sum via reduce()).

Scale notes: the containment join keeps equi keys (game_id, team_id) so
Spark plans a shuffled/broadcast HASH join with the range predicate as a
cheap residual — never a cartesian.  The as-of join is implemented as a
union-timeline window (single shuffle, no range-join row blowup), which
is the only as-of formulation that survives 100 TB event tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    equi_keys: Sequence[str],
    event_time: str,
    start: str,
    end: str,
    how: str = "inner",
    closed: str = "left",
) -> DataFrame:
    """Join each event to the interval row(s) containing its timestamp.

    ``closed`` ∈ {'left' ([start, end)), 'both' ([start, end])}.
    Equi keys first ⇒ hash join with a residual range filter; Catalyst
    never sees a pure theta join.  Column-name collisions must be
    resolved by the caller (select/alias before calling).
    """
    t = F.col(event_time)
    lo, hi = F.col(start), F.col(end)
    cond: Column = t >= lo
    cond = cond & (t <= hi if closed == "both" else t < hi)
    return events.join(intervals, on=list(equi_keys), how=how).filter(cond) if how == "inner" else _interval_join_outer(events, intervals, equi_keys, cond, how)


def _interval_join_outer(events, intervals, equi_keys, cond, how):
    # For outer flavors the range predicate must live in the join
    # condition, not a post-filter (a post-filter would drop unmatched
    # rows).  Build the combined condition explicitly.
    e, i = events.alias("e"), intervals.alias("i")
    full = None
    for k in equi_keys:
        c = F.col(f"e.{k}") == F.col(f"i.{k}")
        full = c if full is None else (full & c)
    full = cond if full is None else (full & cond)
    return e.join(i, on=full, how=how)


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
    tie_break: Sequence[str] = (),
) -> DataFrame:
    """Gaps-and-islands: assign a per-key session id, new session when the
    gap to the previous row exceeds ``gap_seconds``.

    Classic lag → flag → running-sum recipe; replaces the reference's
    collect + reduce() prefix-sum island builder
    (src/queries/game.py:144-156) with two windows over one shuffle.
    ``tie_break`` columns make the ordering total when timestamps repeat.
    """
    order = [ts, *tie_break]
    w = Window.partitionBy(*keys).orderBy(*order)
    # Integer-microsecond arithmetic: exact, timezone-proof, and identical
    # to the DuckDB oracle's epoch_us() comparisons.
    ts_us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(ts_us).over(w)
    gap = ts_us - prev
    flag = F.when(
        prev.isNull() | (gap > F.lit(int(gap_seconds * 1_000_000))), F.lit(1)
    ).otherwise(F.lit(0))
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new_session", flag).withColumn(
        session_col, F.sum("_new_session").over(run)
    ).drop("_new_session")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    how: str = "inner",
    strict: bool = False,
    numeric: bool = False,
) -> DataFrame:
    """As-of join: for each left row, the single nearest right row at or
    before (``backward``) / at or after (``forward``) its timestamp, within
    an optional tolerance.  Right columns arrive as ``<col>`` aliased from
    ``right_cols``; the matched right timestamp arrives as ``asof_ts``.
    With ``numeric=True`` the timeline columns are treated as plain
    doubles (e.g. game-clock seconds) instead of timestamps.

    Implementation: tag and union both sides on a shared timeline, then a
    single ``last(..., ignorenulls=True)`` window per key ordered by time.
    One shuffle on ``by``; no join-explosion on dense right sides — the
    formulation that scales to 100 TB event tables (a range join would
    produce |left|×|right-in-window| intermediates).

    Re-expresses the reference's rebound→shot attribution ordering
    (src/queries/game.py:506-513) minus the claim-once step (see
    ``pipeline.actions`` for the greedy claim pass).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(direction)
    by = list(by)
    lcols = left.columns
    t_type = "double" if numeric else "timestamp"
    # Build the union timeline: left rows carry nulls for right payload.
    r_payload = [F.col(c).alias(f"_r_{c}") for c in right_cols]
    r = right.select(
        *by,
        F.col(right_ts).cast(t_type).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.col(right_ts).cast(t_type).alias("_rts"),
        *r_payload,
    )
    l = left.select(
        *lcols,
        F.col(left_ts).cast(t_type).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(t_type).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)

    if direction == "backward":
        # right rows sort before left rows at equal timestamps unless strict
        order = [F.col("_t").asc(), F.col("_is_left").asc() if not strict else F.col("_is_left").desc()]
        frame = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    else:
        order = [F.col("_t").desc(), F.col("_is_left").asc() if not strict else F.col("_is_left").desc()]
        frame = Window.partitionBy(*by).orderBy(*order).rowsBetween(Window.unboundedPreceding, Window.currentRow)

    filled = unioned.withColumn("asof_ts", F.last("_rts", ignorenulls=True).over(frame))
    for c in right_cols:
        filled = filled.withColumn(c, F.last(f"_r_{c}", ignorenulls=True).over(frame))

    out = filled.filter(F.col("_is_left") == 1)
    if tolerance_seconds is not None:
        delta = (
            (F.col("_t").cast("double") - F.col("asof_ts").cast("double"))
            if direction == "backward"
            else (F.col("asof_ts").cast("double") - F.col("_t").cast("double"))
        )
        within = F.col("asof_ts").isNotNull() & (delta <= tolerance_seconds)
        if how == "inner":
            out = out.filter(within)
        else:
            for c in ["asof_ts", *right_cols]:
                out = out.withColumn(c, F.when(within, F.col(c)))
    elif how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out.select(*lcols, "asof_ts", *right_cols)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: Sequence[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: float,
    closed: str = "left",
) -> DataFrame:
    """Interval×interval OVERLAP join — each left interval paired with
    every right interval it overlaps under the same equi keys.

    ``closed='left'``: half-open intervals, overlap iff
    ``l_start < r_end AND r_start < l_end``; ``'both'``: closed
    intervals with ``<=``.

    Scale shape: a raw overlap predicate is a theta join (cartesian per
    key group).  Instead each interval explodes to the integer time bins
    it touches (``bin_width`` units wide), the join is EQUI on
    (keys, bin), and the true overlap predicate is a residual.  Each
    overlapping pair shares ≥1 bin; it is emitted EXACTLY once — only in
    the bin where the later of the two intervals starts — so no distinct
    pass is needed.  Cost is linear in Σ(interval_len / bin_width):
    pick ``bin_width`` near the median interval length.

    Column-name collisions must be resolved by the caller (alias before
    calling), same contract as :func:`interval_join`.
    """
    if closed not in ("left", "both"):
        raise ValueError(closed)
    w = float(bin_width)

    def binned(df, start, end):
        first = F.floor(F.col(start) / w)
        last = (
            F.ceil(F.col(end) / w) - 1 if closed == "left" else F.floor(F.col(end) / w)
        )
        # degenerate [s, s) intervals touch no bin (sequence guard)
        return df.withColumn(
            "__bin__",
            F.explode(F.sequence(first, F.greatest(first, last))),
        ).withColumn("__first__", first)

    l = binned(left, left_start, left_end).withColumnRenamed("__first__", "__lf__")
    r = binned(right, right_start, right_end).withColumnRenamed("__first__", "__rf__")
    joined = l.join(r, [*equi_keys, "__bin__"])
    ls, le = F.col(left_start), F.col(left_end)
    rs, re_ = F.col(right_start), F.col(right_end)
    overlap = (
        (ls < re_) & (rs < le) if closed == "left" else (ls <= re_) & (rs <= le)
    )
    # emit-once: only the bin where the LATER interval starts
    once = F.col("__bin__") == F.greatest(F.col("__lf__"), F.col("__rf__"))
    return joined.filter(overlap & once).drop("__bin__", "__lf__", "__rf__")
