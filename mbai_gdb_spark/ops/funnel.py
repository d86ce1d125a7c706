"""Ordered-funnel analysis: how far does each user get through a
required event sequence (view → click → purchase), where each step must
STRICTLY follow the previous step's first completion.

The greedy first-completion semantics decompose into per-step grouped
minima: step 0's time is the user's first step-0 event; step k's time is
the user's first step-k event strictly after step k-1's time.  Each
stage is one conditional-min aggregation on the user key — the joins all
share that key's partitioning (one logical shuffle, reused), no window
over the full event sequence and no per-user state.  Strict `>`
ordering makes the result independent of how same-timestamp events
interleave."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_first_completion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per user: the first-completion time of every funnel step and the
    number of steps completed.  Output columns: (user, step_0_ts ..
    step_{n-1}_ts aliased ``first_<step>_ts``, steps_completed); users
    with no step-0 event appear with all-NULL times and 0 steps."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    ev = events.select(user_col, ts_col, type_col).filter(
        F.col(type_col).isin(list(steps))
    )
    out = events.select(user_col).distinct()
    prev_ts_col: str | None = None
    for step in steps:
        step_events = ev.filter(F.col(type_col) == step)
        ts_alias = f"first_{step}_ts"
        if prev_ts_col is None:
            reached = step_events.groupBy(user_col).agg(
                F.min(ts_col).alias(ts_alias)
            )
        else:
            reached = (
                step_events.join(
                    out.select(user_col, prev_ts_col).filter(
                        F.col(prev_ts_col).isNotNull()
                    ),
                    user_col,
                )
                .filter(F.col(ts_col) > F.col(prev_ts_col))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(ts_alias))
            )
        out = out.join(reached, user_col, "left")
        prev_ts_col = ts_alias
    completed = sum(
        F.when(F.col(f"first_{s}_ts").isNotNull(), 1).otherwise(0) for s in steps
    )
    return out.withColumn("steps_completed", completed.cast("long"))
