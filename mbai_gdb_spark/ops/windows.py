"""Running totals, top-1-per-key, and related window recipes.

Re-expresses the reference's 80-line ``reduce()`` score accumulator
(W8, src/queries/game.py:628-707 — cumulative home/away score with a
per-period running subtotal) and its ORDER BY DESC + head(collect())
top-1 pick (W10, src/queries/game.py:604-616) as window functions.
Each is one shuffle on the partition key; state per key is bounded, so
the recipes hold at 100 TB given a sane key (game_id, user_id, ...).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def running_sum(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value: str | Column,
    alias: str = "running_total",
    reset_by: Sequence[str] | None = None,
) -> DataFrame:
    """Cumulative sum per partition; ``reset_by`` adds finer partition
    columns whose change resets the accumulator (the reference's
    period-subtotal reset, src/queries/game.py:676-699)."""
    value = F.col(value) if isinstance(value, str) else value
    keys = list(partition_by) + list(reset_by or [])
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(value).over(w))


def top1_per_key(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Deterministic top-1 per key via row_number; order_by must be a
    total order (include a unique id as final tie-break)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def topk_per_key(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_alias: str = "rank",
) -> DataFrame:
    """Top-k per key. For small k Spark plans a per-partition
    WindowGroupLimit (pushed-down top-k) before the final sort."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_alias, F.row_number().over(w)).filter(
        F.col(rank_alias) <= k
    )
