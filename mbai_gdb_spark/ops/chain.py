"""NEXT-chain sequence operators.

The reference builds every "linked list" the same way: ORDER BY →
``collect()`` → ``UNWIND range(0, size-2)`` → pair ``list[i], list[i+1]``
→ ``MERGE :NEXT`` (reference: src/queries/season.py:18-27 per-team game
chain; src/queries/game.py:42-50 period chain; 127-129 stint chain;
744-769 action chain; 732-740 score chain).  Materializing ordered lists
does not scale; in Spark the whole idiom is one ``lead()`` window — a
single shuffle on the partition key, no driver-side state, no array
materialization.  At 100 TB the partition key (team / game / entity id)
keeps window state bounded per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chain_next(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    next_cols: dict[str, str] | None = None,
    keep_last: bool = False,
) -> DataFrame:
    """Attach the next row's columns within each partition.

    next_cols maps ``source column -> output alias``; default links the
    first order_by column as ``next_<col>``.  Rows with no successor are
    dropped unless ``keep_last`` (edges vs. annotated nodes).

    Equivalent of the reference's collect+UNWIND pairwise-NEXT idiom.
    """
    if next_cols is None:
        first = order_by[0] if isinstance(order_by[0], str) else None
        if first is None:
            raise ValueError("next_cols required when order_by[0] is an expression")
        next_cols = {first: f"next_{first}"}
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    out = df
    for src, alias in next_cols.items():
        out = out.withColumn(alias, F.lead(src).over(w))
    if not keep_last:
        first_alias = next(iter(next_cols.values()))
        out = out.filter(F.col(first_alias).isNotNull())
    return out


def with_priority(
    df: DataFrame, source_col: str, mapping: dict[str, int], default: int, alias: str = "priority"
) -> DataFrame:
    """CASE-ladder priority used for tie-breaking a global ordering.

    Re-expresses the reference's action-ordering priority CASE
    (src/queries/game.py:749-759: JumpBall=1 … TimeOut=9) as a
    ``when()`` chain — pure column algebra, codegen-friendly.
    """
    expr: Column = F.lit(default)
    col = F.col(source_col)
    items = list(mapping.items())
    expr = F.when(col == F.lit(items[0][0]), F.lit(items[0][1]))
    for value, prio in items[1:]:
        expr = expr.when(col == F.lit(value), F.lit(prio))
    expr = expr.otherwise(F.lit(default))
    return df.withColumn(alias, expr)
