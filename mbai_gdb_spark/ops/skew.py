"""Skew- and shuffle-management helpers for cluster-scale joins.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime; these helpers cover the two cases it can't:

- ``salted_join``: explicit key salting for joins where ONE side has a
  pathological hot key (e.g. a null-like sentinel or a celebrity
  entity).  The hot side gets a random salt in [0, n); the other side is
  replicated n× with every salt value — turning one hot partition into n
  even ones at the cost of replicating only the small side's hot rows.
- ``write_bucketed`` / co-located reads: pre-shuffling fact tables into
  the same bucket layout so repeated equi-joins/aggregations on the
  bucket key run with NO exchange at read time — the batch equivalent of
  the reference's per-entity id indexes (src/queries/setup.py:20-33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted and the other side
    replicated across all salt values.  Semantics identical to
    ``skewed.join(other, on, how)`` for the supported ``how`` values;
    physical keys are (on..., salt).

    Only inner/left/left_semi/left_anti are supported: the non-skewed
    side is exploded n_salts times, so right/full flavors would emit
    each unmatched ``other`` row once per salt (and right_semi/anti are
    wrong the same way) — use AQE skew handling for those.

    Deterministic salting (hash of a unique expression would also work):
    monotonically spread via spark_partition_id + row-local randomness is
    NOT reproducible, so we hash the full row of the skewed side — stable
    across retries, which matters for task re-execution at scale."""
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "replicating the non-skewed side would duplicate its unmatched rows"
        )
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in skewed.columns])) % n_salts).alias(
        "__salt__"
    )
    s = skewed.withColumn("__salt__", salt)
    o = other.withColumn(
        "__salt__", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return s.join(o, [*on, "__salt__"], how).drop("__salt__")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations keyed on ``bucket_cols`` between tables with identical
    bucketing read with zero exchange (and zero sort when sorted)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
