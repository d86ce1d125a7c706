"""Table statistics + declarative data-quality checks.

``table_stats`` is the engine's ANALYZE TABLE: per-column row/null
counts, typed min/max, and distinct counts in as few passes as the
aggregate shapes allow — the stats that feed broadcast decisions, CBO
sizing, and partition-layout choices at 100 TB.  ``check_constraints``
is the dbt-test / Great-Expectations layer: a declarative rule list
(not-null, unique key, foreign-key containment, range, accepted
values) evaluated as plain aggregates and anti-joins, each reporting a
violation COUNT — bounded output no matter the table size.

Scale notes: every rule is one aggregate over the table (map-side
partials) or one broadcast/shuffle anti-join for FK rules; nothing
collects rows to the driver — a trillion-row table yields the same
handful of counter rows.  ``table_stats`` offers exact distincts for
oracle-checked runs and ``approx=True`` (HLL++ via
``approx_count_distinct``) for the 100 TB default, where exact
per-column distincts would be one shuffle per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_stats(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """One row per column: (col_name, n_rows, n_nonnull, n_distinct,
    min_repr, max_repr).  min/max are computed on the TYPED column and
    cast to string only for the uniform output schema."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n__")]
    ndv = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}__"),
            ndv(F.col(c)).alias(f"__nd_{c}__"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}__"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}__"),
        ]
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n__").alias("n_rows"),
                F.col(f"__nn_{c}__").alias("n_nonnull"),
                F.col(f"__nd_{c}__").cast("long").alias("n_distinct"),
                F.col(f"__mn_{c}__").alias("min_repr"),
                F.col(f"__mx_{c}__").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(per_col).alias("s")).select("s.*")


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate declarative constraints; one output row per rule:
    (rule_name, kind, n_violations) — a lazy UNION of single-row
    aggregates, so the caller's single action runs every check.

    Rule kinds (dict keys beyond ``name``/``kind``):

    - ``not_null``: {"col"} — rows where col IS NULL.
    - ``unique``: {"cols"} — rows beyond the first per key (sum of
      (count-1) over duplicated keys).
    - ``range``: {"col", "min"?, "max"?} — non-null rows outside the
      closed interval.
    - ``accepted``: {"col", "values"} — non-null rows whose value is
      not in the list.
    - ``foreign_key``: {"col", "ref", "ref_col"} — non-null rows whose
      key is absent from the reference frame (anti-join; broadcast
      when the ref side is dimension-sized).
    - ``k_anonymity``: {"cols", "k"} — rows whose quasi-identifier
      combination occurs fewer than ``k`` times (the re-identification
      audit a training-data release needs alongside PII scanning: a
      (zip, birth_year, gender) combo shared by 2 people is 2
      violations even with no direct identifier present).
    """
    out = None
    for rule in rules:
        name, kind = rule["name"], rule["kind"]
        if kind == "not_null":
            cnt = df.filter(F.col(rule["col"]).isNull()).agg(
                F.count(F.lit(1)).alias("__v__")
            )
        elif kind == "unique":
            keys = [F.col(c) for c in rule["cols"]]
            cnt = (
                df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__c__"))
                .filter(F.col("__c__") > 1)
                .agg(F.coalesce(F.sum(F.col("__c__") - 1), F.lit(0)).alias("__v__"))
            )
        elif kind == "range":
            c = F.col(rule["col"])
            cond = F.lit(False)
            if "min" in rule:
                cond = cond | (c < F.lit(rule["min"]))
            if "max" in rule:
                cond = cond | (c > F.lit(rule["max"]))
            cnt = df.filter(c.isNotNull() & cond).agg(
                F.count(F.lit(1)).alias("__v__")
            )
        elif kind == "accepted":
            c = F.col(rule["col"])
            cnt = df.filter(c.isNotNull() & ~c.isin(list(rule["values"]))).agg(
                F.count(F.lit(1)).alias("__v__")
            )
        elif kind == "foreign_key":
            ref = rule["ref"].select(
                F.col(rule["ref_col"]).alias(rule["col"])
            ).distinct()
            cnt = (
                df.filter(F.col(rule["col"]).isNotNull())
                .join(ref, rule["col"], "left_anti")
                .agg(F.count(F.lit(1)).alias("__v__"))
            )
        elif kind == "k_anonymity":
            keys = [F.col(c) for c in rule["cols"]]
            cnt = (
                df.groupBy(*keys)
                .agg(F.count(F.lit(1)).alias("__c__"))
                .filter(F.col("__c__") < int(rule["k"]))
                .agg(F.coalesce(F.sum("__c__"), F.lit(0)).alias("__v__"))
            )
        else:
            raise ValueError(f"unknown rule kind: {kind}")
        piece = cnt.select(
            F.lit(name).alias("rule_name"),
            F.lit(kind).alias("kind"),
            F.col("__v__").cast("long").alias("n_violations"),
        )
        out = piece if out is None else out.unionByName(piece)
    if out is None:
        raise ValueError("no rules given")
    return out
