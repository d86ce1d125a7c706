"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001 (smoke check).
``queries()`` — every implemented operator from SURVEY.md §2 plus the
training-data-pipeline extensions, as (spark, sf_dir) -> DataFrame.
``oracle_sql()`` — matching DuckDB SQL per query for the t2 gate.

Implementation lives in ``mbai_gdb_spark``; this module is a thin facade.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import mbai_gdb_spark.queries_nba  # noqa: F401  (registers NBA-domain parity queries)
import mbai_gdb_spark.queries_north  # noqa: F401  (registers north-star queries)
from mbai_gdb_spark.queries import ORACLES, QUERIES

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: sessionized purchase attribution over the events stream —
    gaps-and-islands sessionization, point-in-interval join, and windowed
    aggregation in one pipeline (SURVEY.md §7.2's signature operators)."""
    return QUERIES["flagship_session_attribution"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
