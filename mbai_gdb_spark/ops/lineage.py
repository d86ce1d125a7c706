"""Lineage truncation for iterative DataFrame loops.

Every iterative operator in the engine (PageRank / connected components
/ BFS / k-core peeling in :mod:`ops.graph`, Lloyd iterations in
:mod:`ops.kmeans`, the LSH cluster walk in :mod:`ops.dedup`, the rollup
merge in :mod:`io`) must cut its logical plan every few rounds or the
plan grows without bound and Catalyst analysis time dominates.

Two mechanisms exist in Spark:

* ``DataFrame.localCheckpoint`` — blocks live on executor local disk /
  memory.  Fast (no DFS round-trip) but NOT fault-tolerant: lose an
  executor and every job that reads the checkpoint fails.  The right
  default on ``local[N]`` where executor == driver == one process.
* ``DataFrame.checkpoint`` — blocks written to the directory registered
  via ``SparkContext.setCheckpointDir`` (HDFS/S3/... on a cluster).
  Survives executor loss; the right choice for 1000-executor runs where
  an hour-long peel must not restart because one node was preempted.

:func:`truncate` picks automatically: if a reliable checkpoint dir is
registered on the context, it uses ``checkpoint``; otherwise
``localCheckpoint``.  Operators call ``truncate(df)`` and stay agnostic;
deployments opt in EITHER by calling
``spark.sparkContext.setCheckpointDir(path)`` themselves OR by setting
``$SPARK_GRAFT_CHECKPOINT_DIR`` (honoured by ``session.tune`` /
``session.get_spark``).  Results are bit-identical either way — the
mechanism changes durability, never values (pinned by
``tests/test_graph.py::test_kcore_reliable_checkpoint_matches_local``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def reliable_dir(spark: SparkSession) -> str | None:
    """The registered reliable checkpoint dir, or None."""
    try:
        return spark.sparkContext.getCheckpointDir()
    except Exception:
        # Connect-mode sessions have no SparkContext handle; they also
        # cannot localCheckpoint, so callers never reach here in paths
        # that matter.
        return None


def set_reliable_checkpoint_dir(spark: SparkSession, path: str) -> None:
    """Opt every subsequent :func:`truncate` into reliable checkpoints."""
    spark.sparkContext.setCheckpointDir(path)


def truncate(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut ``df``'s lineage: reliable ``checkpoint`` when a checkpoint
    dir is registered, executor-local ``localCheckpoint`` otherwise.

    Postfix-friendly via ``DataFrame.transform``:
    ``df.groupBy(...).agg(...).transform(truncate)``.
    """
    if reliable_dir(df.sparkSession) is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def truncate_lazy(df: DataFrame) -> DataFrame:
    """:func:`truncate` with ``eager=False`` (materialize on first use),
    for ``.transform`` chaining."""
    return truncate(df, eager=False)
