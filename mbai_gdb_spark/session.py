"""SparkSession construction with scale-oriented defaults.

The engine targets large multi-executor clusters; locally we run
``local[N]``.  Everything here is expressed as ordinary Spark conf so the
same code works unchanged on a 1000-executor cluster — only
``spark.master`` and the shuffle-partition count change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we also (re-)apply to sessions handed to us by a
# driver, because correctness depends on them (timezone) or plan quality
# does (AQE).  All are documented Spark runtime confs.
_RUNTIME_CONF = {
    # Timestamps in the fixture parquet are timezone-naive; interpret them
    # as UTC wall-time everywhere so date/epoch functions agree with the
    # DuckDB oracle regardless of machine timezone.
    "spark.sql.session.timeZone": "UTC",
    # Adaptive execution: runtime re-plan, partition coalescing, skew-join
    # splitting.  Essential at 100 TB where static stats are wrong.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas-UDF exchange (the slow path we keep narrow).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (e.g. the driver's)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Non-settable in this deployment — keep going; defaults are
            # only *tuning* except timeZone, which is always settable.
            pass
    _register_checkpoint_dir(spark)
    return spark


def _register_checkpoint_dir(spark: SparkSession) -> None:
    """Honour ``$SPARK_GRAFT_CHECKPOINT_DIR``: registering a reliable
    checkpoint dir flips every iterative operator's lineage truncation
    from executor-local ``localCheckpoint`` to fault-tolerant
    ``checkpoint`` (see ops.lineage.truncate) — the durability switch
    for cluster runs where an executor loss must not kill an hour-long
    iterative job.  Never overrides a dir the deployment already set."""
    path = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if not path:
        return
    try:
        if spark.sparkContext.getCheckpointDir() is None:
            spark.sparkContext.setCheckpointDir(path)
    except Exception:
        pass  # no SparkContext handle (connect mode) — local-only anyway


def get_spark(
    app_name: str = "mbai-gdb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or get) a tuned SparkSession.

    ``shuffle_partitions`` defaults to the local core count — correct for
    local testing; on a real cluster set it near 2-3× total cores (or rely
    on AQE coalescing from a higher initial number).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    nshuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    def _build(with_delta: bool):
        # Builder.config MUTATES the shared builder object, so each
        # attempt constructs its own from scratch — the no-Delta
        # fallback must not inherit the extension confs.
        b = (
            SparkSession.builder.appName(app_name)
            .master(master)
            .config("spark.sql.shuffle.partitions", str(nshuffle))
            .config(
                "spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
            )
            .config("spark.ui.enabled", "false")
        )
        if os.environ.get("SPARK_GRAFT_WAREHOUSE"):
            b = b.config(
                "spark.sql.warehouse.dir", os.environ["SPARK_GRAFT_WAREHOUSE"]
            )
        for k, v in _RUNTIME_CONF.items():
            b = b.config(k, v)
        if with_delta:
            from delta import configure_spark_with_delta_pip

            b = b.config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            ).config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
            b = configure_spark_with_delta_pip(b)
        return b

    if _delta_available():
        try:
            return _build(with_delta=True).getOrCreate()
        except Exception:
            # Extension/jar wiring can only fail INSIDE getOrCreate
            # (e.g. Ivy resolving delta jars on an air-gapped machine
            # with delta-spark pip-installed).  Delta is an optional
            # backend, not a dependency — fall back to a plain session
            # rather than break every entry point until someone
            # discovers SPARK_GRAFT_DELTA=off.
            pass
    return _build(with_delta=False).getOrCreate()


def _delta_available() -> bool:
    """Whether to wire the Delta Lake SQL extension + catalog into new
    sessions: delta-spark importable and ``$SPARK_GRAFT_DELTA`` not
    'off'.  This is what lets the parameterized Delta test legs un-skip
    with nothing more than ``pip install delta-spark`` — session
    extensions are STATIC confs, so they must land at build time,
    before the session exists."""
    if os.environ.get("SPARK_GRAFT_DELTA", "auto") == "off":
        return False
    import importlib.util

    return importlib.util.find_spec("delta") is not None
