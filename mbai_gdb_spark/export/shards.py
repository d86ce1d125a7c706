"""Training-shard export sink: the materialized form of
ops.sampling.deterministic_shuffle.

A training job wants the corpus as S independent files in a
pseudo-random, re-derivable order: data loaders stream shard files in
parallel, resume mid-epoch by (shard, pos), and re-runs of the export
produce byte-identical shards.  This sink writes exactly that layout:

    <path>/shard=<s>/part-*.parquet    rows in ``pos`` order

plus a manifest (one row per shard) with row counts, pos bounds and an
order-sensitive integrity checksum, so a consumer can verify a shard
without re-reading the corpus.

Scale shape: one map-only hash projection, one shuffle on shard, a
per-shard sort (each shard sorts its own N/S rows — no global sort),
and a hive-partitioned write whose directories are the shards.  The
manifest is a second pass over the already-sharded output's columns
(count + min/max + checksum per shard, map-side partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.sampling import deterministic_shuffle

MERSENNE31 = 2_147_483_647


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 32,
    seed: int = 0,
) -> DataFrame:
    """Shard + order + write ``df``; returns the manifest DataFrame
    (shard, n_rows, min_pos, max_pos, checksum) after writing it to
    ``<path>/_manifest``.

    The checksum is an order-SENSITIVE fold surrogate that any engine
    can recompute from the shard file: sum((pos+1) * (key % p)) % p —
    a row out of place changes it, unlike a plain sum.
    """
    sharded = deterministic_shuffle(df, key_col, n_shards, seed=seed)
    (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    written = df.sparkSession.read.parquet(path)
    manifest = written.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"),
        (
            F.sum(
                (F.col("pos") + 1) * (F.col(key_col).cast("long") % MERSENNE31)
            )
            % MERSENNE31
        ).alias("checksum"),
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(path + "/_manifest")
    return manifest


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard in training order (partition-pruned read + pos sort)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .sortWithinPartitions("pos")
    )
