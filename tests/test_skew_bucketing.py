"""Skew salting correctness + bucketed-join plan tests (the physical-
layout guarantees the engine relies on at cluster scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.skew import salted_join, write_bucketed


def test_salted_join_matches_plain_join(spark):
    # skewed: 1000 rows of one hot key + a tail
    skewed = spark.createDataFrame(
        [(1, i) for i in range(1000)] + [(k, 0) for k in range(2, 20)],
        "k long, payload long",
    )
    dim = spark.createDataFrame([(k, f"v{k}") for k in range(1, 20)], "k long, val string")
    plain = skewed.join(dim, ["k"]).groupBy("k").count()
    salted = salted_join(skewed, dim, ["k"], n_salts=8).groupBy("k").count()
    assert {(r.k, r["count"]) for r in plain.collect()} == {
        (r.k, r["count"]) for r in salted.collect()
    }


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    a = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a_val")
    )
    b = spark.range(0, 10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b_val")
    )
    write_bucketed(a, "bk_a", ["k"], n_buckets=8, sort_cols=["k"])
    write_bucketed(b, "bk_b", ["k"], n_buckets=8, sort_cols=["k"])
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS bk_a")
        spark.sql("DROP TABLE IF EXISTS bk_b")


def test_aqe_skew_join_splits_hot_partition(spark):
    """Plan-level evidence (VERDICT r2 #8): a deliberately skewed join
    key must engage AQE's skew-join splitting — the FINAL adaptive plan
    shows SortMergeJoin(skew=true) over a skewed AQEShuffleRead — not
    merely produce correct results.  Mirrors the conf set session.tune
    applies at scale; thresholds are lowered here so local[*] data sizes
    qualify as skewed."""
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "128KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # key 0 carries 400k incompressible rows; 199 tail keys are tiny.
        fact = spark.range(0, 400000).select(
            F.lit(0).alias("k"), (F.xxhash64("id") % 1000000).alias("payload")
        ).unionAll(
            spark.range(0, 20000).select(
                (F.col("id") % 199 + 1).alias("k"),
                (F.xxhash64("id", "id") % 1000000).alias("payload"),
            )
        )
        dim = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") * 7).alias("val")
        )
        # Aggregate over BOTH sides' payloads so pruning can't shrink the
        # hot partition below the skew threshold.
        agg = fact.join(dim, "k").groupBy().agg(
            F.sum("payload").alias("sp"), F.sum("val").alias("sv")
        )
        [row] = agg.collect()
        assert row.sp is not None
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_plan_partitions_on_salt(spark):
    """The explicit-salt fallback really changes the physical join keys:
    the exchange partitions on (k, __salt__), so the hot key's rows
    spread across n_salts partitions."""
    skewed = spark.createDataFrame(
        [(1, i) for i in range(2000)] + [(k, 0) for k in range(2, 10)],
        "k long, payload long",
    )
    dim = spark.createDataFrame([(k, f"v{k}") for k in range(1, 10)], "k long, val string")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(skewed, dim, ["k"], n_salts=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__salt__" in plan
        assert "hashpartitioning(k" in plan and "__salt__" in plan.split(
            "hashpartitioning", 2
        )[1]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
