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
