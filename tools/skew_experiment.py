"""Skew-join experiment: AQE skew-splitting and explicit salting vs a
naive shuffled join on a pathologically skewed key.

Synthetic: 4M-row fact where one key holds half the rows; 1k-row dim.
Run: python tools/skew_experiment.py  (prints one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.skew import salted_join
from mbai_gdb_spark.session import get_spark


def build(spark, n_rows=4_000_000):
    # key 0 for half the rows, uniform tail elsewhere
    fact = spark.range(n_rows).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise((F.col("id") % 1000) + 1)
        .alias("k"),
        (F.col("id") * 7 % 1000).alias("payload"),
    )
    dim = spark.range(0, 1001).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("dim_val")
    )
    return fact, dim


def run(spark, fact, dim, mode: str) -> float:
    if mode == "aqe_off":
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    else:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
    t0 = time.perf_counter()
    if mode == "salted":
        out = salted_join(fact, dim, ["k"], n_salts=16)
    else:
        out = fact.join(dim, "k")
    out.groupBy().agg(F.sum("payload"), F.sum("dim_val")).collect()
    dt = time.perf_counter() - t0
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return round(dt, 2)


def main():
    spark = get_spark("skew-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    fact, dim = build(spark)
    fact = fact.persist()
    fact.count()
    results = {
        "naive_shuffle_aqe_off": run(spark, fact, dim, "aqe_off"),
        "aqe_skew_join": run(spark, fact, dim, "aqe"),
        "salted_join_16": run(spark, fact, dim, "salted"),
    }
    print(json.dumps({"experiment": "skew_join_4M_half_hot", **results}))


if __name__ == "__main__":
    main()
