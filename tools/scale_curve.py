"""Scale-curve probe: run representative queries across sf0.001 → sf0.01
→ sf0.1 → a synthetic 10× sf0.1 (~6M-row lineitem) and print rows/sec
per scale.  The point is the SHAPE of the curve: per-query wall time
must grow far slower than data volume (fixed stage/scheduling overhead
amortizing), and throughput must RISE with scale — the local[32]
miniature of holding flat on a 1000-executor cluster.

The 10× tier unions sf0.1 with key-shifted copies (same distributions,
disjoint keys) — synthetic INPUT ONLY for this probe; declared queries
always run on the driver's fixtures.

Usage: python tools/scale_curve.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "a1_pricing_summary",
    "j1_region_revenue",
    "q18_large_orders",
    "w5_sessionize_events",
    "w8_running_total_reset",
]


def main() -> None:
    from pyspark.sql import functions as F

    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.queries import QUERIES
    from mbai_gdb_spark.session import get_spark

    spark = get_spark("scale_curve")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, dict] = {}
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        sf = sf_dir.rsplit("sf", 1)[1]
        rows = read_table(spark, sf_dir, "lineitem").count()
        tier = {"lineitem_rows": rows, "queries": {}}
        for name in PROBES:
            fn = QUERIES[name]
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            tier["queries"][name] = round(time.perf_counter() - t0, 3)
        results[f"sf{sf}"] = tier

    # Synthetic 10x tier: key-shifted unions of sf0.1 (disjoint orderkeys
    # and event ids; identical value distributions).
    base = "/root/testdata/sf0.1"
    tenx = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/spark_graft_sf1")
    if not os.path.exists(tenx):
        os.makedirs(tenx, exist_ok=True)
        li = read_table(spark, base, "lineitem")
        ev = read_table(spark, base, "events")
        o = read_table(spark, base, "orders")
        # ONE shared orderkey shift so the lineitem↔orders join stays
        # intact in every copy (join-bearing queries then really process
        # 10× on both fact sides).
        shift_ok = (
            max(
                li.agg(F.max("l_orderkey")).collect()[0][0],
                o.agg(F.max("o_orderkey")).collect()[0][0],
            )
            + 1
        )
        shift_ev_id = ev.agg(F.max("event_id")).collect()[0][0] + 1
        shift_ev_user = ev.agg(F.max("user_id")).collect()[0][0] + 1
        li10, ev10, o10 = li, ev, o
        for i in range(1, 10):
            li10 = li10.unionByName(
                li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * shift_ok))
            )
            o10 = o10.unionByName(
                o.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * shift_ok))
            )
            ev10 = ev10.unionByName(
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * shift_ev_id))
                .withColumn("user_id", F.col("user_id") + F.lit(i * shift_ev_user))
            )
        li10.repartition(32).write.parquet(tenx + "/lineitem.parquet")
        ev10.repartition(32).write.parquet(tenx + "/events.parquet")
        o10.repartition(32).write.parquet(tenx + "/orders.parquet")
        for t in ("region", "nation", "customer", "supplier", "part"):
            read_table(spark, base, t).write.mode("overwrite").parquet(
                f"{tenx}/{t}.parquet"
            )

    rows = read_table(spark, tenx, "lineitem").count()
    tier = {"lineitem_rows": rows, "queries": {}}
    for name in PROBES:
        fn = QUERIES[name]
        fn(spark, tenx).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        fn(spark, tenx).write.format("noop").mode("overwrite").save()
        tier["queries"][name] = round(time.perf_counter() - t0, 3)
    results["sf1_synth"] = tier

    # throughput curve: Mrows/s on the biggest fact per tier
    for tier_name, tier in results.items():
        total = sum(tier["queries"].values())
        tier["total_s"] = round(total, 3)
        tier["mrows_per_s_per_query_avg"] = round(
            tier["lineitem_rows"] * len(tier["queries"]) / total / 1e6, 3
        )
    out = json.dumps(results, indent=2)
    print(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
