"""Scale probe for ops.graph.triangle_count on skewed synthetic graphs.

Generates a Zipf-ish multigraph (hub vertices with ~1/x degree density —
the power-law shape that explodes naive adjacency self-joins), then times
the degree-ordered wedge enumeration at growing edge counts.  The claim
under test: after orientation the wedge fan-out per vertex is bounded by
sqrt(2m) whatever the hub degrees, so wall-clock grows near-linearly in
the wedge volume rather than quadratically in the hub degree.

Usage: python tools/triangle_scale_experiment.py [m_edges ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.graph import triangle_count
from mbai_gdb_spark.session import get_spark


def zipfish_edges(spark, m: int, n: int):
    """m edges over n vertices; endpoint density ~1/x (vertex 1 is the
    hottest hub).  Deterministic LCG hashing — reruns are identical."""
    def endpoint(mult: int, add: int):
        u = ((F.col("id") * mult + add) % 2_147_483_647) / 2_147_483_647.0
        return F.pow(F.lit(float(n)), u).cast("long")

    return spark.range(m).select(
        endpoint(48271, 11).alias("src"), endpoint(16807, 7).alias("dst")
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [500_000, 2_000_000, 8_000_000]
    n = 100_000
    spark = get_spark("triangle-scale")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"vertices={n}")
    prev = None
    for m in sizes:
        edges = zipfish_edges(spark, m, n)
        hub_deg = (
            edges.select(F.col("src").alias("v"))
            .unionAll(edges.select(F.col("dst").alias("v")))
            .groupBy("v").count().agg(F.max("count")).first()[0]
        )
        t0 = time.perf_counter()
        out = triangle_count(edges)
        n_vertices_in_tri = out.count()
        total_tri = out.agg((F.sum("n_triangles") / 3).cast("long")).first()[0]
        dt = time.perf_counter() - t0
        ratio = f"  wall x{dt / prev:.2f} for x4 edges" if prev else ""
        print(
            f"m={m:>9,}  max_degree={hub_deg:>9,}  triangles={total_tri:>12,}  "
            f"vertices_in_tri={n_vertices_in_tri:>7,}  sec={dt:7.2f}{ratio}"
        )
        prev = dt


if __name__ == "__main__":
    main()
