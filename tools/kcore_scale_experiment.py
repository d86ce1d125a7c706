"""A/B scale probe for the delta-based k-core peel (round 7) vs the
legacy full-rewrite peel it replaced.

Two synthetic regimes, both deterministic (LCG hashing, no RNG):

1. ``clique-field`` — disjoint noisy cliques (the co-purchase shape):
   peel ROUNDS stay constant as the graph grows, so the per-round cost
   is what scales.  The legacy peel pays a full edge-frame anti-join +
   checkpoint per round; the delta peel pays one map-side broadcast
   join over an immutable adjacency plus a small vertex-table update.
2. ``deep-tail`` — the same clique field with a banded path (edge
   (i, j) iff 0 < j-i <= d) glued on: at k above the band's degrees
   the path cascades two vertices per round from the ends inward, so
   peel DEPTH is set by the tail length while the frame stays
   clique-field-sized.  This is the regime that motivated the
   rewrite: the legacy peel rewrites (and checkpoints) the whole
   large edge frame once per round, compounding with depth; the delta
   peel's per-round write is a small vertex table.

Both implementations produce the identical unique k-core (asserted).

Honest boundary (measured): on TINY frames (<100k edges) with deep
peels the legacy loop is faster — the delta round runs more Spark
jobs (count, broadcast build, two joins) and scheduler overhead
dominates when the frame checkpoint it avoids costs nothing.  The
crossover is where frame materialization becomes the per-round cost,
which is exactly the at-scale regime.

Usage:
    python tools/kcore_scale_experiment.py [n_cliques ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from mbai_gdb_spark.ops.graph import kcore
from mbai_gdb_spark.ops.lineage import truncate as _ckpt
from mbai_gdb_spark.session import get_spark


def legacy_kcore(edges: DataFrame, k: int, max_iter: int = 300) -> DataFrame:
    """The pre-r7 peel, kept here ONLY as the experiment baseline:
    re-aggregate degrees, anti-join peeled vertices out of the edge
    frame, checkpoint the rewritten frame — once per round."""
    u, v = F.col("src"), F.col("dst")
    e = (
        edges.select(F.least(u, v).alias("u"), F.greatest(u, v).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(_ckpt)
    )
    for _ in range(max_iter):
        deg = (
            e.select(F.col("u").alias("vid"))
            .unionAll(e.select(F.col("v").alias("vid")))
            .groupBy("vid")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        peeled = deg.filter(F.col("deg") < k).select("vid").transform(_ckpt)
        if peeled.isEmpty():
            break
        e = (
            e.join(peeled.withColumnRenamed("vid", "u"), "u", "left_anti")
            .join(peeled.withColumnRenamed("vid", "v"), "v", "left_anti")
            .transform(_ckpt)
        )
    return (
        e.select(F.col("u").alias("vertex"))
        .unionAll(e.select(F.col("v").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )


def clique_field(spark, n_cliques: int, size: int = 30, drop_mod: int = 7):
    """n_cliques disjoint cliques of ``size`` with every drop_mod-th
    edge removed (so the peel takes a few rounds, not one)."""
    base = spark.range(n_cliques).select(F.col("id").alias("c"))
    pairs = (
        base.select(
            "c",
            F.explode(F.sequence(F.lit(0), F.lit(size - 2))).alias("i"),
        )
        .select(
            "c",
            "i",
            F.explode(F.sequence(F.col("i") + 1, F.lit(size - 1))).alias("j"),
        )
        .filter((F.col("c") * 31 + F.col("i") * 7 + F.col("j")) % drop_mod != 0)
    )
    return pairs.select(
        (F.col("c") * size + F.col("i")).alias("src"),
        (F.col("c") * size + F.col("j")).alias("dst"),
    )


def deep_tail(spark, n_cliques: int, tail: int, size: int = 30, d: int = 4):
    """Clique field plus a disjoint banded path of ``tail`` vertices
    (edge (i, j) iff 0 < j - i <= d, ids offset past the cliques):
    peeling at k = 2d keeps the cliques (degree ~size-ish >> 2d) and
    cascades the band away ~d vertices per end per round — peel depth
    ~ tail / (2d) over a frame whose size is set by the clique field
    (interior band degree is exactly 2d, so only end-adjacent vertices
    fall below k each round)."""
    offset = n_cliques * size
    band = (
        spark.range(tail)
        .select(
            (F.col("id") + offset).alias("src"),
            F.explode(
                F.sequence(
                    F.col("id") + offset + 1,
                    F.least(F.col("id") + offset + d, F.lit(offset + tail - 1)),
                )
            ).alias("dst"),
        )
        # last band vertex: sequence(start > stop) runs DESCENDING and
        # would add a phantom edge to offset+tail — bound dst explicitly
        .filter(
            (F.col("src") < F.col("dst"))
            & (F.col("dst") <= offset + tail - 1)
        )
    )
    return clique_field(spark, n_cliques).unionByName(band)


def _run(fn, edges, k) -> tuple[float, dict]:
    """Time the SECOND run (steady state): the first pays one-off
    codegen/JVM warmup, which would bias whichever implementation
    happens to run first."""
    fn(edges, k).count()
    t0 = time.perf_counter()
    rows = {r.vertex: r.core_degree for r in fn(edges, k).collect()}
    return time.perf_counter() - t0, rows


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [800, 3200, 12800]
    spark = get_spark("kcore-scale")
    spark.sparkContext.setLogLevel("ERROR")

    print("== clique-field (constant rounds, growing frame) ==")
    for n in sizes:
        edges = clique_field(spark, n).localCheckpoint(eager=True)
        m = edges.count()
        t_new, r_new = _run(kcore, edges, 22)
        t_old, r_old = _run(legacy_kcore, edges, 22)
        assert r_new == r_old, "implementations diverged"
        print(
            f"  n_cliques={n:6d} edges={m:9,d} core_vertices={len(r_new):7,d} "
            f"delta={t_new:6.2f}s legacy={t_old:6.2f}s speedup={t_old / t_new:4.2f}x"
        )

    print("== deep-tail (large frame x deep peel: the compounding regime) ==")
    tail, d = 320, 4  # ~tail/(2d) = 40 cascade rounds
    for n in sizes:
        edges = deep_tail(spark, n, tail, d=d).localCheckpoint(eager=True)
        m = edges.count()
        t_new, r_new = _run(kcore, edges, 2 * d)
        t_old, r_old = _run(legacy_kcore, edges, 2 * d)
        assert r_new == r_old, "implementations diverged"
        print(
            f"  n_cliques={n:6d} edges={m:9,d} rounds~{tail // (2 * d)} "
            f"core_vertices={len(r_new):7,d} "
            f"delta={t_new:6.2f}s legacy={t_old:6.2f}s speedup={t_old / t_new:4.2f}x"
        )


if __name__ == "__main__":
    main()
