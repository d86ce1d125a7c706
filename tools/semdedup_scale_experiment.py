"""SemDeDup-path throughput probe beyond the fixtures.

Synthetic: N 64-dim vectors built JVM-side (no driver transfer).  Each
vector is a deterministic per-cluster base pattern (cluster = id % C)
plus small per-id noise, so nearest-centroid assignment has real
structure.  Centroid count C is the SemDeDup scale dial: cluster size
N/C bounds the quadratic within-cluster comparison, so candidate
volume is Σ|cluster|² ≈ N·(N/C); holding N/C constant (here ~64) keeps
the pair stage LINEAR in N while C grows with N — the documented
100 TB posture.  Assignment uses the BLAS matmul path
(ivf_assign_vectorized), since C here is far beyond the HOF regime.

Run: python tools/semdedup_scale_experiment.py [n_vecs ...]
(one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.similarity import semantic_dedup
from mbai_gdb_spark.session import get_spark

M31 = 2_147_483_647


def synth(spark, n: int, c: int):
    """N 64-dim vectors: base(cluster, j) + 0.1 * noise(id, j)."""
    base = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda j: (
            ((F.col("cl") * 2654435761 + j * 97) % M31).cast("double")
            / F.lit(float(1 << 30))
            - 1.0
        )
        + 0.1
        * (
            ((F.col("id") * 1000003 + j * 7919) % M31).cast("double")
            / F.lit(float(1 << 30))
            - 1.0
        ),
    )
    return (
        spark.range(n)
        .withColumn("cl", F.col("id") % c)
        .select(
            F.col("id").alias("vec_id"),
            base.cast("array<float>").alias("embedding"),
        )
    )


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 80_000, 320_000]
    spark = get_spark("semdedup-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sizes:
        c = max(32, n // 64)  # hold cluster size ~64
        corpus = synth(spark, n, c).localCheckpoint(eager=True)
        stride = max(1, n // c)
        centroids = corpus.filter(F.col("vec_id") % stride == 0)
        t0 = time.perf_counter()
        out = semantic_dedup(
            corpus, centroids, threshold=0.95, vectorized_assign=True
        )
        n_dups = out.count()
        dt = time.perf_counter() - t0
        rows.append(
            {
                "n_vecs": n,
                "n_centroids": c,
                "n_dups": n_dups,
                "sec": round(dt, 2),
                "vecs_per_sec": round(n / dt),
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    print(json.dumps({"metric": "semdedup_scale", "points": rows}))


if __name__ == "__main__":
    main()
