"""ANN-path throughput probe at corpus sizes well beyond the fixtures.

Synthetic: N 64-dim vectors built JVM-side (no driver transfer); every
50th vector is a light perturbation of vector (id-37) — the planted
near-neighbor pool — and the rest are quasi-random, so LSH buckets stay
small (the realistic regime: candidates ~linear, not clustered-quadratic).

Probes measured separately:
- near-dup candidate generation: multi-table hyperplane LSH →
  bucket equi-join → exact cosine re-rank (`lsh_candidate_neighbors`,
  min_cosine 0.9) — the embedding-dedup scale path.  Plane count is
  the dial that must grow with log2(N): k planes make 2^k buckets, so
  random collisions (and therefore re-rank work) scale N²/2^k — the
  fixture queries use k=8 for 6k vectors; here k=16 keeps expected
  bucket occupancy ~1 at 10^5..10^6 vectors;
- top-k search: IVF stride centroids, n_probe=2, exact re-rank
  (`ivf_topk`) for a 100-query batch — the ANN-serving scale path.
  ``n_centroids`` (argv[2], default 64) is the OTHER scale dial: probe
  lists hold N/nlist vectors, so a fixed nlist degrades query cost
  linearly in N; growing nlist ~ sqrt(N) keeps per-query re-rank work
  ~ n_probe*sqrt(N) at an assignment cost of N*nlist broadcast dots
  (amortized across query batches via `ivf_persist` in production).

Run: python tools/ann_scale_experiment.py [n_vecs] [n_centroids]
(one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.similarity import (
    cosine_topk_vectorized,
    ivf_topk,
    lsh_candidate_neighbors,
)
from mbai_gdb_spark.session import get_spark

DIM = 64


def build(spark, n_vecs: int):
    base = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 50 == 0, F.col("id") - 37)
        .otherwise(F.col("id"))
        .alias("seed"),
        (F.col("id") % 50 == 0).alias("is_perturbed"),
    )
    # xxhash64(seed, d): properly uncorrelated components.  Affine LCG
    # generators leave modular structure (constant-shift vector pairs,
    # seed-cycle duplicates) that plants spurious high-cosine pairs and
    # makes the probe measure the wrong corpus.
    comp = lambda d: (  # noqa: E731
        (F.abs(F.xxhash64(F.col("seed"), F.lit(d))) % 100003) / 100003.0
        - 0.5
        + F.when(
            F.col("is_perturbed"), ((F.col("vec_id") * 31 + d) % 7) * 0.001
        ).otherwise(F.lit(0.0))
    )
    vec = F.array(*[comp(d).cast("float") for d in range(DIM)])
    return base.select("vec_id", vec.alias("embedding"))


def main() -> None:
    n_vecs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark()
    corpus = build(spark, n_vecs).persist()
    corpus.count()  # materialize input out of the timed region

    # k ~ log2(N): keeps expected bucket occupancy (and so the random-
    # collision pair count N²/2^k) roughly constant as the corpus grows.
    n_planes = max(16, n_vecs.bit_length())
    t0 = time.perf_counter()
    pairs = lsh_candidate_neighbors(
        corpus, n_planes=n_planes, n_tables=8, min_cosine=0.9
    ).persist()
    n_pairs = pairs.count()
    lsh_wall = time.perf_counter() - t0
    # Planted pairs are (id-37, id) for id % 50 == 0, id >= 50.
    n_found_planted = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 37) & (F.col("id_b") % 50 == 0)
    ).count()
    n_planted = (n_vecs - 1) // 50  # ids 50, 100, ... < n_vecs

    queries = corpus.filter(F.col("vec_id") < 100)

    # Exact brute-force baseline (vectorized matmul path — the HOF pair
    # expansion is the oracle variant, not the bulk one): ground truth
    # cost the IVF recall/cost dial is traded against.
    t0 = time.perf_counter()
    n_brute = cosine_topk_vectorized(corpus, queries, k=5).count()
    brute_wall = time.perf_counter() - t0

    t0 = time.perf_counter()
    topk = ivf_topk(
        corpus,
        queries,
        k=5,
        n_probe=2,
        centroid_stride=max(1, n_vecs // n_centroids),
        # HOF assignment is bit-stable but scalar; past nlist≈64 the
        # N×nlist dot products need the Arrow/numpy matmul path.
        vectorized_assign=n_centroids > 64,
    )
    n_results = topk.count()
    ivf_wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "experiment": "ann_scale",
                "n_vecs": n_vecs,
                "dim": DIM,
                "n_planes": n_planes,
                "lsh_neardup_wall_sec": round(lsh_wall, 2),
                "lsh_vecs_per_sec": round(n_vecs / lsh_wall),
                "n_neardup_pairs": n_pairs,
                "planted_recall": round(n_found_planted / max(1, n_planted), 3),
                "brute_force_wall_sec": round(brute_wall, 2),
                "brute_force_results": n_brute,
                "ivf_query_batch": 100,
                "ivf_n_centroids": n_centroids,
                "ivf_wall_sec": round(ivf_wall, 2),
                "ivf_queries_per_sec": round(100 / ivf_wall, 1),
                "n_topk_results": n_results,
            }
        )
    )


if __name__ == "__main__":
    main()
