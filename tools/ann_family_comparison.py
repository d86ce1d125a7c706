"""Recall/latency comparison across the four ANN family members on the
shared embeddings fixture: brute-force (exact), hyperplane-LSH, IVF-flat
and PQ-ADC — all against the exact cosine top-k ground truth.

The point is the trade-off table the engine offers a user at 100 TB:
brute is exact but scans all vectors per query; LSH/IVF prune the
candidate set (same metric, approximate candidate generation); PQ scans
everything but in compressed codes (no raw-vector IO at query time).

Usage: python tools/ann_family_comparison.py [sf_dir] [k]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.similarity import (
    cosine_topk,
    ivf_pq_topk,
    ivf_topk,
    lsh_candidate_neighbors,
    pq_adc_topk,
)
from mbai_gdb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ann-family")
    spark.sparkContext.setLogLevel("ERROR")
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 10)

    def pairs(df):
        return {(r.query_id, r.vec_id) for r in df.collect()}

    t0 = time.perf_counter()
    truth = pairs(cosine_topk(emb, queries, k=k).select("query_id", "vec_id"))
    t_brute = time.perf_counter() - t0
    print(f"corpus={n} vectors, k={k}, 10 queries")
    print(f"{'method':<12}{'recall@k':>10}{'sec':>8}   notes")
    print(f"{'brute':<12}{1.0:>10.2f}{t_brute:>8.2f}   exact; scans all vectors/query")

    t0 = time.perf_counter()
    # lsh_candidate_neighbors emits deduped candidate PAIRS; derive each
    # query's top-k from the pairs touching it (same exact re-rank).
    cand = lsh_candidate_neighbors(emb)
    half = cand.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("vec_id"), "cosine_sim"
    ).unionAll(
        cand.select(
            F.col("id_b").alias("query_id"), F.col("id_a").alias("vec_id"), "cosine_sim"
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id"))
    lsh = pairs(
        half.filter(F.col("query_id") < 10)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
    t_lsh = time.perf_counter() - t0
    print(
        f"{'lsh':<12}{len(truth & lsh) / len(truth):>10.2f}{t_lsh:>8.2f}"
        "   bucket-pruned candidates, exact re-rank"
    )

    t0 = time.perf_counter()
    ivf = pairs(ivf_topk(emb, queries, k=k, n_probe=2).select("query_id", "vec_id"))
    t_ivf = time.perf_counter() - t0
    print(
        f"{'ivf(2p)':<12}{len(truth & ivf) / len(truth):>10.2f}{t_ivf:>8.2f}"
        "   2-probe inverted lists, exact re-rank"
    )

    # PQ-ADC ranks by (approximate) L2; on UNIT vectors L2^2 = 2 - 2cos,
    # so normalizing first makes its ranking comparable to the cosine
    # ground truth.
    from mbai_gdb_spark.ops.similarity import as_double, l2_norm

    unit = emb.select(
        "vec_id",
        F.transform(
            as_double(F.col("embedding")), lambda x: x / l2_norm(F.col("embedding"))
        ).alias("embedding"),
    )
    uq = unit.filter(F.col("vec_id") < 10)
    t0 = time.perf_counter()
    pq = pairs(pq_adc_topk(unit, uq, k=k).select("query_id", "vec_id"))
    t_pq = time.perf_counter() - t0
    print(
        f"{'pq-adc':<12}{len(truth & pq) / len(truth):>10.2f}{t_pq:>8.2f}"
        "   compressed-domain scan (8 bytes/vector), untrained codebook,"
        " unit-normalized"
    )

    t0 = time.perf_counter()
    ivfpq = pairs(
        ivf_pq_topk(unit, uq, k=k, n_probe=2).select("query_id", "vec_id")
    )
    t_ivfpq = time.perf_counter() - t0
    print(
        f"{'ivf-pq(2p)':<12}{len(truth & ivfpq) / len(truth):>10.2f}{t_ivfpq:>8.2f}"
        "   2-probe lists x compressed codes (the billion-scale shape),"
        " unit-normalized"
    )


if __name__ == "__main__":
    main()
