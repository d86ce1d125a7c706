"""IVF-flat vs IVF-PQ query cost at corpus sizes beyond the fixtures.

Same synthetic corpus as ann_scale_experiment (xxhash64 components, no
modular structure).  Both paths use the SAME coarse quantizer and probe
count, so the difference isolates what the candidate scan READS per
vector: IVF-flat re-ranks raw 64-float vectors (512 B each); IVF-PQ
scans 8 small ints (the compressed-domain property).  At fixture scale
the gap is invisible; at 10^5-10^6 vectors per probe-list volume it is
the difference between an IO-bound and a compute-trivial scan —
exactly the billion-vector argument.  Query-time only: index build
(assignment + codes) is amortized across query batches in production
(ivf_persist's layout).

Run: python tools/ivfpq_scale_experiment.py [n_vecs ...] [--queries Q]
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
    ivf_pq_index,
    ivf_pq_residual_index,
    ivf_pq_residual_topk,
    ivf_pq_topk,
    ivf_topk,
    l2_topk_vectorized,
)
from mbai_gdb_spark.session import get_spark

DIM = 64


def build(spark, n_vecs: int):
    comp = lambda d: (  # noqa: E731
        (F.abs(F.xxhash64(F.col("id"), F.lit(d))) % 100003) / 100003.0 - 0.5
    )
    vec = F.array(*[comp(d).cast("float") for d in range(DIM)])
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def build_clustered(spark, n_vecs: int, n_centers: int = 64, noise: float = 0.25):
    """Mixture corpus: vector i = center(i % n_centers) + small noise.
    Real embedding corpora are clustered; this is the regime where IVF
    probing actually captures true neighbors (recall ceiling is no
    longer n_probe/n_lists) and residual encoding pays off."""
    cl = F.col("id") % n_centers
    cent = lambda d: (  # noqa: E731
        (F.abs(F.xxhash64(cl, F.lit(d))) % 100003) / 100003.0 - 0.5
    )
    nse = lambda d: (  # noqa: E731
        ((F.abs(F.xxhash64(F.col("id"), F.lit(d + 4096))) % 100003) / 100003.0 - 0.5)
        * noise
    )
    vec = F.array(*[(cent(d) + nse(d)).cast("float") for d in range(DIM)])
    return spark.range(n_vecs).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sizes = [int(a) for a in args] or [100_000, 400_000]
    n_q = 50
    spark = get_spark("ivfpq-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for n in sizes:
        stride = max(50, n // 256)  # ~256 lists
        corpus = build(spark, n).localCheckpoint(eager=True)
        queries = corpus.filter(F.col("vec_id") < n_q)
        t0 = time.perf_counter()
        flat = ivf_topk(
            corpus, queries, k=5, n_probe=2, centroid_stride=stride,
            vectorized_assign=True,
        ).count()
        t_flat = time.perf_counter() - t0
        t0 = time.perf_counter()
        codes, assignment = ivf_pq_index(
            corpus, centroid_stride=stride, code_stride=max(50, n // 16)
        )
        codes = codes.localCheckpoint(eager=True)
        assignment = assignment.localCheckpoint(eager=True)
        t_build = time.perf_counter() - t0
        t0 = time.perf_counter()
        pq = ivf_pq_topk(
            corpus, queries, k=5, n_probe=2, centroid_stride=stride,
            code_stride=max(50, n // 16), prebuilt=(codes, assignment),
        ).count()
        t_pq = time.perf_counter() - t0
        pq_set = {
            (r.query_id, r.vec_id)
            for r in ivf_pq_topk(
                corpus, queries, k=5, n_probe=2, centroid_stride=stride,
                code_stride=max(50, n // 16), prebuilt=(codes, assignment),
            ).collect()
        }
        # Residual-encoded variant: same scan cost (codes-only), tighter
        # quantization — classic Jegou IVFADC.
        t0 = time.perf_counter()
        rcodes, rassign, rcb = ivf_pq_residual_index(
            corpus, centroid_stride=stride, code_stride=max(50, n // 16)
        )
        rcodes = rcodes.localCheckpoint(eager=True)
        rassign = rassign.localCheckpoint(eager=True)
        t_rbuild = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_df = ivf_pq_residual_topk(
            corpus, queries, k=5, n_probe=2, centroid_stride=stride,
            code_stride=max(50, n // 16), prebuilt=(rcodes, rassign, rcb),
            vectorized_assign=True,
        )
        res_df.count()
        t_res = time.perf_counter() - t0
        # Recall@5 vs the exact squared-L2 oracle (what ADC approximates),
        # measured on a CLUSTERED corpus of the same size: on the uniform
        # hash corpus recall is capped at ~n_probe/n_lists for ANY encoder
        # (nearest neighbors are independent of the coarse quantizer), so
        # the uniform number measures IVF pruning, not PQ quality.
        ccorpus = build_clustered(spark, n).localCheckpoint(eager=True)
        cqueries = ccorpus.filter(F.col("vec_id") < n_q)
        # Identical codebook budget for both encoders, so the
        # raw-vs-residual delta isolates the encoding itself.
        n_codes, cstride = 16, max(50, n // 16)
        ckw = dict(
            k=5, n_probe=2, centroid_stride=stride,
            n_codes=n_codes, code_stride=cstride,
        )
        craw, cassign = ivf_pq_index(
            ccorpus, centroid_stride=stride, n_codes=n_codes, code_stride=cstride
        )
        craw = craw.localCheckpoint(eager=True)
        cassign = cassign.localCheckpoint(eager=True)
        raw_set = {
            (r.query_id, r.vec_id)
            for r in ivf_pq_topk(
                ccorpus, cqueries, prebuilt=(craw, cassign),
                vectorized_assign=True, **ckw
            ).collect()
        }
        crcodes, crassign, crcb = ivf_pq_residual_index(
            ccorpus, centroid_stride=stride, n_codes=n_codes, code_stride=cstride
        )
        crcodes = crcodes.localCheckpoint(eager=True)
        crassign = crassign.localCheckpoint(eager=True)
        res_set = {
            (r.query_id, r.vec_id)
            for r in ivf_pq_residual_topk(
                ccorpus, cqueries, prebuilt=(crcodes, crassign, crcb),
                vectorized_assign=True, **ckw
            ).collect()
        }
        truth = {
            (r.query_id, r.vec_id)
            for r in l2_topk_vectorized(ccorpus, cqueries, k=5).collect()
        }
        recall_raw = len(truth & raw_set) / len(truth) if truth else 0.0
        recall_res = len(truth & res_set) / len(truth) if truth else 0.0
        rows.append(
            {
                "n_vecs": n,
                "n_lists": n // stride,
                "ivf_flat_query_s": round(t_flat, 2),
                "ivfpq_build_s": round(t_build, 2),
                "ivfpq_query_s": round(t_pq, 2),
                "ivfpq_residual_build_s": round(t_rbuild, 2),
                "ivfpq_residual_query_s": round(t_res, 2),
                "recall5_raw_clustered": round(recall_raw, 4),
                "recall5_residual_clustered": round(recall_res, 4),
                "rows_flat": flat,
                "rows_pq": pq,
            }
        )
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    print(json.dumps({"metric": "ivfpq_scale", "points": rows}))


if __name__ == "__main__":
    main()
