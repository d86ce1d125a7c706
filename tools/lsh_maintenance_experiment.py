"""Bucketed-LSH index maintenance: incremental append / physical delete
vs full index rebuild (round 11) — the same framing as
tools/index_maintenance_experiment.py for BM25, because it is the same
claim: maintaining the PERSISTED artifact must cost the delta, not the
corpus.

Per tick: append a fixed-size delta into the incremental index (timed)
and rebuild a from-scratch bucketed index over the same accumulated
corpus (timed) — expectation: append ~flat, rebuild growing with the
corpus.  After the last tick: physically delete a slice (timed) vs
rebuilding the index without it (timed) — expectation: the takedown is
cheaper than the rebuild it replaces and stays bounded by touched-
directory bytes.  The probe wall each tick is recorded for context
(probe cost is touched-directory IO: |batch buckets|/n_buckets of the
corpus — partition pruning is a constant-factor IO cut, not an
asymptote change; the asymptotic win of the persisted index is never
re-BANDING the corpus at query time).

Docs are deterministic xxhash64 word salad over a WIDE token space
(w0..w4999 — a narrow vocabulary would make every doc's token set
nearly identical and the hot-bucket cap would kill all pairs); every
5th doc duplicates its predecessor so near-dup pairs exist by
construction.

Run: python tools/lsh_maintenance_experiment.py [ticks] [delta_docs]
(one JSON line; defaults 3 ticks x 50k docs).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    lsh_buckets_from_signature,
    lsh_index_append_bucketed,
    lsh_index_delete_bucketed,
    lsh_index_persist_bucketed,
    lsh_probe_bucketed,
    minhash_signature_array,
)
from mbai_gdb_spark.ops.text import tokens
from mbai_gdb_spark.session import get_spark


def _docs(spark, n: int, offset: int):
    base = spark.range(offset, offset + n).select(F.col("id").alias("doc_id"))
    seed = F.when(
        F.pmod(F.col("doc_id"), F.lit(5)) == 0, F.col("doc_id") - 1
    ).otherwise(F.col("doc_id"))
    picks = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(seed, i), F.lit(5000)).cast("string"),
        ),
    )
    return base.select("doc_id", F.array_join(picks, " ").alias("text"))


def _buckets(docs):
    with_sig = (
        docs.select("doc_id", F.array_distinct(tokens("text")).alias("t"))
        .filter(F.size("t") > 0)
        .select(
            "doc_id",
            minhash_signature_array(
                F.transform(F.col("t"), lambda x: char_poly_id(x)), n_hashes=16
            ).alias("signature"),
        )
    )
    return lsh_buckets_from_signature(with_sig, "doc_id", "signature", 4)


def main() -> None:
    ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    delta_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("lsh-maintenance-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="lsh_maint_exp_")
    inc = os.path.join(work, "inc")
    probe_docs = _docs(spark, 50, 10_000_000).localCheckpoint()
    probe_b = _buckets(probe_docs).localCheckpoint()
    rows = []
    try:
        for t in range(ticks):
            delta_b = _buckets(
                _docs(spark, delta_n, t * delta_n)
            ).localCheckpoint()
            t0 = time.perf_counter()
            if t == 0:
                lsh_index_persist_bucketed(delta_b, inc, n_buckets=256)
            else:
                lsh_index_append_bucketed(delta_b, inc)
            append_s = time.perf_counter() - t0

            # The rebuild strawman: a from-scratch PERSISTED index over
            # the same accumulated corpus (what a pipeline without
            # incremental maintenance must run per ingest tick).
            total = (t + 1) * delta_n
            rb = os.path.join(work, "rebuild")
            shutil.rmtree(rb, ignore_errors=True)
            t0 = time.perf_counter()
            lsh_index_persist_bucketed(
                _buckets(_docs(spark, total, 0)), rb, n_buckets=64
            )
            rebuild_s = time.perf_counter() - t0

            t0 = time.perf_counter()
            n_pairs = lsh_probe_bucketed(
                spark, probe_b, inc, max_bucket_size=50
            ).count()
            probe_s = time.perf_counter() - t0
            rows.append(
                {
                    "tick": t,
                    "corpus_docs": total,
                    "append_s": round(append_s, 3),
                    "rebuild_s": round(rebuild_s, 3),
                    "probe_s": round(probe_s, 3),
                    "probe_pairs": n_pairs,
                }
            )

        # Takedown: delete a slice vs rebuilding without it.
        total = ticks * delta_n
        del_docs = _docs(spark, total, 0).filter(
            F.pmod(F.col("doc_id"), F.lit(9973)) == 0
        )
        del_b = _buckets(del_docs).localCheckpoint()
        n_del = del_b.select("doc_id").distinct().count()
        from mbai_gdb_spark.ops.dedup import lsh_partition_bucket

        touched_dirs = (
            del_b.select(
                lsh_partition_bucket(
                    F.col("band"), F.col("bucket"), 256
                ).alias("pbkt")
            )
            .distinct()
            .count()
        )
        t0 = time.perf_counter()
        lsh_index_delete_bucketed(del_b, inc)
        delete_s = time.perf_counter() - t0

        rb = os.path.join(work, "rebuild_wo")
        survivors = _docs(spark, total, 0).filter(
            F.pmod(F.col("doc_id"), F.lit(9973)) != 0
        )
        t0 = time.perf_counter()
        lsh_index_persist_bucketed(_buckets(survivors), rb, n_buckets=256)
        rebuild_wo_s = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "metric": "lsh_maintenance",
                    "ticks": rows,
                    "delete": {
                        "docs_deleted": n_del,
                        "touched_dirs_of_256": touched_dirs,
                        "delete_s": round(delete_s, 3),
                        "rebuild_without_s": round(rebuild_wo_s, 3),
                    },
                    "probe_batch_docs": 50,
                    "n_buckets": 256,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
