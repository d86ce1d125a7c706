"""LSH takedown vs rebuild at 10x data (round-11 verdict ask #3): pin
the number the r11 notes claimed — with real-size documents, the
generation-managed physical delete beats rebuilding the index without
the deleted docs, decisively.

Protocol (all timed as FULL lifecycles, publish included):
- build the bucketed LSH index over the sf1 ``documents`` table as
  generation 1 (banding: the registry pipeline — array MinHash, 16
  permutations, 4 rows/band; n_buckets=256 — at 50k+ docs the
  registry's 32-dir demo layout makes EVERY delete touch every
  directory, hiding the touched-dir asymptote the design exists for);
- ``delete_small``: lsh_gen_delete of a takedown-sized slice
  (doc_id % 997 == 7, ~0.1% of the corpus) — the regime a real
  verdict/DMCA/PII request lives in;
- ``delete_bulk``: lsh_gen_delete of every remaining doc_id % 10 == 7
  (~10% — a dedup-verdict-sized purge, whose banding spray touches
  most directories, so it SHOULD cost rebuild-order time);
- ``rebuild``: generation_build of a fresh index over the corpus MINUS
  both slices (what an operator without incremental delete must run
  for ANY removal, however small);
- a pointer-served probe (doc_id % 10 == 3 batch, minus deleted)
  before/after for serving-latency context, plus a result-equivalence
  check: probes of the twice-deleted index equal the rebuild's.
Touched-directory counts are recorded per delete — the cost MODEL
(touched dirs / total dirs), not just the wall.

Merges ``{"lsh_delete_vs_rebuild_sf1": {...}}`` into the round's
BENCH_full file and prints one JSON line.

Run: python tools/lifecycle_sf1_experiment.py [sf_dir] [reps]
(default .localdata/sf1, reps=1; works at any sf tier for A/B-ing
scales).  ``reps`` > 1 replicates the document table in-plan with
key-offset ids and a per-replica text token (the gen_sf1 recipe) —
the cheap way to put REAL-shaped documents at 10x the tier's size
under the rebuild without another dataset on disk; the takedown-sized
slice stays ~51 docs, so the ratio isolates the asymptote: rebuild
tracks the corpus, the takedown tracks touched directories.
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

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.dedup import lsh_index_persist_bucketed
from mbai_gdb_spark.queries_north import _doc_lsh_buckets
from mbai_gdb_spark.session import get_spark


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo, ".localdata", "sf1")
    )
    spark = get_spark("lifecycle-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    n_buckets = 256
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    if reps > 1:
        stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        docs = docs.sparkSession.range(reps).select(
            F.col("id").alias("__rep__")
        ).crossJoin(docs).select(
            (F.col("doc_id") + F.col("__rep__") * stride).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" rep"), F.col("__rep__").cast("string")
            ).alias("text"),
        )
        docs = docs.repartition(32).localCheckpoint()
    n_docs = docs.count()
    small = docs.filter(F.pmod(F.col("doc_id"), F.lit(997)) == 7)
    bulk = docs.filter(
        (F.pmod(F.col("doc_id"), F.lit(10)) == 7)
        & (F.pmod(F.col("doc_id"), F.lit(997)) != 7)
    )
    survivors = docs.filter(
        (F.pmod(F.col("doc_id"), F.lit(10)) != 7)
        & (F.pmod(F.col("doc_id"), F.lit(997)) != 7)
    )
    probe_batch = _doc_lsh_buckets(
        survivors.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3)
    ).localCheckpoint()

    def touched_dirs(frame) -> int:
        from mbai_gdb_spark.ops.dedup import lsh_partition_bucket

        return (
            _doc_lsh_buckets(frame)
            .select(
                lsh_partition_bucket(
                    F.col("band"), F.col("bucket"), n_buckets
                ).alias("pbkt")
            )
            .distinct()
            .count()
        )

    work = tempfile.mkdtemp(prefix="mbai_lifecycle_sf1_")
    root = os.path.join(work, "inc")
    rebuilt = os.path.join(work, "rebuilt")
    try:
        t0 = time.perf_counter()
        G.lsh_gen_build(_doc_lsh_buckets(docs), root, n_buckets=n_buckets)
        build_secs = round(time.perf_counter() - t0, 3)

        def probe(r):
            t0 = time.perf_counter()
            rows = sorted(
                map(
                    tuple,
                    G.lsh_gen_probe(
                        spark, r, probe_batch, max_bucket_size=50
                    ).collect(),
                )
            )
            return rows, round(time.perf_counter() - t0, 3)

        _, probe_before = probe(root)

        t0 = time.perf_counter()
        G.lsh_gen_delete(_doc_lsh_buckets(small), root)
        delete_small_secs = round(time.perf_counter() - t0, 3)
        small_dirs = touched_dirs(small)

        t0 = time.perf_counter()
        G.lsh_gen_delete(_doc_lsh_buckets(bulk), root)
        delete_bulk_secs = round(time.perf_counter() - t0, 3)
        bulk_dirs = touched_dirs(bulk)

        pairs_after, probe_after = probe(root)

        t0 = time.perf_counter()
        G.generation_build(
            rebuilt,
            lambda p: lsh_index_persist_bucketed(
                _doc_lsh_buckets(survivors), p, n_buckets=n_buckets
            ),
        )
        rebuild_secs = round(time.perf_counter() - t0, 3)
        pairs_rebuilt, _ = probe(rebuilt)

        rec = {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "n_buckets": n_buckets,
            "build_secs": build_secs,
            "delete_small": {
                "n_docs": small.count(),
                "secs": delete_small_secs,
                "touched_dirs": small_dirs,
                "rebuild_over_delete": round(
                    rebuild_secs / delete_small_secs, 2
                ),
            },
            "delete_bulk": {
                "n_docs": bulk.count(),
                "secs": delete_bulk_secs,
                "touched_dirs": bulk_dirs,
                "rebuild_over_delete": round(
                    rebuild_secs / delete_bulk_secs, 2
                ),
            },
            "rebuild_without_secs": rebuild_secs,
            "probe_before_secs": probe_before,
            "probe_after_secs": probe_after,
            "delete_equals_rebuild": pairs_after == pairs_rebuilt,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    rec["reps"] = reps
    key = "lsh_delete_vs_rebuild_sf1" + (f"_x{reps}" if reps > 1 else "")

    import bench

    bench._merge_into_full_battery({key: rec})
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
