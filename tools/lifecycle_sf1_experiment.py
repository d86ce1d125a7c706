"""LSH takedown vs rebuild at 10x data (round-11 verdict ask #3): pin
the number the r11 notes claimed — with real-size documents, the
generation-managed physical delete beats rebuilding the index without
the deleted docs, decisively.

Protocol (all timed as FULL lifecycles, publish included):
- build the bucketed LSH index over the sf1 ``documents`` table as
  generation 1 (banding: the registry pipeline — array MinHash, 16
  permutations, 4 rows/band);
- ``delete``: lsh_gen_delete of every doc_id % 10 == 7 — hardlink
  clone + touched-directory rewrites + pointer swap;
- ``rebuild``: generation_build of a fresh index over the corpus MINUS
  the same docs (what an operator without incremental delete must run);
- a pointer-served probe (doc_id % 10 == 3 batch) before/after the
  delete for serving-latency context, plus a result-equivalence check
  between the deleted index and the rebuild (same pairs served).

Merges ``{"lsh_delete_vs_rebuild_sf1": {...}}`` into the round's
BENCH_full file and prints one JSON line.

Run: python tools/lifecycle_sf1_experiment.py [sf_dir]
(default .localdata/sf1; works at any sf tier for A/B-ing scales).
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

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    take = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 7)
    survivors = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 7)
    probe_batch = _doc_lsh_buckets(
        docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3)
    ).localCheckpoint()

    work = tempfile.mkdtemp(prefix="mbai_lifecycle_sf1_")
    root = os.path.join(work, "inc")
    rebuilt = os.path.join(work, "rebuilt")
    try:
        t0 = time.perf_counter()
        G.lsh_gen_build(_doc_lsh_buckets(docs), root, n_buckets=32)
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
        G.lsh_gen_delete(_doc_lsh_buckets(take), root)
        delete_secs = round(time.perf_counter() - t0, 3)

        pairs_after, probe_after = probe(root)

        t0 = time.perf_counter()
        G.generation_build(
            rebuilt,
            lambda p: lsh_index_persist_bucketed(
                _doc_lsh_buckets(survivors), p, n_buckets=32
            ),
        )
        rebuild_secs = round(time.perf_counter() - t0, 3)
        pairs_rebuilt, _ = probe(rebuilt)

        rec = {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "deleted_frac": 0.1,
            "build_secs": build_secs,
            "delete_secs": delete_secs,
            "rebuild_without_secs": rebuild_secs,
            "rebuild_over_delete": round(rebuild_secs / delete_secs, 2),
            "probe_before_secs": probe_before,
            "probe_after_secs": probe_after,
            "delete_equals_rebuild": pairs_after == pairs_rebuilt,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    import bench

    bench._merge_into_full_battery({"lsh_delete_vs_rebuild_sf1": rec})
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
