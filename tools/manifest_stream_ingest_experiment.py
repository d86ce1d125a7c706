"""Streaming ingest through the manifest backend — the cost model
(round 13): tests/test_streaming_manifests.py proves each micro-batch's
object ingest is O(delta) semantically; this measures it at sf1 and
A/Bs the whole drain against the hardlink-generation runner over the
SAME feed, so the manifest layer's streaming overhead is a number, not
an assumption.

Expectations (falsifiable):
- per-batch manifest ``stats``: ingested ≈ the delta's part files +
  the rewritten ``_meta`` tree + the batch's ``_gen_tag``; reused grows
  with the pool; ``copy_fallback`` 0 on a hardlink-capable FS;
- manifest drain wall ≈ generation drain wall + a small constant per
  batch (materialize + ingest are O(#files) metadata ops);
- the two backends' final probes are identical (also pinned bit-exact
  in pytest — here it guards the measurement itself).

Merges ``{"manifest_stream_ingest": {...}}`` into the round's
BENCH_full and prints one JSON line.

Run: python tools/manifest_stream_ingest_experiment.py [sf_dir] [n_files]
(default .localdata/sf1, 8 feed files)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark import indexman as M
from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.session import get_spark

_QS = [
    ("q1", "data model stream"),
    ("q2", "merge scan batch window"),
    ("q3", "quality table event"),
]


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo, ".localdata", "sf1")
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark("manifest-stream-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    from mbai_gdb_spark.streaming.search import (
        run_streaming_bm25_generations_available_now,
        run_streaming_bm25_manifests_available_now,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")

    work = tempfile.mkdtemp(prefix="mbai_man_stream_")
    src = os.path.join(work, "feed")
    man_root = os.path.join(work, "man")
    gen_root = os.path.join(work, "gen")
    try:
        os.makedirs(src)
        now = time.time()
        for i in range(n_files):
            part = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_files)) == i)
            stage = os.path.join(work, f"stage_{i}")
            part.coalesce(1).write.parquet(stage)
            f = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            dst = os.path.join(src, f"{i:02d}.parquet")
            shutil.move(f, dst)
            os.utime(dst, (now + i, now + i))
            shutil.rmtree(stage)

        t0 = time.perf_counter()
        run_streaming_bm25_manifests_available_now(
            spark, src, docs.schema, man_root, n_buckets=256,
            checkpoint=os.path.join(work, "man_ckpt"),
            keep_manifests=None,  # keep history so per-batch stats survive
        )
        man_drain_secs = round(time.perf_counter() - t0, 3)

        per_batch = []
        for nm in M.list_manifests(man_root):
            st = M.read_manifest(man_root, nm).get("stats", {})
            per_batch.append(
                {
                    "manifest": nm,
                    "ingested": st.get("ingested"),
                    "reused": st.get("reused"),
                    "copy_fallback": st.get("copy_fallback", 0),
                    # 1 = the drain's MutateWorkspace applied the delta
                    # in place (r14: no per-batch full materialize)
                    "ws_tree_reused": st.get("ws_tree_reused"),
                }
            )
        pool = len(
            [
                n
                for n in os.listdir(os.path.join(man_root, "_objects"))
                if n.startswith("obj-")
            ]
        )

        t0 = time.perf_counter()
        man_rows = sorted(
            map(tuple, M.bm25_man_probe(spark, man_root, qs, k=10).collect())
        )
        man_probe_secs = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        run_streaming_bm25_generations_available_now(
            spark, src, docs.schema, gen_root, n_buckets=256,
            checkpoint=os.path.join(work, "gen_ckpt"),
            keep_generations=None,
        )
        gen_drain_secs = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        gen_rows = sorted(
            map(tuple, G.bm25_gen_probe(spark, gen_root, qs, k=10).collect())
        )
        gen_probe_secs = round(time.perf_counter() - t0, 3)

        rec = {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "n_feed_files": n_files,
            "manifest_drain_secs": man_drain_secs,
            "generation_drain_secs": gen_drain_secs,
            "manifest_over_generation": round(
                man_drain_secs / gen_drain_secs, 2
            ),
            "per_batch": per_batch,
            "pool_objects": pool,
            "copy_fallback_total": sum(
                b["copy_fallback"] or 0 for b in per_batch
            ),
            "manifest_probe_secs": man_probe_secs,
            "generation_probe_secs": gen_probe_secs,
            "probes_identical": man_rows == gen_rows,
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    import bench

    bench._merge_into_full_battery({"manifest_stream_ingest": rec})
    print(json.dumps({"manifest_stream_ingest": rec}))


if __name__ == "__main__":
    main()
