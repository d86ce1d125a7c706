"""Takedown latency WHILE a streaming runner is mid-ingest (r12 verdict
ask #6): tests/test_takedown.py proves takedown interleaved with
streaming ingest CONVERGES; this measures the number an operator cares
about — how long does a removal request take to be fully enforced when
the index is under live streaming ingest, vs the same takedown on a
quiescent index?

Protocol:
- write the sf1 document corpus as an N-file feed and start the
  generation-managed LSH streaming drain
  (run_streaming_lsh_generations_available_now, maxFilesPerTrigger=1)
  in a background thread — one published generation per micro-batch;
- once generation 1 is live, issue a takedown
  (indexgen.takedown_documents) for a takedown-sized slice of the
  FIRST feed file's docs from the foreground, retrying on
  ConcurrentWriteError: the writer intent lock fails FAST by design,
  so the client-side retry loop IS the documented under-contention
  pattern, and the measured latency is request → published-enforcement
  wall time including every lock-wait;
- after the drain finishes, probe and compare against a batch rebuild
  over (everything ingested − the takedown slice) — convergence, not
  just latency;
- then measure the same-size takedown on the now-quiescent index
  (a second disjoint slice) as the contention-free baseline.

Merges ``{"takedown_under_ingest": {...}}`` into the round's BENCH_full
file and prints one JSON line.

Run: python tools/takedown_under_ingest_experiment.py [sf_dir] [n_files]
(default .localdata/sf1, 8 feed files)."""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark.io import ConcurrentWriteError, read_table
from mbai_gdb_spark.session import get_spark


def _retrying_takedown(requests, timeout: float = 600.0) -> dict:
    """takedown_documents with the documented fail-fast retry loop;
    returns wall-clock latency (request to published), attempts, and
    the time spent losing the lock to the ingest writer."""
    t0 = time.perf_counter()
    attempts = 0
    while True:
        attempts += 1
        try:
            applied = G.takedown_documents(requests)
            break
        except (ConcurrentWriteError, G.TakedownError) as exc:
            root_cause = exc.__cause__ if isinstance(exc, G.TakedownError) else exc
            if not isinstance(root_cause, ConcurrentWriteError) and not isinstance(
                exc, ConcurrentWriteError
            ):
                raise
            if time.perf_counter() - t0 > timeout:
                raise
            time.sleep(0.05)
    return {
        "latency_secs": round(time.perf_counter() - t0, 3),
        "attempts": attempts,
        "generations": [a["generation"] for a in applied],
    }


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo, ".localdata", "sf1")
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    spark = get_spark("takedown-under-ingest")
    spark.sparkContext.setLogLevel("ERROR")

    from mbai_gdb_spark.ops.dedup import (
        lsh_index_persist_bucketed,
        lsh_probe_bucketed,
    )
    from mbai_gdb_spark.queries_north import _doc_lsh_buckets
    from mbai_gdb_spark.streaming.search import (
        run_streaming_lsh_generations_available_now,
    )

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    # Feed file i = doc_id % n_files == i; Spark drains in file order of
    # discovery — the takedown slices live in file 0, so they are
    # ingested by the bootstrap batch and any later takedown finds them.
    corpus0 = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_files)) == 0)
    take_live = corpus0.filter(F.pmod(F.col("doc_id"), F.lit(997)) == 0)
    take_quiet = corpus0.filter(F.pmod(F.col("doc_id"), F.lit(997)) == 7)
    n_take = take_live.count()

    work = tempfile.mkdtemp(prefix="mbai_takedown_ingest_")
    src = os.path.join(work, "feed")
    root = os.path.join(work, "root")
    ckpt = os.path.join(work, "ckpt")
    try:
        os.makedirs(src)
        now = time.time()
        for i in range(n_files):
            part = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_files)) == i)
            stage = os.path.join(work, f"stage_{i}")
            part.coalesce(1).write.parquet(stage)
            import glob

            f = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
            dst = os.path.join(src, f"{i:02d}.parquet")
            shutil.move(f, dst)
            os.utime(dst, (now + i, now + i))
            shutil.rmtree(stage)

        take_buckets = _doc_lsh_buckets(take_live).localCheckpoint()
        quiet_buckets = _doc_lsh_buckets(take_quiet).localCheckpoint()

        drain_err: list = []

        def drain():
            try:
                run_streaming_lsh_generations_available_now(
                    spark,
                    src,
                    docs.schema,
                    root,
                    _doc_lsh_buckets,
                    n_buckets=256,
                    checkpoint=ckpt,
                    keep_generations=5,
                    # the drain must survive the takedown's transient
                    # lock hold (the feature this experiment measures)
                    lock_patience=600.0,
                )
            except Exception as exc:  # surfaced by the join below
                drain_err.append(exc)

        t_drain0 = time.perf_counter()
        th = threading.Thread(target=drain)
        th.start()
        # Wait for generation 1 (the bootstrap batch holding file 0).
        while G.current_generation(root) is None:
            if drain_err:
                raise drain_err[0]
            time.sleep(0.02)
        live = _retrying_takedown([("lsh", take_buckets, root)])
        th.join()
        drain_secs = round(time.perf_counter() - t_drain0, 3)
        if drain_err:
            raise drain_err[0]

        quiet = _retrying_takedown([("lsh", quiet_buckets, root)])

        # Convergence: serving state == batch rebuild over
        # (everything ingested − both takedown slices).
        survivors = docs.join(
            take_live.unionByName(take_quiet).select("doc_id"),
            "doc_id",
            "left_anti",
        )
        probe = _doc_lsh_buckets(
            survivors.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3)
        ).localCheckpoint()
        got = sorted(
            map(
                tuple,
                G.lsh_gen_probe(
                    spark, root, probe, max_bucket_size=50
                ).collect(),
            )
        )
        full = os.path.join(work, "full")
        lsh_index_persist_bucketed(
            _doc_lsh_buckets(survivors), full, n_buckets=256
        )
        want = sorted(
            map(
                tuple,
                lsh_probe_bucketed(
                    spark, probe, full, max_bucket_size=50
                ).collect(),
            )
        )
        rec = {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "n_feed_files": n_files,
            "n_takedown_docs": n_take,
            "drain_secs": drain_secs,
            "under_ingest": live,
            "quiescent": quiet,
            "latency_over_quiescent": round(
                live["latency_secs"] / max(quiet["latency_secs"], 1e-9), 2
            ),
            "converges_to_rebuild": got == want,
            "note": (
                "under_ingest runs first (cold delete path) and "
                "quiescent runs warm in the same session — the ratio "
                "bounds contention from above"
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    import bench

    bench._merge_into_full_battery({"takedown_under_ingest": rec})
    print(json.dumps({"takedown_under_ingest": rec}))


if __name__ == "__main__":
    main()
