"""Incremental append vs full rebuild as a BM25 corpus grows.

The claim under test is the whole point of bm25_index_append: ingest
cost should track the DELTA (a pure insert — no bucket is rewritten;
this experiment is what falsified the first, df-denormalized design
whose touched-bucket rewrites made append cost track the INDEX), while
a rebuild re-scans the accumulated corpus every tick.
This drives one index through K ingest ticks of fixed delta size and,
at each tick, measures (a) the append wall, (b) a from-scratch rebuild
wall over the same accumulated corpus, and (c) the warm probe wall
before and after compaction (io.compact_partitioned), with the
fragmented file count — the small-files debt the append accrues and
the compaction tick pays down.

Expectation at scale: append wall ~flat across ticks (delta-bound),
rebuild wall growing ~linearly with the accumulated corpus, probe wall
drifting up with fragmentation and restored by compaction.  The
fixture corpus is synthetic (xxhash64 word salad over a small
vocabulary, like the other scale experiments) so corpus size is a
dial, not a fixture limit.

Run: python tools/index_maintenance_experiment.py [ticks] [delta_docs]
(one JSON line; defaults 6 ticks x 20k docs).
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

from mbai_gdb_spark.io import compact_partitioned
from mbai_gdb_spark.ops.text import (
    bm25_index_append,
    bm25_index_persist,
    bm25_probe_persisted,
)
from mbai_gdb_spark.session import get_spark

VOCAB = (
    "the a key order sort table scan merge part window small hash join "
    "batch stream spark dup group query row data slow filter customer "
    "line value agg column fast big vector"
).split()


def _docs(spark, n: int, offset: int):
    """Deterministic synthetic docs: 30 vocabulary words per doc chosen
    by xxhash64 — same trick as the other scale experiments (no RNG,
    reproducible across runs and engines)."""
    base = spark.range(offset, offset + n).select(
        F.col("id").alias("doc_id")
    )
    words = F.array(*[F.lit(w) for w in VOCAB])
    picks = F.transform(
        F.sequence(F.lit(0), F.lit(29)),
        lambda i: F.element_at(
            words,
            (F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(len(VOCAB)))
             + F.lit(1)).cast("int"),
        ),
    )
    return base.select("doc_id", F.array_join(picks, " ").alias("text"))


def main() -> None:
    ticks = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    delta_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    spark = get_spark("index-maintenance-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    qs = spark.createDataFrame(
        [("q1", "hash join merge"), ("q2", "table scan"), ("q3", "sort order")],
        "query_id string, qtext string",
    )
    work = tempfile.mkdtemp(prefix="idx_maint_exp_")
    inc = os.path.join(work, "inc")
    rows = []
    try:
        for t in range(ticks):
            delta = _docs(spark, delta_n, t * delta_n).localCheckpoint()
            t0 = time.perf_counter()
            if t == 0:
                bm25_index_persist(delta, inc, n_buckets=64)
            else:
                bm25_index_append(delta, inc)
            append_s = time.perf_counter() - t0

            # The rebuild strawman over the same accumulated corpus.
            total = (t + 1) * delta_n
            full_corpus = _docs(spark, total, 0)
            rb = os.path.join(work, "rebuild")
            shutil.rmtree(rb, ignore_errors=True)
            t0 = time.perf_counter()
            bm25_index_persist(full_corpus, rb, n_buckets=64)
            rebuild_s = time.perf_counter() - t0

            frag_files = sum(
                len([f for f in os.listdir(os.path.join(inc, d))
                     if f.endswith(".parquet")])
                for d in os.listdir(inc) if d.startswith("bucket=")
            )
            t0 = time.perf_counter()
            bm25_probe_persisted(spark, inc, qs, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
            probe_s = time.perf_counter() - t0
            rows.append(
                {
                    "tick": t,
                    "corpus_docs": total,
                    "append_s": round(append_s, 3),
                    "rebuild_s": round(rebuild_s, 3),
                    "index_files": frag_files,
                    "probe_s": round(probe_s, 3),
                }
            )

        compacted = compact_partitioned(spark, inc, "bucket")
        t0 = time.perf_counter()
        bm25_probe_persisted(spark, inc, qs, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        probe_after = time.perf_counter() - t0
        files_after = sum(
            len([f for f in os.listdir(os.path.join(inc, d))
                 if f.endswith(".parquet")])
            for d in os.listdir(inc) if d.startswith("bucket=")
        )
        print(
            json.dumps(
                {
                    "metric": "bm25_append_vs_rebuild",
                    "ticks": rows,
                    "append_wall_flat": rows[-1]["append_s"]
                    < 2.5 * max(rows[1]["append_s"], 0.001)
                    if ticks > 1
                    else None,
                    "rebuild_growth": round(
                        rows[-1]["rebuild_s"] / max(rows[0]["rebuild_s"], 0.001), 2
                    ),
                    "compaction": {
                        "buckets_compacted": len(compacted),
                        "files_before": rows[-1]["index_files"],
                        "files_after": files_after,
                        "probe_before_s": rows[-1]["probe_s"],
                        "probe_after_s": round(probe_after, 3),
                    },
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
