"""Object-store manifest backend under sustained ingest (round 12):
measure the cost MODEL the crash tests only prove semantically —
per-mutation wall, objects ingested vs reused (from the manifest's
``stats`` block), pool growth, and probe latency, across a build + N
append ticks + a fused update, run through BOTH backends over the same
corpus so the manifest layer's overhead vs the hardlink baseline is a
measured number, not an assumption.

Expectations (falsifiable):
- objects ingested per append ≈ the delta's part files + the rewritten
  ``_meta`` (O(delta)), NEVER the pool size (reuse via inode identity);
- ``copy_fallback`` stays 0 on a hardlink-capable filesystem;
- manifest mutate wall ≈ hardlink mutate wall + a small constant
  (materialize + ingest are O(#files) metadata ops);
- probe latency flat across ticks (the clustered-write layout).

Merges ``{"manifest_ingest": {...}}`` into the round's BENCH_full and
prints one JSON line.

Run: python tools/manifest_scale_experiment.py [sf_dir] [ticks]
(default .localdata/sf1, 5 ticks).
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
    ticks = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("manifest-scale")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    mod = ticks + 1
    base = docs.filter(F.pmod(F.col("doc_id"), F.lit(mod)) == 0)
    deltas = [
        docs.filter(F.pmod(F.col("doc_id"), F.lit(mod)) == m)
        for m in range(1, ticks + 1)
    ]
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")

    work = tempfile.mkdtemp(prefix="mbai_manifest_scale_")
    m_root = os.path.join(work, "man")
    g_root = os.path.join(work, "gen")
    try:
        rec: dict = {"sf_dir": sf_dir, "ticks": ticks, "n_docs": docs.count()}

        t0 = time.perf_counter()
        M.bm25_man_build(base, m_root, n_buckets=64)
        rec["manifest_build_secs"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        G.bm25_gen_build(base, g_root, n_buckets=64)
        rec["hardlink_build_secs"] = round(time.perf_counter() - t0, 3)

        def pool_size() -> int:
            return len(os.listdir(os.path.join(m_root, "_objects")))

        def man_stats() -> dict:
            name = M.current_manifest_name(m_root)
            return M.read_manifest(m_root, name).get("stats", {})

        rec["build_stats"] = {**man_stats(), "pool": pool_size()}
        tick_recs = []
        for i, delta in enumerate(deltas, 1):
            t0 = time.perf_counter()
            M.bm25_man_append(delta, m_root)
            man_secs = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            G.bm25_gen_append(delta, g_root)
            gen_secs = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            M.bm25_man_probe(spark, m_root, qs, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
            probe_secs = round(time.perf_counter() - t0, 3)
            st = man_stats()
            tick_recs.append(
                {
                    "tick": i,
                    "manifest_append_secs": man_secs,
                    "hardlink_append_secs": gen_secs,
                    "probe_secs": probe_secs,
                    "objects_ingested": st.get("ingested"),
                    "objects_reused": st.get("reused"),
                    "copy_fallback": st.get("copy_fallback"),
                    "pool": pool_size(),
                }
            )
        rec["appends"] = tick_recs

        # fused update through both backends
        upd = docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 13)
        new = upd.withColumn(
            "text", F.concat(F.col("text"), F.lit(" merge scan batch window"))
        )
        t0 = time.perf_counter()
        M.bm25_man_update(upd, new, m_root)
        rec["manifest_update_secs"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        G.bm25_gen_update(upd, new, g_root)
        rec["hardlink_update_secs"] = round(time.perf_counter() - t0, 3)
        rec["update_stats"] = {**man_stats(), "pool": pool_size()}

        # equivalence + GC sanity: both serving paths identical; prune
        # shrinks the pool to the kept manifests' reference set only
        got_m = sorted(
            map(tuple, M.bm25_man_probe(spark, m_root, qs, k=10).collect())
        )
        got_g = sorted(
            map(tuple, G.bm25_gen_probe(spark, g_root, qs, k=10).collect())
        )
        rec["backends_equal"] = got_m == got_g
        pool_before = pool_size()
        pruned = M.prune_manifests(m_root, keep=1)
        rec["prune"] = {
            "manifests_removed": len(pruned["manifests"]),
            "objects_removed": pruned["objects"],
            "pool_before": pool_before,
            "pool_after": pool_size(),
        }
        rec["probe_after_prune_equal"] = (
            sorted(
                map(
                    tuple, M.bm25_man_probe(spark, m_root, qs, k=10).collect()
                )
            )
            == got_m
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    import bench

    bench._merge_into_full_battery({"manifest_ingest": rec})
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
