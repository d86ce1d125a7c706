"""Cost model of the round-10 serving upgrades at up-to-1M-doc scale.

Three claims under test, each against a fixture built to EXPOSE it (a
uniform tiny-vocabulary corpus would hide all three — every term a
stop-word, every bucket touched by everything):

1. **Generation overhead is metadata, not data.**  A generation-managed
   append = hardlink-clone (O(#files)) + the same O(delta) insert + one
   pointer rename.  Measured: clone wall vs file count, and the
   gen-append wall vs the bare in-place append wall on the identical
   corpus.  Expectation: overhead tracks FILE COUNT, never corpus
   bytes.

2. **Physical deletion costs touched buckets, not the corpus.**  The
   delete set is a TENANT: its docs draw from a 40-word sub-vocabulary
   (a takedown/dedup-verdict set shares vocabulary in practice), so its
   postings live in ≤40 of 256 buckets.  Measured: gen_delete wall vs
   a full rebuild-without wall at each corpus size.  Expectation: the
   delete stays a small fraction of the rebuild, because its
   identification/verification/rewrite reads only the tenant's buckets
   while the rebuild re-scans everything.

3. **Served phrase search stops being corpus-bound.**  The phrase
   ("zq1 zq2 zq3") is implanted in 0.5% of docs; its three terms own
   three buckets.  The in-memory query posexplodes the WHOLE corpus per
   call; the positional probe explodes stored positions of those three
   buckets only.  Measured: warm walls of both at each size.
   Expectation: in-memory grows ~linearly with the corpus, the probe
   with its three posting lists (~0.5% of it).

Synthetic xxhash64 word-salad corpus (deterministic, size is a dial):
2000-word common vocabulary, 40-word tenant sub-vocabulary on
doc_id % 200 == 100, the rare phrase appended on doc_id % 200 == 0.

Run: python tools/generation_lifecycle_experiment.py [sizes_csv]
(one JSON line; default sizes 125000,250000,500000,1000000).
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
from mbai_gdb_spark.ops.text import (
    bm25_index_append,
    bm25_index_persist,
    phrase_bm25_topk,
)
from mbai_gdb_spark.session import get_spark

N_BUCKETS = 256
PHRASE = "zq1 zq2 zq3"


def _docs(spark, n: int, offset: int = 0):
    base = spark.range(offset, offset + n).select(F.col("id").alias("doc_id"))
    idx = F.sequence(F.lit(0), F.lit(29))

    def _salad(prefix: str, vocab: int):
        return F.array_join(
            F.transform(
                idx,
                lambda i: F.concat(
                    F.lit(prefix),
                    F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(vocab)).cast(
                        "string"
                    ),
                ),
            ),
            " ",
        )

    slot = F.pmod(F.col("doc_id"), F.lit(200))
    text = (
        F.when(slot == 100, _salad("d", 40))  # tenant (the delete set)
        .when(slot == 0, F.concat(_salad("w", 2000), F.lit(" " + PHRASE)))
        .otherwise(_salad("w", 2000))
    )
    return base.select("doc_id", text.alias("text"))


def _count_files(tree: str) -> int:
    total = 0
    for _cur, _dirs, files in os.walk(tree):
        total += len(files)
    return total


def _wall(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sizes = (
        [int(s) for s in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [125_000, 250_000, 500_000, 1_000_000]
    )
    spark = get_spark("generation-lifecycle-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="mbai_genexp_")
    qs = spark.createDataFrame([("p1", PHRASE)], "query_id string, qtext string")
    out: dict = {"sizes": sizes, "n_buckets": N_BUCKETS, "per_size": []}
    try:
        for n in sizes:
            row: dict = {"n_docs": n}
            corpus = _docs(spark, n)
            delta = _docs(spark, 10_000, offset=n)  # fixed-size ingest delta
            dels = corpus.filter(F.pmod(F.col("doc_id"), F.lit(200)) == 100)
            survivors = corpus.filter(
                F.pmod(F.col("doc_id"), F.lit(200)) != 100
            ).unionAll(delta)

            # --- claim 1: generation overhead = clone + insert + rename
            bare = os.path.join(work, f"bare_{n}")
            bm25_index_persist(corpus, bare, n_buckets=N_BUCKETS, positions=True)
            row["bare_append_s"] = _wall(lambda: bm25_index_append(delta, bare))

            root = os.path.join(work, f"root_{n}")
            G.bm25_gen_build(corpus, root, n_buckets=N_BUCKETS, positions=True)
            cur = G.current_generation(root)
            row["gen_files"] = _count_files(cur)
            clone = os.path.join(work, f"clone_{n}")
            row["clone_s"] = _wall(lambda: G._clone_tree_hardlinks(cur, clone))
            shutil.rmtree(clone, ignore_errors=True)
            row["gen_append_s"] = _wall(lambda: G.bm25_gen_append(delta, root))

            # --- claim 2: tenant delete vs rebuild-without, same outcome
            row["n_deleted"] = dels.count()
            row["gen_delete_s"] = _wall(lambda: G.bm25_gen_delete(dels, root))
            rb = os.path.join(work, f"rb_{n}")
            row["rebuild_without_s"] = _wall(
                lambda: bm25_index_persist(
                    survivors, rb, n_buckets=N_BUCKETS, positions=True
                )
            )
            row["delete_vs_rebuild"] = round(
                row["gen_delete_s"] / max(row["rebuild_without_s"], 1e-9), 3
            )

            # --- claim 3: served phrase vs in-memory phrase (warm 2nd runs)
            def _probe():
                G.bm25_gen_phrase_probe(spark, root, qs, k=10).write.format(
                    "noop"
                ).mode("overwrite").save()

            def _inmem():
                phrase_bm25_topk(survivors, qs, k=10).write.format("noop").mode(
                    "overwrite"
                ).save()

            _probe()
            row["phrase_probe_warm_s"] = _wall(_probe)
            _inmem()
            row["phrase_inmemory_warm_s"] = _wall(_inmem)

            # parity spot-check at every size: served ≡ in-memory
            got = sorted(
                map(
                    tuple,
                    G.bm25_gen_phrase_probe(spark, root, qs, k=10).collect(),
                )
            )
            want = sorted(map(tuple, phrase_bm25_topk(survivors, qs, k=10).collect()))
            row["parity_ok"] = got == want and len(got) > 0

            out["per_size"].append(row)
            print(json.dumps(row), file=sys.stderr)
            for d in (bare, root, rb):
                shutil.rmtree(d, ignore_errors=True)
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
