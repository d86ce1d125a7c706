"""Takedown (physical delete) vs rebuild at 10x data, for ALL FOUR
index families (r11 verdict ask #3 pinned LSH; r12 verdict ask #5 asks
for the BM25 / IVF / IVF-PQ sweeps too): with real-size corpora, the
generation-managed delete must beat rebuilding the index without the
deleted content — and the gap must WIDEN with corpus size, because the
delete tracks touched directories while the rebuild tracks the corpus.

Protocol (identical per family; all timed as FULL lifecycles, publish
included):
- build the index over the sf1 corpus as generation 1;
- ``delete_small``: *_gen_delete of a takedown-sized slice (~0.1%,
  id % 997 == 7) — the regime a real verdict/DMCA/PII request lives in;
- ``delete_bulk``: *_gen_delete of the remaining id % 10 == 7 slice
  (~10% — a dedup-verdict-sized purge whose spray touches most
  directories, so it SHOULD cost rebuild-order time);
- ``rebuild``: generation_build of a fresh index over the corpus MINUS
  both slices (what an operator without incremental delete must run
  for ANY removal, however small);
- a pointer-served probe before/after for serving-latency context,
  plus a result-equivalence check: probes of the twice-deleted index
  equal the rebuild's, bit-for-bit.

Equivalence holds for the vector families because the delete slices
additionally exclude every id that feeds a quantizer sample
(vec_id % 50 == 0 centroids; vec_id % 7 == 0 codebook rows), so the
rebuild's stride-sampled quantizers over the SURVIVORS are provably
the same frozen quantizers the incremental index carries — the same
argument the registry's *_deleted oracles rest on.

Touched-directory counts are recorded per delete — the cost MODEL
(touched dirs / total dirs), not just the wall.  For BM25/IVF/IVF-PQ
they are counted from the published index itself (semi-join of the
pre-delete generation's rows against the slice, distinct partition
values); for LSH from the banding pipeline, as in r12.

Merges ``{"<family>_delete_vs_rebuild_sf1[_xN]": {...}}`` into the
round's BENCH_full file and prints one JSON line.

Run: python tools/lifecycle_sf1_experiment.py [sf_dir] [reps] [families]
[stride] (default .localdata/sf1, reps=1, families=lsh, stride=50;
families is a comma-separated subset of lsh,bm25,ivf,ivfpq or ``all``;
stride is the vector families' centroid_stride — see _family_ops on
why large reps want a sqrt-scaled stride).  ``reps`` > 1
replicates the corpus in-plan with key-offset ids (the gen_sf1 recipe)
so the rebuild faces N× the bytes while the takedown-sized slice stays
tiny — the ratio isolates the asymptote."""

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
from mbai_gdb_spark.session import get_spark

_FAMILIES = ("lsh", "bm25", "ivf", "ivfpq")


def _replicate(df, id_col: str, reps: int, text_col: str | None):
    """The gen_sf1 recipe in-plan: reps key-offset replicas; text gets a
    per-replica token so dedup-family banding doesn't see exact clones;
    embeddings are reused verbatim (ids differ; value duplication is
    irrelevant to delete/rebuild cost)."""
    stride = df.agg(F.max(id_col)).collect()[0][0] + 1
    rep = df.sparkSession.range(reps).select(F.col("id").alias("__rep__"))
    out = rep.crossJoin(df).withColumn(
        id_col, F.col(id_col) + F.col("__rep__") * stride
    )
    if text_col is not None:
        out = out.withColumn(
            text_col,
            F.concat(
                F.col(text_col), F.lit(" rep"), F.col("__rep__").cast("string")
            ),
        )
    return out.drop("__rep__").repartition(32).localCheckpoint()


def _doc_slices(docs):
    small = docs.filter(F.pmod(F.col("doc_id"), F.lit(997)) == 7)
    bulk = docs.filter(
        (F.pmod(F.col("doc_id"), F.lit(10)) == 7)
        & (F.pmod(F.col("doc_id"), F.lit(997)) != 7)
    )
    survivors = docs.filter(
        (F.pmod(F.col("doc_id"), F.lit(10)) != 7)
        & (F.pmod(F.col("doc_id"), F.lit(997)) != 7)
    )
    return small, bulk, survivors


def _vec_slices(emb):
    """Takedown slices that provably never feed a quantizer sample:
    centroids are vec_id % 50 == 0 and codebook rows vec_id % 7 == 0,
    so both are excluded — the rebuild over survivors then trains the
    IDENTICAL frozen quantizers and bit-equivalence is checkable."""
    vid = F.col("vec_id")
    quantizer = (F.pmod(vid, F.lit(50)) == 0) | (F.pmod(vid, F.lit(7)) == 0)
    small = emb.filter((F.pmod(vid, F.lit(997)) == 7) & ~quantizer)
    bulk = emb.filter(
        (F.pmod(vid, F.lit(10)) == 7)
        & (F.pmod(vid, F.lit(997)) != 7)
        & ~quantizer
    )
    survivors = emb.join(small.unionByName(bulk).select("vec_id"), "vec_id",
                         "left_anti")
    return small, bulk, survivors


def _touched_partitions(spark, root: str, slice_df, id_col: str,
                        part_col: str) -> int:
    """Distinct partition directories of the CURRENT generation that
    hold rows of the slice — the exact set a verified delete rewrites."""
    cur = G.current_generation(root)
    return (
        spark.read.parquet(cur)
        .join(F.broadcast(slice_df.select(id_col)), id_col, "left_semi")
        .select(part_col)
        .distinct()
        .count()
    )


def _family_ops(spark, family: str, sf_dir: str, reps: int,
                stride: int = 50):
    """(corpus, small, bulk, survivors, build, delete, rebuild_persist,
    probe, touched) per family.  probe(root) -> sorted rows.

    ``stride`` is the vector families' centroid_stride.  The default 50
    matches the registry queries, but it makes the centroid COUNT grow
    linearly with the corpus — exact assignment is then O(N^2/stride),
    which is why the r13 x100 IVF cell blew past its wall-clock budget
    (2M vectors x 40k centroids).  For large ``reps`` pass a stride
    that keeps centroids ~sqrt(N) (the geometry a production IVF uses:
    assignment and probe fan-out balance at k ~ sqrt(N)); both build
    AND rebuild use the same stride, so the experiment's internal
    delete ≡ rebuild bit-equivalence is unaffected."""
    if family in ("lsh", "bm25"):
        from mbai_gdb_spark.queries_north import _SEARCH_QUERIES, _doc_lsh_buckets

        docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
        if reps > 1:
            docs = _replicate(docs, "doc_id", reps, "text")
        small, bulk, survivors = _doc_slices(docs)
        if family == "lsh":
            from mbai_gdb_spark.ops.dedup import (
                lsh_index_persist_bucketed,
                lsh_partition_bucket,
            )

            n_buckets = 256
            probe_batch = _doc_lsh_buckets(
                survivors.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 3)
            ).localCheckpoint()

            def touched(slice_df):
                return (
                    _doc_lsh_buckets(slice_df)
                    .select(
                        lsh_partition_bucket(
                            F.col("band"), F.col("bucket"), n_buckets
                        ).alias("pbkt")
                    )
                    .distinct()
                    .count()
                )

            return dict(
                corpus=docs,
                small=small,
                bulk=bulk,
                survivors=survivors,
                build=lambda root: G.lsh_gen_build(
                    _doc_lsh_buckets(docs), root, n_buckets=n_buckets
                ),
                delete=lambda df, root: G.lsh_gen_delete(
                    _doc_lsh_buckets(df), root
                ),
                rebuild=lambda p: lsh_index_persist_bucketed(
                    _doc_lsh_buckets(survivors), p, n_buckets=n_buckets
                ),
                probe=lambda root: sorted(
                    map(
                        tuple,
                        G.lsh_gen_probe(
                            spark, root, probe_batch, max_bucket_size=50
                        ).collect(),
                    )
                ),
                touched=lambda df, root: touched(df),
                id_col="doc_id",
            )
        from mbai_gdb_spark.ops.text import bm25_index_persist

        queries_df = spark.createDataFrame(
            _SEARCH_QUERIES, "query_id string, qtext string"
        ).localCheckpoint()
        return dict(
            corpus=docs,
            small=small,
            bulk=bulk,
            survivors=survivors,
            build=lambda root: G.bm25_gen_build(docs, root, n_buckets=256),
            delete=lambda df, root: G.bm25_gen_delete(df, root),
            rebuild=lambda p: bm25_index_persist(survivors, p, n_buckets=256),
            probe=lambda root: sorted(
                map(
                    tuple,
                    G.bm25_gen_probe(spark, root, queries_df, k=10).collect(),
                )
            ),
            touched=lambda df, root: _touched_partitions(
                spark, root, df, "doc_id", "bucket"
            ),
            id_col="doc_id",
        )

    emb = read_table(spark, sf_dir, "embeddings")
    if reps > 1:
        emb = _replicate(emb, "vec_id", reps, None)
    small, bulk, survivors = _vec_slices(emb)
    queries_df = emb.filter(F.col("vec_id") < 10).localCheckpoint()
    if family == "ivf":
        from mbai_gdb_spark.ops.similarity import ivf_persist

        return dict(
            corpus=emb,
            small=small,
            bulk=bulk,
            survivors=survivors,
            build=lambda root: G.ivf_gen_build(
                emb, root, centroid_stride=stride
            ),
            delete=lambda df, root: G.ivf_gen_delete(df, root),
            rebuild=lambda p: ivf_persist(
                survivors, p, centroid_stride=stride
            ),
            probe=lambda root: sorted(
                map(
                    tuple,
                    G.ivf_gen_probe(
                        spark, root, queries_df, k=5, n_probe=2
                    ).collect(),
                )
            ),
            touched=lambda df, root: _touched_partitions(
                spark, root, df, "vec_id", "centroid_id"
            ),
            id_col="vec_id",
        )
    from mbai_gdb_spark.ops.similarity import ivfpq_persist

    return dict(
        corpus=emb,
        small=small,
        bulk=bulk,
        survivors=survivors,
        build=lambda root: G.ivfpq_gen_build(
            emb, root, centroid_stride=stride, code_stride=7
        ),
        delete=lambda df, root: G.ivfpq_gen_delete(df, root),
        rebuild=lambda p: ivfpq_persist(
            survivors, p, centroid_stride=stride, code_stride=7
        ),
        probe=lambda root: sorted(
            map(
                tuple,
                G.ivfpq_gen_probe(
                    spark, root, queries_df, k=5, n_probe=2
                ).collect(),
            )
        ),
        touched=lambda df, root: _touched_partitions(
            spark, root, df, "vec_id", "centroid_id"
        ),
        id_col="vec_id",
    )


def run_family(spark, family: str, sf_dir: str, reps: int,
               stride: int = 50) -> dict:
    ops = _family_ops(spark, family, sf_dir, reps, stride)
    n_rows = ops["corpus"].count()
    work = tempfile.mkdtemp(prefix=f"mbai_lifecycle_{family}_")
    root = os.path.join(work, "inc")
    rebuilt = os.path.join(work, "rebuilt")
    try:
        t0 = time.perf_counter()
        ops["build"](root)
        build_secs = round(time.perf_counter() - t0, 3)

        _, probe_before = _timed(ops["probe"], root)

        small_dirs = ops["touched"](ops["small"], root)
        t0 = time.perf_counter()
        ops["delete"](ops["small"], root)
        delete_small_secs = round(time.perf_counter() - t0, 3)

        bulk_dirs = ops["touched"](ops["bulk"], root)
        t0 = time.perf_counter()
        ops["delete"](ops["bulk"], root)
        delete_bulk_secs = round(time.perf_counter() - t0, 3)

        rows_after, probe_after = _timed(ops["probe"], root)

        t0 = time.perf_counter()
        G.generation_build(rebuilt, ops["rebuild"])
        rebuild_secs = round(time.perf_counter() - t0, 3)
        rows_rebuilt, _ = _timed(ops["probe"], rebuilt)

        return {
            "family": family,
            "sf_dir": sf_dir,
            "n_rows": n_rows,
            "build_secs": build_secs,
            "delete_small": {
                "n_rows": ops["small"].count(),
                "secs": delete_small_secs,
                "touched_dirs": small_dirs,
                "rebuild_over_delete": round(
                    rebuild_secs / delete_small_secs, 2
                ),
            },
            "delete_bulk": {
                "n_rows": ops["bulk"].count(),
                "secs": delete_bulk_secs,
                "touched_dirs": bulk_dirs,
                "rebuild_over_delete": round(
                    rebuild_secs / delete_bulk_secs, 2
                ),
            },
            "rebuild_without_secs": rebuild_secs,
            "probe_before_secs": probe_before,
            "probe_after_secs": probe_after,
            "delete_equals_rebuild": rows_after == rows_rebuilt,
            "reps": reps,
            "centroid_stride": (
                stride if family in ("ivf", "ivfpq") else None
            ),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _timed(fn, *a):
    t0 = time.perf_counter()
    out = fn(*a)
    return out, round(time.perf_counter() - t0, 3)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf_dir = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(repo, ".localdata", "sf1")
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    fams = sys.argv[3] if len(sys.argv) > 3 else "lsh"
    stride = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    families = list(_FAMILIES) if fams == "all" else [
        f for f in fams.split(",") if f
    ]
    unknown = set(families) - set(_FAMILIES)
    if unknown:
        raise SystemExit(f"unknown families: {sorted(unknown)}")

    spark = get_spark("lifecycle-sf1")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    out = {}
    for family in families:
        rec = run_family(spark, family, sf_dir, reps, stride)
        key = f"{family}_delete_vs_rebuild_sf1" + (
            f"_x{reps}" if reps > 1 else ""
        )
        bench._merge_into_full_battery({key: rec})
        out[key] = rec
        print(json.dumps({key: rec}), flush=True)
    if len(out) > 1:
        print(json.dumps({"families": list(out)}))


if __name__ == "__main__":
    main()
