"""Round-10 self-review regressions.

The load-bearing invariant of the generation design is that PUBLISHED
generations are immutable: mutations run in hardlink clones, and a
hardlink shares the inode — so an operator that ever wrote INTO an
existing file (instead of adding/unlinking) would corrupt the previous
generation through the link.  These tests pin byte-level immutability
of the previous generation across all three mutation kinds, plus the
smaller review findings (prune keep=1, tick on an empty feed head,
compact on a path that only ever saw empty batches)."""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark.io import read_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _snapshot(tree: str) -> dict:
    """path → (size, sha1) for every file — byte-level identity, not
    just inode sharing (a truncate-through-hardlink keeps the inode)."""
    out = {}
    for cur, _dirs, files in os.walk(tree):
        for f in files:
            p = os.path.join(cur, f)
            with open(p, "rb") as fh:
                out[os.path.relpath(p, tree)] = (
                    os.path.getsize(p),
                    hashlib.sha1(fh.read()).hexdigest(),
                )
    return out


def test_published_generations_are_byte_immutable(spark, tmp_path):
    """Append, delete, AND compaction must leave every byte of every
    prior generation untouched (mutations add files or unlink links —
    never write through one)."""
    docs = _docs(spark)
    root = str(tmp_path / "root")
    g1 = G.bm25_gen_build(
        docs.filter(F.col("doc_id") % 2 == 0), root, n_buckets=8, positions=True
    )
    snap1 = _snapshot(g1)

    g2 = G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root)
    assert _snapshot(g1) == snap1, "append wrote through a hardlink into gen1"
    snap2 = _snapshot(g2)

    # Compact while fragmented (build + append = 2 files/dir) — a later
    # delete would defragment its touched buckets as a side effect.
    assert G.gen_compact(spark, root, "bucket"), "fixture must be fragmented"
    assert _snapshot(g1) == snap1, "compaction wrote through a hardlink into gen1"
    assert _snapshot(g2) == snap2, "compaction wrote through a hardlink into gen2"
    g3 = G.current_generation(root)
    snap3 = _snapshot(g3)

    G.bm25_gen_delete(docs.filter(F.col("doc_id") % 10 == 3), root)
    assert _snapshot(g1) == snap1, "delete wrote through a hardlink into gen1"
    assert _snapshot(g2) == snap2, "delete wrote through a hardlink into gen2"
    assert _snapshot(g3) == snap3, "delete wrote through a hardlink into gen3"


def test_prune_keep_one_leaves_only_current(spark, tmp_path):
    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs.filter(F.col("doc_id") % 3 == 0), root, n_buckets=8)
    G.bm25_gen_append(docs.filter(F.col("doc_id") % 3 == 1), root)
    G.bm25_gen_append(docs.filter(F.col("doc_id") % 3 == 2), root)
    removed = G.prune_generations(root, keep=1)
    assert removed == ["gen-000001", "gen-000002"]
    assert G.list_generations(root) == ["gen-000003"]
    qs = spark.createDataFrame([("q", "the")], "query_id string, qtext string")
    assert G.bm25_gen_probe(spark, root, qs, k=3).count() > 0


def test_compaction_tick_tolerates_index_of_only_empty_batches(spark, tmp_path):
    """compact_every over a feed whose first batches are empty: the
    marker dir exists, no bucket dirs — the tick must no-op, not
    FileNotFoundError."""
    from mbai_gdb_spark.streaming.search import (
        _with_compaction_tick,
        index_batch_applier,
    )

    path = str(tmp_path / "idx")
    applier = _with_compaction_tick(
        index_batch_applier(path, n_buckets=8), path, "bucket", 1
    )
    empty = _docs(spark).filter(F.lit(False))
    applier(empty, 0)  # marker written, tick runs on a bucket-less dir
    applier(empty, 1)
    assert os.path.exists(os.path.join(path, "_applied_batch"))


def test_gen_append_tag_replay_publishes_identical_generation(spark, tmp_path):
    """A replayed tagged append inside the generation machinery is a
    no-op merge published as a content-identical generation — probes
    unchanged, n_docs not double-counted."""
    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs.filter(F.col("doc_id") % 2 == 0), root, n_buckets=8)
    G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root, tag="b1")
    qs = spark.createDataFrame(
        [("q1", "the data model")], "query_id string, qtext string"
    )
    before = sorted(map(tuple, G.bm25_gen_probe(spark, root, qs, k=10).collect()))
    meta_before = spark.read.parquet(
        os.path.join(G.current_generation(root), "_meta")
    ).first()
    G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root, tag="b1")
    after = sorted(map(tuple, G.bm25_gen_probe(spark, root, qs, k=10).collect()))
    meta_after = spark.read.parquet(
        os.path.join(G.current_generation(root), "_meta")
    ).first()
    assert after == before
    assert (meta_before["n_docs"], meta_before["total_toks"]) == (
        meta_after["n_docs"],
        meta_after["total_toks"],
    )


# ---------------------------------------------------------------------------
# Adversarial review findings (round-10 second pass)
# ---------------------------------------------------------------------------


def test_appends_refuse_crashed_maintenance_residue(spark, tmp_path):
    """Appends must not merge into a layout holding crashed-compaction
    residue or an in-flight delete — the dup guard would read a missing
    or half-filtered partition dir and the merge would compound damage
    every probe correctly refuses."""
    import pytest
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.text import bm25_index_append, bm25_index_persist
    from mbai_gdb_spark.ops.similarity import ivfpq_append, ivfpq_persist

    docs = _docs(spark)
    path = str(tmp_path / "idx")
    bm25_index_persist(docs.filter(F.col("doc_id") % 2 == 0), path, n_buckets=8)
    os.makedirs(os.path.join(path, "_compact_old_bucket=3"))
    with pytest.raises(RuntimeError, match="crashed-compaction residue"):
        bm25_index_append(docs.filter(F.col("doc_id") % 2 == 1), path)
    os.rmdir(os.path.join(path, "_compact_old_bucket=3"))
    with open(os.path.join(path, "_delete_inflight"), "w"):
        pass
    with pytest.raises(RuntimeError, match="IN-FLIGHT physical delete"):
        bm25_index_append(docs.filter(F.col("doc_id") % 2 == 1), path)

    emb = read_table(spark, SF_DIR, "embeddings")
    vidx = str(tmp_path / "vidx")
    ivfpq_persist(emb.filter(F.col("vec_id") % 2 == 0), vidx, vectorized=False)
    with open(os.path.join(vidx, "_delete_inflight"), "w"):
        pass
    with pytest.raises(RuntimeError, match="IN-FLIGHT physical delete"):
        ivfpq_append(emb.filter(F.col("vec_id") % 2 == 1), vidx, vectorized=False)


def test_compaction_refuses_inflight_delete(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from mbai_gdb_spark.io import compact_partitioned

    path = str(tmp_path / "data")
    df = spark.range(20).withColumn("bucket", (F.col("id") % 2).cast("int"))
    df.repartition(2).write.partitionBy("bucket").parquet(path)
    df.repartition(2).write.mode("append").partitionBy("bucket").parquet(path)
    with open(os.path.join(path, "_delete_inflight"), "w"):
        pass
    with pytest.raises(RuntimeError, match="IN-FLIGHT physical delete"):
        compact_partitioned(spark, path, "bucket")


def test_generation_numbering_survives_the_seventh_digit(spark, tmp_path):
    """gen-999999 → gen-1000000 must list, order, mutate, and prune
    numerically (a 6-digit-exact pattern made the 7-digit dir invisible
    and wedged every later mutation on FileExistsError)."""
    from pyspark.sql import functions as F

    docs = _docs(spark)
    root = str(tmp_path / "root")
    G.bm25_gen_build(docs.filter(F.col("doc_id") % 2 == 0), root, n_buckets=8)
    gens_dir = os.path.join(root, "_generations")
    os.rename(
        os.path.join(gens_dir, "gen-000001"), os.path.join(gens_dir, "gen-999999")
    )
    with open(os.path.join(root, "_current"), "w") as f:
        f.write("gen-999999")

    g = G.bm25_gen_append(docs.filter(F.col("doc_id") % 2 == 1), root)
    assert os.path.basename(g) == "gen-1000000"
    assert G.list_generations(root) == ["gen-999999", "gen-1000000"]
    assert G.current_generation_name(root) == "gen-1000000"
    # One more mutation on top of the 7-digit current, then prune.
    G.bm25_gen_delete(docs.filter(F.col("doc_id") % 10 == 3), root)
    assert G.current_generation_name(root) == "gen-1000001"
    assert G.prune_generations(root, keep=1) == ["gen-999999", "gen-1000000"]
    qs = spark.createDataFrame([("q", "the")], "query_id string, qtext string")
    assert G.bm25_gen_probe(spark, root, qs, k=3).count() > 0


def test_gen_stream_prunes_history(spark, tmp_path):
    """A long drain must not leak one generation tree per micro-batch:
    the runners prune to keep_generations as they go."""
    from mbai_gdb_spark.streaming.search import (
        run_streaming_bm25_generations_available_now,
    )

    docs = _docs(spark)
    src = str(tmp_path / "feed")
    docs.repartition(6).write.parquet(src)
    root = str(tmp_path / "root")
    run_streaming_bm25_generations_available_now(
        spark, src, docs.schema, root, n_buckets=8, keep_generations=2
    )
    assert len(G.list_generations(root)) <= 2
    qs = spark.createDataFrame([("q", "the")], "query_id string, qtext string")
    assert G.bm25_gen_probe(spark, root, qs, k=3).count() > 0


def test_isolate_only_zero_runs_is_side_effect_free(tmp_path, monkeypatch):
    """--isolate-runs 0 is the validation-only pass (test_advice_r9
    drives it against the repo): it must never touch the round's
    BENCH_full record (a persist added this round briefly made it
    clobber the genuine isolated evidence with empty lists)."""
    import json
    import subprocess
    import sys as _sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = str(tmp_path / "full.json")
    seeded = {"queries": {"a": 1.0}, "isolated": {"a": {"cold": [1.0], "warm": [0.5]}}}
    with open(p, "w") as f:
        json.dump(seeded, f)
    proc = subprocess.run(
        [
            _sys.executable,
            os.path.join(repo, "bench.py"),
            "--isolate-only",
            "a1_pricing_summary",
            "--isolate-runs",
            "0",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env={**os.environ, "SPARK_GRAFT_BENCH_FULL": p},
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    with open(p) as f:
        assert json.load(f) == seeded


def test_merge_into_full_battery_accumulates_isolated_per_name(
    tmp_path, monkeypatch
):
    """Two --isolate-only runs of DIFFERENT queries must both survive in
    the round's record (per-name merge), while re-measuring a name
    replaces that name's entry."""
    import importlib.util
    import json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_merge_ut", os.path.join(repo, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    p = str(tmp_path / "full.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_FULL", p)

    bench._merge_into_full_battery({"isolated": {"a": {"cold": [1], "warm": [2]}}})
    bench._merge_into_full_battery({"isolated": {"b": {"cold": [3], "warm": [4]}}})
    bench._merge_into_full_battery({"isolated": {"a": {"cold": [9], "warm": [8]}}})
    with open(p) as f:
        out = json.load(f)
    assert out["isolated"] == {
        "a": {"cold": [9], "warm": [8]},
        "b": {"cold": [3], "warm": [4]},
    }
