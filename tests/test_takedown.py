"""takedown_documents (round-12 verdict stretch #8): one driver call
enforcing a removal request across multiple index families.

- happy path: one call deletes the same doc ids from a BM25 and an LSH
  index; each root publishes exactly ONE new generation and neither
  serving path returns the ids afterwards;
- partial-failure contract: entries apply in order; a failing delete
  (absent id → the verified delete refuses) raises with the applied
  prefix named, earlier roots stay PUBLISHED and correct, the failing
  root's pointer is untouched, and retrying only the remaining entry
  converges;
- unknown kind refuses before any mutation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    lsh_buckets_from_signature,
    minhash_signature_array,
)
from mbai_gdb_spark.ops.text import tokens

_ROWS = [
    (0, "zebra cat dog river moon"),
    (1, "moon data model stream event"),
    (2, "event quality table scan sort"),
    (3, "sort merge batch night rain"),
    (4, "rain snow graph index zebra"),
    (5, "zebra data table night snow"),
    (6, "cat stream scan batch graph"),
    (7, "dog model sort rain index"),
]
_TAKE = [3, 7]


def _docs(spark, rows=_ROWS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _buckets(spark, rows):
    docs = _docs(spark, rows)
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


def _taken(rows=_ROWS, ids=_TAKE):
    return [r for r in rows if r[0] in ids]


def _stand_up(spark, tmp_path):
    bm25_root = str(tmp_path / "bm25")
    lsh_root = str(tmp_path / "lsh")
    G.bm25_gen_build(_docs(spark), bm25_root, n_buckets=4)
    G.lsh_gen_build(_buckets(spark, _ROWS), lsh_root, n_buckets=8)
    return bm25_root, lsh_root


def _bm25_doc_ids(spark, root):
    qs = spark.createDataFrame(
        [("q1", "zebra rain sort"), ("q2", "moon data graph")],
        "query_id string, qtext string",
    )
    return {
        r["doc_id"] for r in G.bm25_gen_probe(spark, root, qs, k=10).collect()
    }


def test_takedown_happy_path_two_families(spark, tmp_path):
    bm25_root, lsh_root = _stand_up(spark, tmp_path)
    assert _bm25_doc_ids(spark, bm25_root) & set(_TAKE)

    applied = G.takedown_documents(
        [
            ("bm25", _docs(spark, _taken()), bm25_root),
            ("lsh", _buckets(spark, _taken()), lsh_root),
        ]
    )
    assert [a["kind"] for a in applied] == ["bm25", "lsh"]
    # exactly one new generation per root
    assert G.current_generation_name(bm25_root) == "gen-000002"
    assert G.current_generation_name(lsh_root) == "gen-000002"
    # no serving surface returns the taken-down ids: probe the LSH
    # index with a SURVIVOR batch (a batch containing the taken-down
    # docs would rightly pair against its own batch rows — the index
    # guarantee is about the INDEX side)
    assert not (_bm25_doc_ids(spark, bm25_root) & set(_TAKE))
    survivors = [r for r in _ROWS if r[0] not in _TAKE]
    rows = G.lsh_gen_probe(
        spark, lsh_root, _buckets(spark, survivors)
    ).collect()
    hit = {r["id_a"] for r in rows} | {r["id_b"] for r in rows}
    assert hit  # near-dup structure still present for survivors
    assert not (hit & set(_TAKE))


def test_takedown_partial_failure_keeps_prefix_and_retry_converges(
    spark, tmp_path
):
    bm25_root, lsh_root = _stand_up(spark, tmp_path)
    absent = [(999, "totally absent document text")]
    with pytest.raises(G.TakedownError, match="1 of 2 indexes") as ei:
        G.takedown_documents(
            [
                ("bm25", _docs(spark, _taken()), bm25_root),
                ("lsh", _buckets(spark, absent), lsh_root),  # refuses
            ]
        )
    # the exception carries the structured audit trail of what WAS
    # published (review find: the docstring promised it, the prose-only
    # message didn't deliver it)
    assert [a["kind"] for a in ei.value.applied] == ["bm25"]
    assert ei.value.applied[0]["generation"] == "gen-000002"
    # prefix published and correct; failing root untouched
    assert G.current_generation_name(bm25_root) == "gen-000002"
    assert G.current_generation_name(lsh_root) == "gen-000001"
    assert not (_bm25_doc_ids(spark, bm25_root) & set(_TAKE))
    # retry ONLY the remaining entry (corrected) converges; the failed
    # attempt's unpublished partial burned gen-000002 (generation names
    # are never reused), so the retry publishes gen-000003
    G.takedown_documents([("lsh", _buckets(spark, _taken()), lsh_root)])
    assert G.current_generation_name(lsh_root) == "gen-000003"
    survivors = [r for r in _ROWS if r[0] not in _TAKE]
    rows = G.lsh_gen_probe(
        spark, lsh_root, _buckets(spark, survivors)
    ).collect()
    hit = {r["id_a"] for r in rows} | {r["id_b"] for r in rows}
    assert not (hit & set(_TAKE))


def test_takedown_unknown_kind_refuses_before_any_mutation(spark, tmp_path):
    """(kind, backend) validation is UP FRONT: a typo in a LATER entry
    must not cost the earlier entries' published generations (review
    find — lazy validation published entry 1 before entry 2's
    ValueError, and a whole-list retry then refused on the
    already-deleted ids)."""
    bm25_root, lsh_root = _stand_up(spark, tmp_path)
    with pytest.raises(ValueError, match="unknown index kind"):
        G.takedown_documents(
            [("solr", _docs(spark, _taken()), bm25_root)]
        )
    with pytest.raises(ValueError, match="nothing was applied"):
        G.takedown_documents(
            [
                ("bm25", _docs(spark, _taken()), bm25_root),  # valid...
                ("solr", _docs(spark, _taken()), lsh_root),  # ...typo
            ]
        )
    # NOTHING published in either case
    assert G.current_generation_name(bm25_root) == "gen-000001"
    assert G.current_generation_name(lsh_root) == "gen-000001"
    with pytest.raises(ValueError, match="backend"):
        G.takedown_documents(
            [("bm25", _docs(spark, _taken()), bm25_root, {"backend": "s3"})]
        )
    assert G.current_generation_name(bm25_root) == "gen-000001"


def test_takedown_between_streaming_drains_converges(spark, tmp_path):
    """The ops scenario: an index maintained by the streaming drain
    receives a takedown BETWEEN drains (the writer lock serializes
    them), ingest continues afterwards, and the final serving state
    equals a batch rebuild over (everything ingested − everything
    taken down).  Exercises writer interleaving on one root: stream
    append generations, a takedown generation in between, more stream
    appends — all through the same pointer."""
    from pyspark.sql import functions as F

    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.ops.dedup import (
        lsh_index_persist_bucketed,
        lsh_probe_bucketed,
    )
    from mbai_gdb_spark.streaming.search import (
        run_streaming_lsh_generations_available_now,
    )
    from mbai_gdb_spark.queries_north import _doc_lsh_buckets

    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 3 < 2)
    probe = docs.filter(F.col("doc_id") % 3 == 2)
    feed1 = corpus.filter(F.col("doc_id") % 2 == 0)
    feed2 = corpus.filter(F.col("doc_id") % 2 == 1)
    take1 = feed1.filter(F.col("doc_id") % 15 == 0)
    take2 = feed2.filter(F.col("doc_id") % 15 == 0)

    src = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "root")
    feed1.repartition(2).write.parquet(src)
    run_streaming_lsh_generations_available_now(
        spark, src, corpus.schema, root, _doc_lsh_buckets,
        n_buckets=16, checkpoint=ckpt,
    )
    # takedown between drains — one generation on the same root
    G.takedown_documents([("lsh", _doc_lsh_buckets(take1), root)])

    feed2.repartition(2).write.mode("append").parquet(src)
    run_streaming_lsh_generations_available_now(
        spark, src, corpus.schema, root, _doc_lsh_buckets,
        n_buckets=16, checkpoint=ckpt,
    )
    G.takedown_documents([("lsh", _doc_lsh_buckets(take2), root)])

    got = sorted(
        map(
            tuple,
            G.lsh_gen_probe(
                spark, root, _doc_lsh_buckets(probe), max_bucket_size=50
            ).collect(),
        )
    )
    full = str(tmp_path / "full")
    survivors = corpus.filter(F.col("doc_id") % 15 != 0)
    lsh_index_persist_bucketed(_doc_lsh_buckets(survivors), full, n_buckets=16)
    want = sorted(
        map(
            tuple,
            lsh_probe_bucketed(
                spark, _doc_lsh_buckets(probe), full, max_bucket_size=50
            ).collect(),
        )
    )
    assert got == want and len(want) > 0


def test_takedown_lock_patience_waits_out_ingest_writer(spark, tmp_path):
    """The takedown-while-ingesting case from the other side: with
    lock_patience the removal request waits for the drain's in-flight
    batch merge to release the root's intent lock; without it, the
    documented fail-fast raise (wrapped in TakedownError with the
    applied prefix) stands."""
    import threading

    from mbai_gdb_spark.io import ConcurrentWriteError, _writer_lock
    from mbai_gdb_spark.ops.text import bm25_index_persist

    root = str(tmp_path / "bm25")
    G.generation_build(
        root, lambda p: bm25_index_persist(_docs(spark), p, n_buckets=8)
    )
    held = threading.Event()
    release = threading.Event()

    def hold():
        with _writer_lock(root):
            held.set()
            release.wait(30)

    th = threading.Thread(target=hold)
    th.start()
    try:
        assert held.wait(30)
        with pytest.raises(G.TakedownError) as ei:
            G.takedown_documents([("bm25", _docs(spark, _taken()), root)])
        assert isinstance(ei.value.__cause__, ConcurrentWriteError)
        assert ei.value.applied == []
        timer = threading.Timer(0.5, release.set)
        timer.start()
        applied = G.takedown_documents(
            [("bm25", _docs(spark, _taken()), root)], lock_patience=30.0
        )
        assert [a["generation"] for a in applied] == ["gen-000002"]
    finally:
        release.set()
        th.join(timeout=30)
