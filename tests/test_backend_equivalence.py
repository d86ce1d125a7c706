"""Backend equivalence (round 12): the SAME lifecycle run through the
hardlink-generation backend (indexgen) and the object-store manifest
backend (indexman) must serve bit-identical probes, for ALL FOUR
persisted index families — the property that makes the manifest backend
a drop-in portability layer rather than a second implementation to
re-verify (the bare-layout operators are shared; only the commit
mechanism differs: hardlink clone + pointer rename vs immutable objects
+ manifest PUT).

Also: takedown_documents routes per-entry through either backend
(kwargs backend="manifest"), so one removal request can span a local
hardlink tier and an object-store tier in the same call.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark import indexman as M
from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    lsh_buckets_from_signature,
    minhash_signature_array,
)
from mbai_gdb_spark.ops.text import tokens

_WORDS = (
    "zebra cat dog river moon data model stream event quality table scan "
    "sort merge batch night rain snow graph index"
).split()
_QS = [("q1", "zebra river"), ("q2", "data stream quality"), ("q3", "moon")]


def _corpus(seed: int, n: int = 30):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choices(_WORDS, k=rng.randint(4, 12))))
        for i in range(n)
    ]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _vecs(spark, seed, n=120, dim=64):
    rng = random.Random(seed)
    rows = [
        (i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


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


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_bm25_lifecycle_backend_equivalence(spark, tmp_path):
    rows = _corpus(3)
    even = [r for r in rows if r[0] % 2 == 0]
    odd = [r for r in rows if r[0] % 2 == 1]
    upd_ids = [1, 4, 9]
    old = [r for r in rows if r[0] in upd_ids]
    new = [(i, t + " merge scan window") for i, t in old]
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")

    g_root, m_root = str(tmp_path / "g"), str(tmp_path / "m")
    G.bm25_gen_build(_docs(spark, even), g_root, n_buckets=8)
    G.bm25_gen_append(_docs(spark, odd), g_root)
    G.bm25_gen_update(_docs(spark, old), _docs(spark, new), g_root)

    M.bm25_man_build(_docs(spark, even), m_root, n_buckets=8)
    M.bm25_man_append(_docs(spark, odd), m_root)
    M.bm25_man_update(_docs(spark, old), _docs(spark, new), m_root)

    assert _rows(G.bm25_gen_probe(spark, g_root, qs, k=10)) == _rows(
        M.bm25_man_probe(spark, m_root, qs, k=10)
    )


def test_ivf_lifecycle_backend_equivalence(spark, tmp_path):
    corpus = _vecs(spark, 5)
    even = corpus.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    odd = corpus.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
    old = corpus.filter(F.col("vec_id").isin([7, 13, 23]))
    new = old.select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    qs = corpus.filter(F.col("vec_id") < 5)

    g_root, m_root = str(tmp_path / "g"), str(tmp_path / "m")
    G.ivf_gen_build(even, g_root, centroid_stride=50)
    G.ivf_gen_append(odd, g_root)
    G.ivf_gen_update(old, new, g_root)

    M.ivf_man_build(even, m_root, centroid_stride=50)
    M.ivf_man_append(odd, m_root)
    M.ivf_man_update(old, new, m_root)

    assert _rows(G.ivf_gen_probe(spark, g_root, qs, k=5, n_probe=2)) == _rows(
        M.ivf_man_probe(spark, m_root, qs, k=5, n_probe=2)
    )


def test_ivfpq_lifecycle_backend_equivalence(spark, tmp_path):
    corpus = _vecs(spark, 9)
    even = corpus.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 0)
    odd = corpus.filter(F.pmod(F.col("vec_id"), F.lit(2)) == 1)
    old = corpus.filter(F.col("vec_id").isin([7, 13, 23]))
    new = old.select(
        "vec_id", F.transform("embedding", lambda x: -x).alias("embedding")
    )
    qs = corpus.filter(F.col("vec_id") < 5)

    g_root, m_root = str(tmp_path / "g"), str(tmp_path / "m")
    G.ivfpq_gen_build(even, g_root, centroid_stride=50, code_stride=7)
    G.ivfpq_gen_append(odd, g_root)
    G.ivfpq_gen_update(old, new, g_root)

    M.ivfpq_man_build(even, m_root, centroid_stride=50, code_stride=7)
    M.ivfpq_man_append(odd, m_root)
    M.ivfpq_man_update(old, new, m_root)

    assert _rows(
        G.ivfpq_gen_probe(spark, g_root, qs, k=5, n_probe=2)
    ) == _rows(M.ivfpq_man_probe(spark, m_root, qs, k=5, n_probe=2))


def test_lsh_lifecycle_backend_equivalence(spark, tmp_path):
    rows = _corpus(13, n=36)
    third0 = [r for r in rows if r[0] % 3 == 0]
    third1 = [r for r in rows if r[0] % 3 == 1]
    probe = [r for r in rows if r[0] % 3 == 2]
    dels = [r for r in rows if r[0] % 3 != 2 and r[0] % 5 == 0]

    g_root, m_root = str(tmp_path / "g"), str(tmp_path / "m")
    G.lsh_gen_build(_buckets(spark, third0), g_root, n_buckets=8)
    G.lsh_gen_append(_buckets(spark, third1), g_root)
    G.lsh_gen_delete(_buckets(spark, dels), g_root)

    M.lsh_man_build(_buckets(spark, third0), m_root, n_buckets=8)
    M.lsh_man_append(_buckets(spark, third1), m_root)
    M.lsh_man_delete(_buckets(spark, dels), m_root)

    pb = _buckets(spark, probe)
    assert _rows(
        G.lsh_gen_probe(spark, g_root, pb, max_bucket_size=50)
    ) == _rows(M.lsh_man_probe(spark, m_root, pb, max_bucket_size=50))


def test_takedown_mixed_backends(spark, tmp_path):
    """One removal request spanning a hardlink-tier BM25 index and a
    manifest-tier (object-store) BM25 index in the SAME
    takedown_documents call."""
    rows = _corpus(17, n=20)
    take = [r for r in rows if r[0] % 5 == 0]
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")

    g_root, m_root = str(tmp_path / "g"), str(tmp_path / "m")
    G.bm25_gen_build(_docs(spark, rows), g_root, n_buckets=8)
    M.bm25_man_build(_docs(spark, rows), m_root, n_buckets=8)

    applied = G.takedown_documents(
        [
            ("bm25", _docs(spark, take), g_root),
            ("bm25", _docs(spark, take), m_root, {"backend": "manifest"}),
        ]
    )
    assert [a["backend"] for a in applied] == ["generation", "manifest"]
    assert applied[1]["generation"].startswith("man-")

    got_g = _rows(G.bm25_gen_probe(spark, g_root, qs, k=10))
    got_m = _rows(M.bm25_man_probe(spark, m_root, qs, k=10))
    assert got_g == got_m
    taken = {i for i, _ in take}
    served = {
        r["doc_id"]
        for r in G.bm25_gen_probe(spark, g_root, qs, k=10).collect()
    }
    assert served and not (served & taken)
