"""Bucketed LSH index lifecycle (round 11): build / O(delta) append /
physical delete / partition-pruned probe, plus the generation wrappers.

Contracts under test:
- probe after any build→append→delete sequence equals a probe against
  an index rebuilt over the surviving corpus (property-tested over
  random interleavings);
- probe ∪ the pre-indexed corpus's own pairs equals the full-corpus
  LSH candidate pairs restricted to batch-touching pairs (no recall
  loss from incrementality);
- the probe reads ONLY the partition directories the batch's buckets
  hash to — physically proven by deleting the unprobed directories;
- refusal guards: duplicate-id append, wrong-banding delete, absent-id
  delete, mixed-band frames all raise before any mutation;
- generation wrappers: a crashed mutation leaves the pointer serving
  the previous generation's exact results.
"""

from __future__ import annotations

import os
import random
import shutil

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark import indexgen as G
from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    lsh_buckets_from_signature,
    lsh_candidate_pairs,
    lsh_index_append_bucketed,
    lsh_index_delete_bucketed,
    lsh_index_persist_bucketed,
    lsh_probe_bucketed,
    minhash_signature_array,
    minhash_signatures,
    char_poly_token_ids,
)
from mbai_gdb_spark.ops.text import tokens

_WORDS = (
    "zebra cat dog river moon data model stream event quality table scan "
    "sort merge batch night rain snow graph index"
).split()


def _rows(seed: int, start: int, n: int, dup_every: int = 4):
    """n docs; every dup_every-th repeats the previous text (near-dup
    clusters exist by construction)."""
    rng = random.Random(seed)
    out = []
    for i in range(n):
        if out and i % dup_every == 0:
            text = out[-1][1]
        else:
            text = " ".join(rng.choices(_WORDS, k=rng.randint(5, 12)))
        out.append((start + i, text))
    return out


def _buckets(spark, rows):
    """(doc_id, band, bucket) via the map-only array path — the shape
    the registry query feeds the index."""
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


def _pairs(df):
    return sorted((r.id_a, r.id_b) for r in df.collect())


# ---------------------------------------------------------------------------
# Probe equivalences
# ---------------------------------------------------------------------------


def test_probe_equals_rebuild_after_append_and_delete(spark, tmp_path):
    """build(A) + append(B) + delete(D) probed with P  ==  a fresh index
    over (A ∪ B) \\ D probed with P."""
    a = _rows(1, 0, 14)
    b = _rows(2, 100, 10)
    d = [r for r in a if r[0] % 5 == 0] + [r for r in b if r[0] % 7 == 0]
    p = _rows(3, 500, 8) + [(600, a[3][1])]  # one probe doc near-dups A
    path = str(tmp_path / "idx")
    lsh_index_persist_bucketed(_buckets(spark, a), path, n_buckets=16)
    lsh_index_append_bucketed(_buckets(spark, b), path)
    lsh_index_delete_bucketed(_buckets(spark, d), path)
    got = _pairs(lsh_probe_bucketed(spark, _buckets(spark, p), path))

    survivors = [r for r in a + b if r not in d]
    fresh = str(tmp_path / "fresh")
    lsh_index_persist_bucketed(_buckets(spark, survivors), fresh, n_buckets=16)
    want = _pairs(lsh_probe_bucketed(spark, _buckets(spark, p), fresh))
    assert got == want
    assert (3, 600) in got  # the implanted near-dup survives the delete


def test_probe_matches_full_corpus_lsh(spark, tmp_path):
    """No recall loss from incrementality: probe pairs == full-corpus
    LSH pairs restricted to pairs touching the batch (long-format path
    as the independent oracle)."""
    corpus = _rows(5, 0, 20)
    batch = _rows(6, 300, 6) + [(400, corpus[2][1])]
    path = str(tmp_path / "idx2")
    lsh_index_persist_bucketed(_buckets(spark, corpus), path, n_buckets=16)
    got = set(_pairs(lsh_probe_bucketed(spark, _buckets(spark, batch), path)))

    def _sigs(rows):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        toks = docs.select(
            "doc_id", F.explode(tokens("text")).alias("token")
        ).filter(F.col("token") != "")
        return minhash_signatures(char_poly_token_ids(toks), "doc_id")

    full = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(_sigs(corpus + batch), "doc_id").collect()
    }
    batch_ids = {r[0] for r in batch}
    assert got == {p for p in full if p[0] in batch_ids or p[1] in batch_ids}


@pytest.mark.parametrize("seed", [11, 29])
def test_random_interleavings_property(spark, tmp_path, seed):
    """Random append/delete interleavings: the index always probes like
    a rebuild over the surviving corpus."""
    rng = random.Random(seed)
    base = _rows(seed, 0, 12)
    path = str(tmp_path / f"idx_{seed}")
    lsh_index_persist_bucketed(_buckets(spark, base), path, n_buckets=8)
    alive = list(base)
    next_id = 1000
    for step in range(4):
        if rng.random() < 0.5 and len(alive) > 4:
            dels = rng.sample(alive, k=rng.randint(1, 3))
            lsh_index_delete_bucketed(_buckets(spark, dels), path)
            alive = [r for r in alive if r not in dels]
        else:
            adds = _rows(seed * 31 + step, next_id, rng.randint(1, 4))
            next_id += 10
            lsh_index_append_bucketed(_buckets(spark, adds), path)
            alive += adds
    probe = _rows(99, 5000, 5) + [(6000, alive[0][1])]
    fresh = str(tmp_path / f"fresh_{seed}")
    lsh_index_persist_bucketed(_buckets(spark, alive), fresh, n_buckets=8)
    assert _pairs(
        lsh_probe_bucketed(spark, _buckets(spark, probe), path)
    ) == _pairs(lsh_probe_bucketed(spark, _buckets(spark, probe), fresh))


def test_bucket_cap_on_union(spark, tmp_path):
    """max_bucket_size caps on the UNION (index + batch) bucket size:
    8 indexed + 3 batched identical docs → union bucket of 11 → no
    pairs at cap 10, pairs at cap 12."""
    text = "same words in every single document here"
    path = str(tmp_path / "idx3")
    lsh_index_persist_bucketed(
        _buckets(spark, [(i, text) for i in range(8)]), path, n_buckets=8
    )
    batch = _buckets(spark, [(100 + i, text) for i in range(3)])
    assert (
        lsh_probe_bucketed(spark, batch, path, max_bucket_size=10).count() == 0
    )
    assert lsh_probe_bucketed(spark, batch, path, max_bucket_size=12).count() > 0


# ---------------------------------------------------------------------------
# Physical pruning proof
# ---------------------------------------------------------------------------


def test_probe_never_reads_unprobed_dirs(spark, tmp_path):
    """Physically delete every partition directory the batch does NOT
    hash to; the probe must still return the exact result — proof the
    partition filter prunes at the directory level."""
    corpus = _rows(13, 0, 20)
    batch = _rows(14, 300, 4) + [(400, corpus[0][1])]
    path = str(tmp_path / "idx4")
    lsh_index_persist_bucketed(_buckets(spark, corpus), path, n_buckets=32)
    want = _pairs(lsh_probe_bucketed(spark, _buckets(spark, batch), path))
    assert want  # non-trivial

    bb = _buckets(spark, batch).withColumn(
        "pbkt",
        F.pmod(
            char_poly_id(
                F.concat_ws("_", F.col("band").cast("string"), F.col("bucket"))
            ),
            F.lit(32),
        ).cast("int"),
    )
    needed = {r["pbkt"] for r in bb.select("pbkt").distinct().collect()}
    removed = 0
    for nm in os.listdir(path):
        if nm.startswith("pbkt=") and int(nm.split("=")[1]) not in needed:
            shutil.rmtree(os.path.join(path, nm))
            removed += 1
    assert removed > 0  # the proof is vacuous if everything was probed
    assert _pairs(lsh_probe_bucketed(spark, _buckets(spark, batch), path)) == want


def test_emptied_index_probes_to_typed_empty(spark, tmp_path):
    corpus = _rows(17, 0, 4, dup_every=100)
    path = str(tmp_path / "idx5")
    lsh_index_persist_bucketed(_buckets(spark, corpus), path, n_buckets=8)
    lsh_index_delete_bucketed(_buckets(spark, corpus), path)
    out = lsh_probe_bucketed(
        spark, _buckets(spark, [(900, "novel words only")]), path
    )
    assert out.count() == 0
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint",
        "bigint",
    ]


# ---------------------------------------------------------------------------
# Refusal guards
# ---------------------------------------------------------------------------


def test_append_refuses_duplicate_ids(spark, tmp_path):
    corpus = _rows(19, 0, 6)
    path = str(tmp_path / "idx6")
    lsh_index_persist_bucketed(_buckets(spark, corpus), path, n_buckets=8)
    with pytest.raises(ValueError, match="insert-only"):
        lsh_index_append_bucketed(_buckets(spark, corpus[:2]), path)


def test_delete_refuses_wrong_text_and_absent_ids(spark, tmp_path):
    corpus = _rows(23, 0, 6, dup_every=100)
    path = str(tmp_path / "idx7")
    lsh_index_persist_bucketed(_buckets(spark, corpus), path, n_buckets=8)
    wrong = [(corpus[0][0], "totally different text for this doc")]
    with pytest.raises(ValueError, match="exact"):
        lsh_index_delete_bucketed(_buckets(spark, wrong), path)
    with pytest.raises(ValueError, match="exact"):
        lsh_index_delete_bucketed(
            _buckets(spark, [(777, "never indexed words")]), path
        )
    # the refused deletes mutated nothing: probe ≡ untouched fresh index
    fresh = str(tmp_path / "fresh7")
    lsh_index_persist_bucketed(_buckets(spark, corpus), fresh, n_buckets=8)
    pb = _buckets(spark, _rows(24, 300, 3) + [(800, corpus[0][1])])
    assert _pairs(lsh_probe_bucketed(spark, pb, path)) == _pairs(
        lsh_probe_bucketed(spark, pb, fresh)
    )


def test_banding_mismatch_refused(spark, tmp_path):
    corpus = _rows(29, 0, 6)
    path = str(tmp_path / "idx8")
    lsh_index_persist_bucketed(_buckets(spark, corpus), path, n_buckets=8)
    docs = spark.createDataFrame(_rows(30, 100, 3), "doc_id long, text string")
    two_band = lsh_buckets_from_signature(
        docs.select(
            "doc_id",
            minhash_signature_array(
                F.transform(
                    F.array_distinct(tokens("text")), lambda x: char_poly_id(x)
                ),
                n_hashes=8,
            ).alias("signature"),
        ),
        "doc_id",
        "signature",
        4,
    )
    with pytest.raises(ValueError, match="frozen at build"):
        lsh_index_append_bucketed(two_band, path)


def test_empty_build_refused(spark, tmp_path):
    empty = _buckets(spark, [(0, "x")]).filter(F.lit(False))
    with pytest.raises(ValueError, match="empty corpus"):
        lsh_index_persist_bucketed(empty, str(tmp_path / "idx9"))


# ---------------------------------------------------------------------------
# Generation management
# ---------------------------------------------------------------------------


def test_generation_lifecycle_and_crash(spark, tmp_path):
    """build → append → delete through the generation wrappers; then a
    crashed delete (wrong text) leaves the pointer serving the previous
    generation's exact results."""
    a = _rows(31, 0, 10)
    b = _rows(32, 100, 6)
    d = [a[1], a[4]]
    root = str(tmp_path / "root")
    G.lsh_gen_build(_buckets(spark, a), root, n_buckets=8)
    G.lsh_gen_append(_buckets(spark, b), root)
    G.lsh_gen_delete(_buckets(spark, d), root)
    pb = _buckets(spark, _rows(33, 300, 4) + [(500, a[0][1])])
    served = _pairs(G.lsh_gen_probe(spark, root, pb))
    survivors = [r for r in a + b if r not in d]
    fresh = str(tmp_path / "fresh_root")
    lsh_index_persist_bucketed(_buckets(spark, survivors), fresh, n_buckets=8)
    assert served == _pairs(lsh_probe_bucketed(spark, pb, fresh))

    before = G.current_generation_name(root)
    with pytest.raises(ValueError):
        G.lsh_gen_delete(
            _buckets(spark, [(a[0][0], "not the indexed text at all")]), root
        )
    assert G.current_generation_name(root) == before
    assert _pairs(G.lsh_gen_probe(spark, root, pb)) == served
