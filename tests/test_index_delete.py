"""Physical deletion for both persisted index layouts (round 10).

The contract: probe-after-delete is BIT-IDENTICAL to an index built
without the deleted rows (same frozen quantizers for IVF-PQ, where
deletion never retrains by design) — property-tested over random delete
sets.  Plus the refusal guards: wrong text, absent ids, duplicate ids,
token-less docs all raise instead of corrupting, and delete + re-append
is the documented update path (closing the BM25 disjoint-token re-add
hole)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.text import (
    bm25_index_append,
    bm25_index_delete,
    bm25_index_persist,
    bm25_probe_persisted,
    phrase_bm25_probe_persisted,
    phrase_bm25_topk,
)

_WORDS = (
    "zebra cat dog river moon data model stream event quality table scan "
    "sort merge batch night rain snow graph index"
).split()


def _corpus(seed: int, n: int = 40):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choices(_WORDS, k=rng.randint(3, 12))))
        for i in range(n)
    ]


_QS = [("q1", "zebra river"), ("q2", "data stream quality"), ("q3", "moon")]


def _probe(spark, path, k=10):
    qs = spark.createDataFrame(_QS, "query_id string, qtext string")
    return sorted(map(tuple, bm25_probe_persisted(spark, path, qs, k=k).collect()))


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# BM25: delete ≡ rebuild-without, random delete sets, both layouts
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [7, 23, 91])
@pytest.mark.parametrize("positions", [False, True])
def test_bm25_delete_equals_rebuild_without(spark, tmp_path, seed, positions):
    rows = _corpus(seed)
    rng = random.Random(seed * 31)
    del_ids = set(rng.sample(range(len(rows)), rng.randint(1, 15)))
    keep_rows = [r for r in rows if r[0] not in del_ids]
    del_rows = [r for r in rows if r[0] in del_ids]

    path = str(tmp_path / f"idx_{seed}_{positions}")
    bm25_index_persist(
        _docs_df(spark, rows), path, n_buckets=8, positions=positions
    )
    bm25_index_delete(_docs_df(spark, del_rows), path)

    rebuild = str(tmp_path / f"rb_{seed}_{positions}")
    bm25_index_persist(
        _docs_df(spark, keep_rows), rebuild, n_buckets=8, positions=positions
    )
    assert _probe(spark, path) == _probe(spark, rebuild)

    # Stronger than probe parity: the surviving POSTING ROWS are the
    # rebuild's rows exactly (sorted arrays make layouts deterministic).
    cols = ["term", "doc_id", "tf", "dl", "bucket"] + (
        ["positions"] if positions else []
    )
    got = sorted(map(tuple, spark.read.parquet(path).select(cols).collect()))
    want = sorted(map(tuple, spark.read.parquet(rebuild).select(cols).collect()))
    assert got == want and len(got) > 0


def test_bm25_delete_then_reappend_is_the_update_path(spark, tmp_path):
    """The disjoint-token re-add hole the r9 append documented: update =
    delete + re-append now handles a doc whose new text shares no terms
    with the old."""
    rows = _corpus(3)
    path = str(tmp_path / "idx")
    bm25_index_persist(_docs_df(spark, rows), path, n_buckets=8)
    old = rows[5]
    new = (old[0], "entirely disjoint replacement vocabulary xylophone")
    bm25_index_delete(_docs_df(spark, [old]), path)
    bm25_index_append(_docs_df(spark, [new]), path)

    rebuild = str(tmp_path / "rb")
    bm25_index_persist(
        _docs_df(spark, [r for r in rows if r[0] != 5] + [new]),
        rebuild,
        n_buckets=8,
    )
    qs = spark.createDataFrame(
        _QS + [("q4", "xylophone")], "query_id string, qtext string"
    )
    got = sorted(map(tuple, bm25_probe_persisted(spark, path, qs).collect()))
    want = sorted(map(tuple, bm25_probe_persisted(spark, rebuild, qs).collect()))
    assert got == want
    assert any(r[2] == 5 for r in got if r[0] == "q4"), "re-added doc must serve"


def test_bm25_delete_everything_probes_empty(spark, tmp_path):
    rows = _corpus(11, n=6)
    path = str(tmp_path / "idx")
    bm25_index_persist(_docs_df(spark, rows), path, n_buckets=8)
    bm25_index_delete(_docs_df(spark, rows), path)
    assert _probe(spark, path) == []
    import os

    assert not any(n.startswith("bucket=") for n in os.listdir(path))
    meta = spark.read.parquet(path + "/_meta").first()
    assert meta["n_docs"] == 0 and meta["total_toks"] == 0


def test_bm25_delete_guards(spark, tmp_path):
    rows = _corpus(5)
    path = str(tmp_path / "idx")
    bm25_index_persist(_docs_df(spark, rows), path, n_buckets=8)

    # Wrong text for an indexed id → exact-match verification refuses.
    with pytest.raises(ValueError, match="does not match the indexed"):
        bm25_index_delete(_docs_df(spark, [(0, "not the indexed text")]), path)
    # Absent doc id → refuses.
    with pytest.raises(ValueError, match="does not match the indexed"):
        bm25_index_delete(_docs_df(spark, [(999, "zebra cat")]), path)
    # Duplicate ids in the delta → refuses.
    with pytest.raises(ValueError, match="duplicate doc_ids"):
        bm25_index_delete(_docs_df(spark, [rows[0], rows[0]]), path)
    # Token-less doc → unverifiable, refuses.
    with pytest.raises(ValueError, match="token-less"):
        bm25_index_delete(_docs_df(spark, [(998, "   ")]), path)
    # All guards left the index untouched.
    before = _probe(spark, path)
    bm25_index_delete(_docs_df(spark, []), path)  # empty delta: no-op
    assert _probe(spark, path) == before


def test_bm25_delete_tag_replay_is_idempotent(spark, tmp_path):
    rows = _corpus(17)
    path = str(tmp_path / "idx")
    bm25_index_persist(_docs_df(spark, rows), path, n_buckets=8)
    bm25_index_delete(_docs_df(spark, rows[:4]), path, tag="batch-9")
    after = _probe(spark, path)
    meta = spark.read.parquet(path + "/_meta").first()
    # Replay with the same tag: a no-op even though the docs are gone
    # (a tag-less replay would raise on the absent docs).
    bm25_index_delete(_docs_df(spark, rows[:4]), path, tag="batch-9")
    assert _probe(spark, path) == after
    meta2 = spark.read.parquet(path + "/_meta").first()
    assert (meta["n_docs"], meta["total_toks"]) == (
        meta2["n_docs"],
        meta2["total_toks"],
    )


def test_phrase_probe_survives_append_and_delete(spark, tmp_path):
    """Positional layout end-to-end: build half, append half, delete a
    slice — the persisted phrase probe stays bit-identical to the
    in-memory phrase query over the surviving corpus."""
    rows = _corpus(29, n=60)
    half1 = [r for r in rows if r[0] % 2 == 0]
    half2 = [r for r in rows if r[0] % 2 == 1]
    dels = [r for r in rows if r[0] % 10 == 3]
    path = str(tmp_path / "idx")
    bm25_index_persist(_docs_df(spark, half1), path, n_buckets=8, positions=True)
    bm25_index_append(_docs_df(spark, half2), path)
    bm25_index_delete(_docs_df(spark, dels), path)

    surviving = [r for r in rows if r[0] % 10 != 3]
    qs = spark.createDataFrame(
        [("p1", "data model"), ("p2", "sort merge batch"), ("p3", "moon moon")],
        "query_id string, qtext string",
    )
    got = sorted(
        map(tuple, phrase_bm25_probe_persisted(spark, path, qs, k=10).collect())
    )
    want = sorted(
        map(tuple, phrase_bm25_topk(_docs_df(spark, surviving), qs, k=10).collect())
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# IVF-PQ: delete ≡ same-frozen-quantizer build-without, random delete sets
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [13, 47])
def test_ivfpq_delete_equals_build_without(spark, tmp_path, seed):
    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.ops.similarity import (
        ivfpq_append,
        ivfpq_delete,
        ivfpq_persist,
        ivfpq_probe_persisted,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    rng = random.Random(seed)
    del_ids = set(rng.sample(ids, 12))

    base = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    idx = str(tmp_path / f"idx_{seed}")
    ivfpq_persist(base, idx, vectorized=False)
    ivfpq_append(rest, idx, vectorized=False)
    ivfpq_delete(
        emb.filter(F.col("vec_id").isin(list(del_ids))), idx, vectorized=False
    )

    # Same frozen quantizers: bootstrap on the FULL base (deletion never
    # retrains), then insert only the surviving rest, then delete the
    # base-side victims — yielding codes for exactly corpus ∖ D.
    ref = str(tmp_path / f"ref_{seed}")
    ivfpq_persist(base, ref, vectorized=False)
    ivfpq_append(
        rest.filter(~F.col("vec_id").isin(list(del_ids))), ref, vectorized=False
    )
    base_victims = base.filter(F.col("vec_id").isin(list(del_ids)))
    if base_victims.count() > 0:
        ivfpq_delete(base_victims, ref, vectorized=False)

    qv = emb.filter(F.col("vec_id") < 8)
    got = sorted(
        map(tuple, ivfpq_probe_persisted(spark, idx, qv, k=5, n_probe=2).collect())
    )
    want = sorted(
        map(tuple, ivfpq_probe_persisted(spark, ref, qv, k=5, n_probe=2).collect())
    )
    assert got == want and len(got) > 0
    deleted_served = {t[1] for t in got} & del_ids
    assert not deleted_served, "deleted vectors must never be candidates"


def test_ivfpq_delete_guards(spark, tmp_path):
    from mbai_gdb_spark.io import read_table
    from mbai_gdb_spark.ops.similarity import (
        ivfpq_delete,
        ivfpq_persist,
        ivfpq_probe_persisted,
    )

    emb = read_table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = str(tmp_path / "idx")
    ivfpq_persist(emb, idx, vectorized=False)

    # Absent id (vector values of vec 0, id relabeled) → not found.
    ghost = emb.filter(F.col("vec_id") == 0).withColumn(
        "vec_id", F.lit(10_000_000).cast("long")
    )
    with pytest.raises(ValueError, match="found in their assigned lists"):
        ivfpq_delete(ghost, idx, vectorized=False)
    # Duplicate ids → refuses.
    dup = emb.filter(F.col("vec_id") == 4).unionAll(
        emb.filter(F.col("vec_id") == 4)
    )
    with pytest.raises(ValueError, match="duplicate vec_ids"):
        ivfpq_delete(dup, idx, vectorized=False)
    # Empty delta → no-op; index still serves.
    ivfpq_delete(emb.filter(F.lit(False)), idx, vectorized=False)
    assert (
        ivfpq_probe_persisted(
            spark, idx, emb.filter(F.col("vec_id") < 3), k=5, n_probe=2
        ).count()
        > 0
    )


# ---------------------------------------------------------------------------
# Hypothesis: random append/delete interleavings through generations
# ---------------------------------------------------------------------------


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_generation_mutation_sequences_equal_rebuild(spark, tmp_path_factory, data):
    """ANY interleaving of appends and deletes published through the
    generation machinery ends at an index whose probe is bit-identical
    to a one-shot build over the final surviving corpus — the algebraic
    closure of append ≡ rebuild and delete ≡ rebuild-without under
    composition (each property was proven pairwise; this pins the
    composition, where meta-scalar drift or a stale-tag bug would
    accumulate)."""
    from mbai_gdb_spark import indexgen as G
    from mbai_gdb_spark.ops.text import bm25_index_persist, bm25_probe_persisted

    pool = _corpus(data.draw(st.integers(0, 10_000), label="seed"), n=60)
    tmp = tmp_path_factory.mktemp("genseq")
    root = str(tmp / "root")

    # Bootstrap generation: a third of the pool.
    live = {r[0]: r for r in pool[:20]}
    fresh = list(pool[20:])
    G.bm25_gen_build(
        _docs_df(spark, list(live.values())), root, n_buckets=8
    )

    n_ops = data.draw(st.integers(2, 4), label="n_ops")
    for _ in range(n_ops):
        can_delete = len(live) > 3
        op = data.draw(
            st.sampled_from(["append", "delete"] if can_delete and fresh else
                            (["append"] if fresh else ["delete"])),
            label="op",
        )
        if op == "append":
            k = data.draw(st.integers(1, min(8, len(fresh))), label="k_app")
            batch, fresh = fresh[:k], fresh[k:]
            live.update({r[0]: r for r in batch})
            G.bm25_gen_append(_docs_df(spark, batch), root)
        else:
            ids = sorted(live)
            k = data.draw(st.integers(1, min(5, len(ids) - 3)), label="k_del")
            victims = [live.pop(i) for i in ids[:k]]
            G.bm25_gen_delete(_docs_df(spark, victims), root)

    qs = spark.createDataFrame(_QS, "query_id string, qtext string")
    got = sorted(
        map(tuple, G.bm25_gen_probe(spark, root, qs, k=10).collect())
    )
    rebuild = str(tmp / "rebuild")
    bm25_index_persist(
        _docs_df(spark, list(live.values())), rebuild, n_buckets=8
    )
    want = sorted(
        map(tuple, bm25_probe_persisted(spark, rebuild, qs, k=10).collect())
    )
    assert got == want
