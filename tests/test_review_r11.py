"""Round-11 adversarial self-review regressions.

Findings from the structured review of this round's diff:
1. `lsh_index_append_bucketed` ran its duplicate guard through
   `spark.read.parquet` without a has-data check — appending to an
   index whose every row had been deleted (a layout holding `_meta`
   and zero `pbkt=` dirs) crashed with AnalysisException (no schema to
   infer) instead of performing the insert.
2. `ivf_update` / `ivfpq_update` read the layout for old-side
   verification without the same check — updating against an emptied
   index surfaced as an AnalysisException instead of the loud typed
   refusal every other absent-id path raises.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import (
    char_poly_id,
    lsh_buckets_from_signature,
    lsh_index_append_bucketed,
    lsh_index_delete_bucketed,
    lsh_index_persist_bucketed,
    lsh_probe_bucketed,
    minhash_signature_array,
)
from mbai_gdb_spark.ops.similarity import (
    ivf_persist,
    ivf_delete,
    ivf_update,
    ivfpq_persist,
    ivfpq_delete,
    ivfpq_update,
)
from mbai_gdb_spark.ops.text import tokens

_WORDS = "zebra cat dog river moon data model stream event quality".split()


def _rows(seed, start, n):
    rng = random.Random(seed)
    return [
        (start + i, " ".join(rng.choices(_WORDS, k=rng.randint(5, 10))))
        for i in range(n)
    ]


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


def test_append_into_emptied_lsh_index_inserts(spark, tmp_path):
    """Finding 1: delete everything, then append — must insert, not
    crash, and probe like a fresh index over the appended docs."""
    corpus = _rows(1, 0, 6)
    path = str(tmp_path / "idx")
    lsh_index_persist_bucketed(_buckets(spark, corpus), path, n_buckets=8)
    lsh_index_delete_bucketed(_buckets(spark, corpus), path)

    fresh_docs = _rows(2, 100, 5)
    lsh_index_append_bucketed(_buckets(spark, fresh_docs), path)

    probe = _rows(3, 500, 3) + [(600, fresh_docs[0][1])]
    got = sorted(
        (r.id_a, r.id_b)
        for r in lsh_probe_bucketed(spark, _buckets(spark, probe), path).collect()
    )
    fresh = str(tmp_path / "fresh")
    lsh_index_persist_bucketed(_buckets(spark, fresh_docs), fresh, n_buckets=8)
    want = sorted(
        (r.id_a, r.id_b)
        for r in lsh_probe_bucketed(spark, _buckets(spark, probe), fresh).collect()
    )
    assert got == want and (100, 600) in got


def _vecs(spark, seed, ids, dim=64):
    rng = random.Random(seed)
    rows = [(i, [round(rng.uniform(-1, 1), 3) for _ in range(dim)]) for i in ids]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_update_on_emptied_vector_indexes_refuses_loudly(spark, tmp_path):
    """Finding 2: the typed ValueError, not an AnalysisException."""
    corpus = _vecs(spark, 1, list(range(120)))
    ivf_path = str(tmp_path / "ivf")
    ivf_persist(corpus, ivf_path, centroid_stride=50)
    ivf_delete(corpus, ivf_path)
    with pytest.raises(ValueError, match="holds no vectors"):
        ivf_update(
            _vecs(spark, 2, [5]), _vecs(spark, 3, [5]), ivf_path
        )

    pq_path = str(tmp_path / "ivfpq")
    ivfpq_persist(corpus, pq_path, centroid_stride=50, code_stride=7)
    ivfpq_delete(corpus, pq_path)
    with pytest.raises(ValueError, match="holds no vectors"):
        ivfpq_update(
            _vecs(spark, 2, [5]), _vecs(spark, 3, [5]), pq_path
        )
