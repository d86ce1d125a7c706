"""Exact-phrase retrieval SERVED from the persisted positional BM25
layout (round 10): bit-identical to the in-memory phrase query, reading
only the bucket directories the phrase's terms hash to — the same
physical delete-unprobed-dirs standard the non-phrase probe meets."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.ops.text import (
    _term_bucket,
    bm25_index_persist,
    bm25_probe_persisted,
    phrase_bm25_probe_persisted,
    phrase_bm25_topk,
)

SF_DIR = "/root/testdata/sf0.001"

_PHRASES = [
    ("p1", "table scan"),
    ("p2", "sort merge"),
    ("p3", "batch batch batch"),
]


def _docs(spark):
    return read_table(spark, SF_DIR, "documents").select("doc_id", "text")


def _qs(spark, rows=_PHRASES):
    return spark.createDataFrame(rows, "query_id string, qtext string")


def test_phrase_probe_matches_inmemory(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    bm25_index_persist(docs, path, n_buckets=16, positions=True)
    got = sorted(
        map(
            tuple,
            phrase_bm25_probe_persisted(spark, path, _qs(spark), k=10).collect(),
        )
    )
    want = sorted(
        map(tuple, phrase_bm25_topk(docs, _qs(spark), k=10).collect())
    )
    assert got == want and len(got) > 0


@pytest.mark.parametrize("n_buckets", [16, 256])
def test_phrase_probe_reads_only_queried_buckets(spark, tmp_path, n_buckets):
    """Physical proof at both bucket geometries: deleting every UNPROBED
    bucket directory changes nothing — phrase serving cost is
    |phrase-term buckets|/n_buckets of the index, never the corpus."""
    docs = _docs(spark)
    path = str(tmp_path / f"idx{n_buckets}")
    bm25_index_persist(docs, path, n_buckets=n_buckets, positions=True)
    qs = _qs(spark, [("p1", "table scan")])

    got_df = phrase_bm25_probe_persisted(spark, path, qs, k=10)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    before = sorted(map(tuple, got_df.collect()))
    assert before, "phrase must match documents"

    probed = {
        r.b
        for r in spark.createDataFrame([("table",), ("scan",)], "term string")
        .select(_term_bucket(F.col("term"), n_buckets).alias("b"))
        .collect()
    }
    removed = 0
    for d in Path(path).glob("bucket=*"):
        if int(d.name.split("=")[1]) not in probed:
            shutil.rmtree(d)
            removed += 1
    assert removed > 0, "fixture must create unprobed buckets"
    after = sorted(
        map(
            tuple,
            phrase_bm25_probe_persisted(spark, path, qs, k=10).collect(),
        )
    )
    assert after == before


def test_phrase_probe_refuses_positionless_layout(spark, tmp_path):
    docs = _docs(spark)
    path = str(tmp_path / "idx")
    bm25_index_persist(docs, path, n_buckets=16)  # positions=False
    with pytest.raises(ValueError, match="stores no positions"):
        phrase_bm25_probe_persisted(spark, path, _qs(spark), k=10)


def test_phrase_probe_empty_corpus_typed_result(spark, tmp_path):
    docs = _docs(spark).filter(F.lit(False))
    path = str(tmp_path / "idx")
    bm25_index_persist(docs, path, n_buckets=16, positions=True)
    out = phrase_bm25_probe_persisted(spark, path, _qs(spark), k=10)
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["query_id", "rank", "doc_id", "score"]
    assert out.schema["doc_id"].dataType.simpleString() == "bigint"


def test_positional_layout_serves_nonphrase_identically(spark, tmp_path):
    """One layout, both probe kinds: the positions column adds bytes,
    never changes non-phrase results (column pruning keeps it unread —
    asserted on the scan's ReadSchema)."""
    docs = _docs(spark)
    pos_path = str(tmp_path / "pos")
    flat_path = str(tmp_path / "flat")
    bm25_index_persist(docs, pos_path, n_buckets=16, positions=True)
    bm25_index_persist(docs, flat_path, n_buckets=16)
    qs = spark.createDataFrame(
        [("q1", "the data model"), ("q2", "stream of events")],
        "query_id string, qtext string",
    )
    got_df = bm25_probe_persisted(spark, pos_path, qs, k=10)
    got = sorted(map(tuple, got_df.collect()))
    want = sorted(
        map(tuple, bm25_probe_persisted(spark, flat_path, qs, k=10).collect())
    )
    assert got == want and len(got) > 0
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines and all("positions" not in ln for ln in scan_lines)
