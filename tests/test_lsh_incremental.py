"""Incremental LSH index: persist corpus buckets once, probe new batches
(ops.dedup.lsh_index_persist / lsh_probe_incremental)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import (
    char_poly_token_ids,
    lsh_candidate_pairs,
    lsh_index_persist,
    lsh_probe_incremental,
    minhash_signatures,
)
from mbai_gdb_spark.ops.text import tokens


def _sigs(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    return minhash_signatures(char_poly_token_ids(toks), "doc_id")


def _corpus_rows(start, n, dup_of=None):
    base = [
        " ".join(f"w{(i * 13 + j) % 97}" for j in range(30)) for i in range(n)
    ]
    return [(start + i, base[i] if dup_of is None else dup_of) for i in range(n)]


def test_incremental_probe_equals_full_batch(spark, tmp_path):
    """Pairs from (persisted corpus index + new batch) must equal the
    full-batch LSH pairs over the union corpus, restricted to pairs
    touching the new batch (old-old pairs were reported when the corpus
    was first indexed)."""
    old_rows = _corpus_rows(0, 12)
    # new batch: 2 near-dups of old docs (same text) + 2 fresh + 1 pair inside batch
    new_rows = [
        (100, old_rows[3][1]),
        (101, old_rows[7][1]),
        (102, "completely novel text about nothing shared one two three"),
        (103, "another novel doc with its own words four five six"),
        (104, old_rows[3][1]),  # also pairs with 100 within the batch
    ]
    idx_path = str(tmp_path / "lsh_idx")
    lsh_index_persist(_sigs(spark, old_rows), idx_path)
    got = {
        (r.id_a, r.id_b)
        for r in lsh_probe_incremental(
            spark, _sigs(spark, new_rows), idx_path
        ).collect()
    }
    full = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(_sigs(spark, old_rows + new_rows), "doc_id").collect()
    }
    new_ids = {r[0] for r in new_rows}
    full_touching_new = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    assert got == full_touching_new
    assert (3, 100) in got and (7, 101) in got and (100, 104) in got


def test_incremental_probe_reads_index_not_corpus(spark, tmp_path):
    """The probe plan scans the parquet index — corpus text/signatures
    are never recomputed (only 'part-' parquet files of the index and
    the in-memory batch appear as sources)."""
    idx_path = str(tmp_path / "lsh_idx2")
    lsh_index_persist(_sigs(spark, _corpus_rows(0, 6)), idx_path)
    probe = lsh_probe_incremental(
        spark, _sigs(spark, [(50, "some new words here")]), idx_path
    )
    plan = probe._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "lsh_idx2" in plan  # parquet index is the corpus-side source


def test_incremental_bucket_cap_applies_to_union(spark, tmp_path):
    """With every doc identical, the union bucket exceeds the cap and no
    pairs are emitted (the df-cut semantics of pairs_from_buckets)."""
    text = "same boilerplate text everywhere repeated verbatim again"
    idx_path = str(tmp_path / "lsh_idx3")
    lsh_index_persist(_sigs(spark, [(i, text) for i in range(8)]), idx_path)
    probe = lsh_probe_incremental(
        spark,
        _sigs(spark, [(100, text), (101, text)]),
        idx_path,
        max_bucket_size=5,
    )
    assert probe.count() == 0
