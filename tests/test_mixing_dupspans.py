"""Round-2 curation additions: cross-doc duplicated-span profile and
temperature-scaled domain mixture weights — hand-computed expectations
plus the scale-shape plan guarantees (no cross join, corpus touched
once)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import dup_span_profile
from mbai_gdb_spark.ops.sampling import mixture_weights


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_dup_span_profile_hand_computed(spark):
    # doc 1 and doc 2 share the span "a b c d" -> trigrams "a b c" and
    # "b c d" are corpus-duplicated; everything else is unique.
    docs = spark.createDataFrame(
        [
            (1, "a b c d x y"),          # 4 shingles, 2 duplicated
            (2, "q a b c d"),            # 3 shingles, 2 duplicated
            (3, "u v w z"),              # 2 shingles, 0 duplicated
            (4, "one two"),              # < k tokens: no shingles
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dup_span_profile(docs, "doc_id", "text", k=3).collect()
    }
    assert rows[1]["n_shingles"] == 4 and rows[1]["n_dup_shingles"] == 2
    assert rows[1]["dup_shingle_frac"] == 0.5
    assert rows[2]["n_shingles"] == 3 and rows[2]["n_dup_shingles"] == 2
    assert rows[3]["n_dup_shingles"] == 0 and rows[3]["dup_shingle_frac"] == 0.0
    assert rows[4]["n_shingles"] == 0 and rows[4]["dup_shingle_frac"] is None


def test_dup_span_profile_counts_distinct_docs_not_occurrences(spark):
    # A shingle repeated WITHIN one doc is one distinct shingle (shingle
    # set), so it is not "duplicated" unless another doc has it too.
    docs = spark.createDataFrame(
        [(1, "p q r p q r"), (2, "s t u v")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dup_span_profile(docs, "doc_id", "text", k=3).collect()
    }
    assert rows[1]["n_dup_shingles"] == 0
    assert rows[2]["n_dup_shingles"] == 0


def test_dup_span_profile_plan_is_linear(spark):
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = _plan(dup_span_profile(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mixture_weights_hand_computed(spark):
    # counts: a=100, b=400 -> sqrt: 10, 20 -> weights 1/3, 2/3.
    docs = spark.createDataFrame(
        [(i, "a") for i in range(100)] + [(i, "b") for i in range(400)],
        "doc_id long, source string",
    )
    rows = {r["source"]: r for r in mixture_weights(docs, "source").collect()}
    assert rows["a"]["n_docs"] == 100 and rows["b"]["n_docs"] == 400
    assert math.isclose(rows["a"]["raw_share"], 0.2)
    assert math.isclose(rows["a"]["mix_weight"], 1 / 3)
    assert math.isclose(rows["b"]["mix_weight"], 2 / 3)
    assert math.isclose(rows["a"]["expected_docs"] + rows["b"]["expected_docs"], 500)
    # alpha=0.5 pulls the mixture toward uniform: rare up, common down.
    assert rows["a"]["mix_weight"] > rows["a"]["raw_share"]
    assert rows["b"]["mix_weight"] < rows["b"]["raw_share"]


def test_mixture_weights_alpha_one_keeps_natural_shares(spark):
    docs = spark.createDataFrame(
        [(i, "x") for i in range(30)] + [(i, "y") for i in range(10)],
        "doc_id long, source string",
    )
    rows = {
        r["source"]: r for r in mixture_weights(docs, "source", alpha=1.0).collect()
    }
    for r in rows.values():
        assert math.isclose(r["mix_weight"], r["raw_share"])


def test_mixture_weights_sum_to_one(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 7}") for i in range(200)], "doc_id long, source string"
    )
    out = mixture_weights(docs, "source").collect()
    assert len(out) == 7
    assert math.isclose(sum(r["mix_weight"] for r in out), 1.0, rel_tol=1e-12)


def test_hashed_linear_score_hand_computed(spark):
    from mbai_gdb_spark.ops.text import hashed_linear_score

    weights = spark.createDataFrame(
        [(b, 1000 if b % 2 == 0 else -1000) for b in range(4096)],
        "bucket long, w_micros long",
    )
    docs = spark.createDataFrame(
        [(1, "aa aa bb"), (2, ""), (3, "cc")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in hashed_linear_score(docs, weights).collect()}
    # Each token contributes ±1000 micros by bucket parity; doc 1 has 3
    # tokens so |score_micros| in {1000, 3000} and n_scored_tokens == 3.
    assert rows[1]["n_scored_tokens"] == 3
    assert abs(rows[1]["score_micros"]) in (1000, 3000)
    assert rows[1]["score"] == rows[1]["score_micros"] / 1_000_000
    assert rows[2]["n_scored_tokens"] == 0 and rows[2]["score"] is None
    assert rows[3]["n_scored_tokens"] == 1


def test_hashed_linear_score_partition_invariant(spark):
    from mbai_gdb_spark.ops.text import hashed_linear_score, stub_classifier_weights

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{(i * 31 + k) % 997}" for k in range(40))) for i in range(60)],
        "doc_id long, text string",
    )
    w = stub_classifier_weights(spark)
    a = {r["doc_id"]: r["score_micros"]
         for r in hashed_linear_score(docs.repartition(1), w).collect()}
    b = {r["doc_id"]: r["score_micros"]
         for r in hashed_linear_score(docs.repartition(11, "doc_id"), w).collect()}
    assert a == b  # integer accumulation: exact equality


def test_hashed_linear_score_broadcasts_weights(spark):
    from mbai_gdb_spark.ops.text import hashed_linear_score, stub_classifier_weights

    docs = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    plan = (
        hashed_linear_score(docs, stub_classifier_weights(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
