"""Tests for the round-2 training-pipeline additions: repetition
signals, KMV sketches, hash sampling, and near-dup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import dedup_clusters
from mbai_gdb_spark.ops.sampling import stratified_hash_sample
from mbai_gdb_spark.ops.sketch import MERSENNE31, kmv_distinct
from mbai_gdb_spark.ops.text import repetition_profile


# --------------------------------------------------------------------------
# repetition_profile
# --------------------------------------------------------------------------


def test_repetition_profile_known_values(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # bigrams: a b ×3, b a ×2 → top 3/5
            (2, "x y z"),                # all distinct → top 1/2
            (3, "solo"),                 # 1 token → no bigrams
            (4, ""),                     # empty → 1 empty token, no bigrams
            (5, "w w w w"),              # one bigram repeated → top 3/3
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_profile(df, "doc_id", "text").collect()}
    assert got[1].n_tokens == 6 and got[1].n_bigrams == 5
    assert got[1].top_bigram_count == 3
    assert got[1].top_bigram_frac == 3.0 / 5.0
    assert got[1].frac_dup_tokens == 4.0 / 6.0
    assert got[2].top_bigram_count == 1 and got[2].top_bigram_frac == 0.5
    assert got[3].n_bigrams == 0 and got[3].top_bigram_count is None
    assert got[3].top_bigram_frac is None
    assert got[4].n_bigrams == 0
    assert got[5].top_bigram_count == 3 and got[5].top_bigram_frac == 1.0
    assert got[5].frac_dup_tokens == 3.0 / 4.0


# --------------------------------------------------------------------------
# kmv_distinct
# --------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    rows = [("a", v) for v in range(10) for _ in range(3)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_distinct(df, ["g"], "v", k=64).collect()
    assert len(out) == 1
    assert out[0].n_distinct_hashed == 10
    assert out[0].kmv_estimate == 10.0


def test_kmv_estimate_above_k_reasonable(spark):
    df = spark.createDataFrame([("a", v) for v in range(5000)], "g string, v long")
    out = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert out.n_distinct_hashed == 5000
    # KMV with k=64 has ~1/sqrt(62) ≈ 13% relative std error.
    assert 0.6 * 5000 <= out.kmv_estimate <= 1.5 * 5000


def test_kmv_shard_count_invariant(spark):
    df = spark.createDataFrame([("a", v) for v in range(1000)], "g string, v long")
    one = kmv_distinct(df, ["g"], "v", k=32, n_shards=1).collect()[0]
    many = kmv_distinct(df, ["g"], "v", k=32, n_shards=64).collect()[0]
    # Sharding is an execution detail: identical estimate and count.
    assert one.kmv_estimate == many.kmv_estimate
    assert one.n_distinct_hashed == many.n_distinct_hashed


# --------------------------------------------------------------------------
# stratified_hash_sample
# --------------------------------------------------------------------------


def test_sample_rate_one_keeps_all(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(100)], "id long, lang string"
    )
    out = stratified_hash_sample(df, "id", "lang", {}, default_rate=1.0)
    assert out.count() == 100
    assert out.select("sample_weight").distinct().collect()[0][0] == 1.0


def test_sample_deterministic_and_stratified(spark):
    df = spark.createDataFrame(
        [(i, "en" if i < 500 else "de") for i in range(1000)], "id long, lang string"
    )
    out = stratified_hash_sample(df, "id", "lang", {"en": 0.2}, default_rate=1.0)
    a = sorted(r.id for r in out.collect())
    b = sorted(r.id for r in out.repartition(7).collect())  # partitioning-invariant
    assert a == b
    en = out.filter(F.col("lang") == "en")
    n_en = en.count()
    assert 0.1 * 500 <= n_en <= 0.3 * 500  # rate honored within hash noise
    assert out.filter(F.col("lang") == "de").count() == 500
    # Horvitz-Thompson: weighted count estimates the true stratum size.
    est = en.agg(F.sum("sample_weight")).collect()[0][0]
    assert abs(est - 500) / 500 < 0.5


def test_sample_rate_zero_drops_stratum(spark):
    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(100)], "id long, lang string"
    )
    out = stratified_hash_sample(df, "id", "lang", {"en": 0.0}, default_rate=1.0)
    assert out.filter(F.col("lang") == "en").count() == 0
    assert out.filter(F.col("lang") == "de").count() == 50


# --------------------------------------------------------------------------
# dedup_clusters
# --------------------------------------------------------------------------


def test_dedup_clusters_chain_and_pair(spark):
    # Chain 1-2-3 (non-transitive pair set: (1,3) absent) + pair (10, 11).
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    got = {r.doc_id: r for r in dedup_clusters(pairs).collect()}
    assert {d: r.canonical_doc_id for d, r in got.items()} == {
        1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
    }
    assert got[3].cluster_size == 3 and got[11].cluster_size == 2
    assert got[1].is_canonical and not got[2].is_canonical


def test_dedup_clusters_long_path_converges(spark):
    # Path of length 12 — needs several propagation rounds.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "id_a long, id_b long"
    )
    got = dedup_clusters(pairs).collect()
    assert all(r.canonical_doc_id == 0 for r in got)
    assert all(r.cluster_size == 13 for r in got)


def test_kmv_string_value_col(spark):
    """String value columns hash through char-poly — the raw LCG would
    NULL-out every value and report a distinct count of 1."""
    df = spark.createDataFrame(
        [("g", f"user-{i % 50}") for i in range(500)], "g string, v string"
    )
    out = kmv_distinct(df, ["g"], "v", k=64).collect()[0]
    assert out.n_distinct_hashed == 50
    assert abs(out.kmv_estimate - 50.0) < 1e-9


def test_kmv_rejects_unsupported_value_type(spark):
    import pytest

    df = spark.createDataFrame([("g", 1.5)], "g string, v double")
    with pytest.raises(TypeError):
        kmv_distinct(df, ["g"], "v")


def test_deterministic_shuffle_invariants(spark):
    from mbai_gdb_spark.ops.sampling import deterministic_shuffle

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    out = deterministic_shuffle(df, "doc_id", n_shards=16, seed=7).collect()
    assert len(out) == 1000 and len({r.doc_id for r in out}) == 1000
    by_shard: dict = {}
    for r in out:
        assert 0 <= r.shard < 16
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))  # contiguous ranks

    # partitioning-independence: same permutation from a 13-way repartition
    again = deterministic_shuffle(
        df.repartition(13), "doc_id", n_shards=16, seed=7
    ).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in again} == {
        (r.doc_id, r.shard, r.pos) for r in out
    }

    # a different seed is a genuinely different permutation
    other = deterministic_shuffle(df, "doc_id", n_shards=16, seed=8).collect()
    assert {(r.doc_id, r.shard, r.pos) for r in other} != {
        (r.doc_id, r.shard, r.pos) for r in out
    }


def test_decimal_hist_quantiles_error_bound_and_determinism(spark):
    """Each p-estimate must be >= the true percentile and within the
    documented 10% relative bucket error; identical results from any
    input partitioning (mergeable bucket counts)."""
    import numpy as np

    from mbai_gdb_spark.ops.sketch import decimal_hist_quantiles

    rng = [(1, int(v)) for v in np.random.RandomState(7).lognormal(5, 1.5, 2000)]
    rng = [(g, v) for g, v in rng if v >= 1]
    df = spark.createDataFrame(rng, "g long, v long")
    out = decimal_hist_quantiles(df, ["g"], "v").collect()[0]
    vals = sorted(v for _, v in rng)
    n = len(vals)
    import math

    for q, est in [(0.5, out.p50_est), (0.9, out.p90_est), (0.99, out.p99_est)]:
        true = vals[int(math.ceil(q * n)) - 1]
        assert est >= true  # bucket UPPER bound never undershoots
        assert est <= true * 1.11 + 9  # ≤10% mantissa error (+ exact band <10)
    assert out.n_values == n

    again = decimal_hist_quantiles(df.repartition(17), ["g"], "v").collect()[0]
    assert again == out


# --------------------------------------------------------------------------
# heavy_hitters (CMS candidates + exact recount)
# --------------------------------------------------------------------------


def test_heavy_hitters_matches_exact_group_by(spark):
    from mbai_gdb_spark.ops.sketch import heavy_hitters

    # zipf-ish: value v appears 200//v times
    rows = [(v,) for v in range(1, 60) for _ in range(200 // v)]
    df = spark.createDataFrame(rows, "val long")
    got = {
        r.val: r.n_occurrences
        for r in heavy_hitters(df, "val", threshold=20).collect()
    }
    truth = {
        r.val: r.n
        for r in df.groupBy("val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 20)
        .collect()
    }
    assert got == truth
    assert got and min(got.values()) >= 20


def test_heavy_hitters_exact_even_with_saturated_sketch(spark):
    from mbai_gdb_spark.ops.sketch import heavy_hitters

    # width=2 forces massive CMS collisions: every value becomes a
    # candidate, but the exact recount still yields the exact answer.
    rows = [(v,) for v in range(50) for _ in range(1 + 10 * (v % 3 == 0))]
    df = spark.createDataFrame(rows, "val long")
    got = {
        r.val: r.n_occurrences
        for r in heavy_hitters(df, "val", threshold=5, depth=2, width=2).collect()
    }
    assert got == {v: 11 for v in range(50) if v % 3 == 0}


def test_heavy_hitters_payload_carried(spark):
    from mbai_gdb_spark.ops.sketch import heavy_hitters

    df = spark.createDataFrame(
        [(1, "one")] * 5 + [(2, "two")] * 2, "val long, name string"
    )
    rows = heavy_hitters(df, "val", threshold=3, payload_cols=["name"]).collect()
    assert [(r.val, r.name, r.n_occurrences) for r in rows] == [(1, "one", 5)]


def test_heavy_hitters_probe_pass_is_joinless(spark):
    """The collected sketch is inlined as an array literal, so the
    candidate-filter pass is pure map-side: the final plan has NO join
    and exactly one exchange (the exact recount of survivors)."""
    from mbai_gdb_spark.ops.sketch import heavy_hitters

    df = spark.createDataFrame([(v % 5,) for v in range(100)], "val long")
    plan = heavy_hitters(df, "val", threshold=10)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


# --------------------------------------------------------------------------
# negative_samples (deterministic contrastive negatives)
# --------------------------------------------------------------------------


def test_negative_samples_contract(spark):
    from mbai_gdb_spark.ops.sampling import negative_samples

    positives = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3)], "anchor long, item long"
    )
    out = negative_samples(
        positives, None, "anchor", "item", n_corpus=50, k=4
    ).collect()
    pos = {(0, 1), (0, 2), (1, 3)}
    by_pair = {}
    for r in out:
        assert (r.anchor, r.neg_item) not in pos    # no accidental positives
        assert r.neg_item != r.anchor               # anchor never its own negative
        assert 0 <= r.neg_item < 50
        by_pair.setdefault((r.anchor, r.item), []).append(r)
    for rs in by_pair.values():
        rs.sort(key=lambda r: r.neg_rank)
        assert [r.neg_rank for r in rs] == list(range(1, len(rs) + 1))
        items = [r.neg_item for r in rs]
        assert items == sorted(items) and len(set(items)) == len(items)


def test_negative_samples_partitioning_invariant(spark):
    from mbai_gdb_spark.ops.sampling import negative_samples

    positives = spark.createDataFrame(
        [(i, (i * 3 + 1) % 40) for i in range(30)], "anchor long, item long"
    )
    a = sorted(map(tuple, negative_samples(positives, None, "anchor", "item", 40).collect()))
    b = sorted(map(tuple, negative_samples(positives.repartition(7), None, "anchor", "item", 40).collect()))
    assert a == b
