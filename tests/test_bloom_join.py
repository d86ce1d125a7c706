"""Bloom-pruned joins: exactness vs the plain join (all three modes),
the no-false-negative membership guarantee, and the map-only plan
shape of the pruning predicate."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.bloom_join import bloom_membership, bloom_pruned_join


def _tables(spark, seed=3, n_probe=5000, n_build=40):
    rng = random.Random(seed)
    probe = spark.createDataFrame(
        [(i, rng.randrange(1000), rng.randrange(100)) for i in range(n_probe)],
        "row_id long, key long, payload long",
    )
    build_keys = rng.sample(range(1000), n_build)
    build = spark.createDataFrame(
        [(kk, f"dim{kk}") for kk in build_keys], "bkey long, attr string"
    )
    return probe, build


@pytest.mark.parametrize("how", ["inner", "left_semi", "left_anti"])
def test_bloom_pruned_join_matches_plain_join(spark, how):
    probe, build = _tables(spark)
    got = bloom_pruned_join(probe, build, "key", "bkey", how=how)
    if how == "inner":
        exp = probe.join(build, probe["key"] == build["bkey"], "inner")
    else:
        exp = probe.join(build, probe["key"] == build["bkey"], how)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_bloom_membership_no_false_negatives(spark):
    probe, build = _tables(spark, seed=9)
    member = bloom_membership(build.select("bkey"), "bkey", F.col("key"))
    flagged = {r.key for r in probe.filter(member).select("key").distinct().collect()}
    true_keys = {r.bkey for r in build.collect()}
    probe_keys = {r.key for r in probe.select("key").distinct().collect()}
    # every probe key that truly matches must be flagged
    assert (true_keys & probe_keys) <= flagged


def test_bloom_membership_actually_prunes(spark):
    """With a selective build side the Bloom must reject the vast
    majority of non-matching probe rows (default sizing: FPR ~1e-5)."""
    probe, build = _tables(spark, seed=11, n_probe=4000, n_build=10)
    member = bloom_membership(build.select("bkey"), "bkey", F.col("key"))
    n_pass = probe.filter(member).count()
    n_true = probe.join(build, probe["key"] == build["bkey"], "left_semi").count()
    # passes = true matches + false positives; FPs should be near zero
    assert n_pass - n_true <= 0.01 * probe.count()


def test_bloom_predicate_is_map_only(spark):
    """The membership predicate itself adds NO exchange: filtering the
    probe side compiles to Scan → Filter/Project only."""
    probe, build = _tables(spark)
    member = bloom_membership(build.select("bkey"), "bkey", F.col("key"))
    plan = (
        probe.filter(member)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anti_join_bypass_routes_bloom_misses_around_the_join(spark):
    """Rows failing the Bloom are emitted without joining; survivors go
    through the exact anti-join — and the union equals the plain anti
    join even when false positives occur (tiny bitmap forces FPs)."""
    probe, build = _tables(spark, seed=5)
    got = bloom_pruned_join(
        probe, build, "key", "bkey", how="left_anti", m_bits=1 << 8, k=2
    )
    exp = probe.join(build, probe["key"] == build["bkey"], "left_anti")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_vectorized_membership_agrees_with_literal_path(spark):
    from mbai_gdb_spark.ops.bloom_join import bloom_membership_vectorized

    probe, build = _tables(spark, seed=21, n_probe=3000, n_build=30)
    m_bits, k = 1 << 17, 4
    lit_pass = {
        r.row_id
        for r in probe.filter(
            bloom_membership(build.select("bkey"), "bkey", F.col("key"),
                             m_bits=m_bits, k=k)
        ).collect()
    }
    vec_pass = {
        r.row_id
        for r in bloom_membership_vectorized(
            build.select("bkey"), "bkey", probe, "key", m_bits=m_bits, k=k
        ).filter(F.col("__bloom_pass__")).collect()
    }
    assert lit_pass == vec_pass  # same hash family, bit-for-bit


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=60),
    st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=25),
    st.sampled_from(["inner", "left_semi", "left_anti"]),
)
def test_bloom_join_property_exactness(spark, probe_keys, build_keys, how):
    """For ANY key multisets and any mode, the Bloom-pruned join equals
    the plain join — tiny bitmap (forced false positives) included."""
    probe = spark.createDataFrame(
        [(i, k) for i, k in enumerate(probe_keys)], "row_id long, key long"
    )
    build = spark.createDataFrame(
        [(k, str(k)) for k in sorted(set(build_keys))] or [(10**9, "z")],
        "bkey long, attr string",
    )
    got = bloom_pruned_join(probe, build, "key", "bkey", how=how, m_bits=1 << 7, k=2)
    exp = probe.join(build, probe["key"] == build["bkey"], how)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_null_and_negative_keys(spark):
    """NULL keys: kept by anti (match nothing), dropped by inner/semi —
    exactly the plain join's behavior.  Negative keys: handled via pmod
    on both paths (Spark % is sign-of-dividend and would otherwise
    produce negative bit positions)."""
    from mbai_gdb_spark.ops.bloom_join import bloom_membership_vectorized

    probe = spark.createDataFrame(
        [(0, None), (1, -5), (2, -5), (3, 7), (4, -999999)],
        "row_id long, key long",
    )
    build = spark.createDataFrame([(-5,), (7,)], "bkey long")
    for how in ("inner", "left_semi", "left_anti"):
        got = bloom_pruned_join(probe, build, "key", "bkey", how=how)
        exp = probe.join(build, probe["key"] == build["bkey"], how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        ), how
    # vectorized path: NULL flags False, negatives agree with literal
    flagged = {
        r.row_id: r["__bloom_pass__"]
        for r in bloom_membership_vectorized(
            build, "bkey", probe, "key"
        ).collect()
    }
    assert flagged[0] is False and flagged[1] and flagged[3]
    lit_pass = {
        r.row_id
        for r in probe.filter(
            F.coalesce(
                bloom_membership(build, "bkey", F.col("key"), m_bits=1 << 24),
                F.lit(False),
            )
        ).collect()
    }
    vec_pass = {k for k, v in flagged.items() if v}
    assert lit_pass == vec_pass


def test_string_keys_rejected(spark):
    import pytest

    probe = spark.createDataFrame([(1, "abc")], "row_id long, key string")
    build = spark.createDataFrame([("abc",)], "bkey string")
    with pytest.raises(ValueError, match="integral"):
        bloom_pruned_join(probe, build, "key", "bkey")


def test_null_build_keys_tolerated(spark):
    """NULL build-side keys equi-match nothing; they must be ignored,
    not crash the bitmap build."""
    probe = spark.createDataFrame([(1, 7), (2, 8)], "row_id long, key long")
    build = spark.createDataFrame([(7,), (None,)], "bkey long")
    for how in ("inner", "left_semi", "left_anti"):
        got = bloom_pruned_join(probe, build, "key", "bkey", how=how)
        exp = probe.join(build, probe["key"] == build["bkey"], how)
        assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect())), how


def test_merge_hint_pins_sort_merge_plan(spark):
    """j13_bloom_smj_revenue's contract: with join_hint='merge' the
    exact join is a SortMergeJoin even when the build side is small
    enough that Catalyst would broadcast it — the operator's real
    regime — and results still equal the plain join."""
    import mbai_gdb_spark.queries_north  # noqa: F401
    from mbai_gdb_spark.queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"
    df = QUERIES["j13_bloom_smj_revenue"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # Same rows as the broadcast-regime demonstration shape.
    demo = QUERIES["j13_bloom_pruned_revenue"](spark, sf_dir)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, demo.collect()))


def test_join_hint_preserves_exactness(spark):
    probe = spark.createDataFrame(
        [(i, i % 13) for i in range(200)], "row_id long, key long"
    )
    build = spark.createDataFrame([(3,), (7,), (99,)], "bkey long")
    for how in ("inner", "left_semi", "left_anti"):
        got = bloom_pruned_join(
            probe, build, "key", "bkey", how=how, join_hint="merge"
        )
        exp = probe.join(build, probe["key"] == build["bkey"], how)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        ), how
