"""Tests for the broadcast-Bloom-bitmap decontamination path
(ops.decontam.bloom_bitmap / bloom_contamination)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.decontam import (
    WORD_BITS,
    bloom_bitmap,
    bloom_contamination,
    contamination_hits,
)
from mbai_gdb_spark.ops.dedup import char_poly_id, shingle_set


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sh_ids(docs, k=4):
    return (
        shingle_set(docs, "doc_id", "text", k=k)
        .select("doc_id", char_poly_id("shingle").alias("sh_id"))
        .distinct()
    )


def test_bloom_bitmap_shape_and_bits(spark):
    ids = spark.range(100).select(F.col("id").alias("sh_id"))
    bm = bloom_bitmap(ids, m_bits=1 << 10, k=4).collect()
    # At most m/32 words, each a 32-bit value with at least one bit set.
    assert len(bm) <= (1 << 10) // WORD_BITS
    for r in bm:
        assert 0 < r.word < (1 << WORD_BITS)
    # Total set bits ≤ k * n (collisions only reduce the count).
    total_bits = sum(bin(r.word).count("1") for r in bm)
    assert 0 < total_bits <= 4 * 100


def test_bloom_no_false_negatives_vs_exact(spark):
    """Every document flagged by the exact broadcast-shingle join must be
    flagged by the Bloom path, with n_flagged >= the exact shared count
    (the superset guarantee)."""
    ev_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [
            (1, "x alpha beta gamma delta epsilon y"),
            (2, "alpha beta gamma zeta unrelated pad"),
            (3, "totally unrelated words here now ok"),
        ],
    )
    exact = {
        r.doc_id: r.n_common
        for r in contamination_hits(
            corpus, ev_docs.withColumnRenamed("doc_id", "eval_doc_id"), k=4
        ).collect()
    }
    ev_ids = _sh_ids(ev_docs).select("sh_id").distinct()
    got = {
        r.doc_id: r.n_flagged
        for r in bloom_contamination(_sh_ids(corpus), ev_ids).collect()
    }
    assert set(exact) <= set(got)
    for d, n in exact.items():
        assert got[d] >= n


def test_bloom_saturated_bitmap_flags_everything(spark):
    """A 32-bit bitmap with ~100 eval shingles saturates (all 32 bits
    set) — every corpus shingle flags (flag_frac 1.0).  Degenerate but
    deterministic."""
    ev = _sh_ids(
        _docs(spark, [(0, " ".join(f"ev{i}" for i in range(100)))])
    ).select("sh_id")
    bm = bloom_bitmap(ev, m_bits=32, k=2).collect()
    assert len(bm) == 1 and bm[0].word == (1 << 32) - 1  # saturated
    co = _sh_ids(_docs(spark, [(1, "p q r s t u v w x y z aa bb cc")]))
    rows = bloom_contamination(co, ev, m_bits=32, k=2).collect()
    assert len(rows) == 1
    assert rows[0].n_flagged == rows[0].n_shingles
    assert rows[0].flag_frac == 1.0


def test_bloom_clean_corpus_low_false_positive_rate(spark):
    """Disjoint corpus at the default 2^20-bit / 4-hash config: false
    positives should be (essentially) absent at this load factor."""
    ev = _sh_ids(
        _docs(spark, [(0, " ".join(f"ev{i}" for i in range(200)))])
    ).select("sh_id")
    co = _sh_ids(
        _docs(spark, [(1, " ".join(f"co{i}" for i in range(500)))])
    )
    n_flagged = bloom_contamination(co, ev).count()
    assert n_flagged == 0


def test_bloom_corpus_side_is_broadcast_join(spark):
    """The bitmap join must be a BroadcastHashJoin — the corpus side
    never shuffles before the per-(doc, shingle) aggregation."""
    ev = _sh_ids(_docs(spark, [(0, "a b c d e")])).select("sh_id")
    co = _sh_ids(_docs(spark, [(1, "a b c d e")]))
    df = bloom_contamination(co, ev)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan


def test_bloom_partitioning_invariant(spark):
    """Same flags whatever the input partitioning (bit_or is commutative,
    probes are map-only)."""
    docs = _docs(
        spark,
        [(i, " ".join(f"w{(i * 7 + j) % 60}" for j in range(30))) for i in range(40)],
    )
    ids = _sh_ids(docs)
    ev = ids.filter(F.col("doc_id") % 5 == 0).select("sh_id").distinct()
    co = ids.filter(F.col("doc_id") % 5 != 0)
    a = bloom_contamination(co, ev, m_bits=1 << 12).collect()
    b = bloom_contamination(
        co.repartition(7, "sh_id"), ev.repartition(3), m_bits=1 << 12
    ).collect()
    key = lambda r: (r.doc_id, r.n_flagged, r.n_shingles)
    assert sorted(map(key, a)) == sorted(map(key, b))


# --------------------------------------------------------------------------
# typo_pairs (deletion-neighborhood edit-distance-1 join)
# --------------------------------------------------------------------------


def test_typo_pairs_matches_brute_force(spark):
    import itertools

    from mbai_gdb_spark.ops.dedup import typo_pairs

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    words = ["cat", "car", "cart", "bat", "hello", "helo", "hallo", "xyz",
             "abcd", "abed", "abd", "dcba"]
    expected = {
        (a, b)
        for a, b in itertools.combinations(sorted(words), 2)
        if lev(a, b) <= 1
    }
    toks = spark.createDataFrame([(w,) for w in words], "token string")
    got = {(r.tok_a, r.tok_b) for r in typo_pairs(toks).collect()}
    assert got == expected
    assert ("abcd", "abd") in got and ("abcd", "abed") in got


def test_typo_pairs_caps_token_length(spark):
    from mbai_gdb_spark.ops.dedup import typo_pairs

    toks = spark.createDataFrame(
        [("a" * 30,), ("a" * 29,), ("hi",), ("ho",)], "token string"
    )
    got = {(r.tok_a, r.tok_b) for r in typo_pairs(toks, max_token_len=24).collect()}
    assert got == {("hi", "ho")}  # long tokens excluded by the cap
