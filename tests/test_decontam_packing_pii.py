"""Tests for decontamination, sequence packing, PII profiling, and
streaming dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.decontam import contamination_hits
from mbai_gdb_spark.ops.packing import pack_next_fit, sequence_stats
from mbai_gdb_spark.ops.text import pii_profile


# --------------------------------------------------------------------------
# contamination_hits
# --------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_detects_verbatim_leak(spark):
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "eval_doc_id long, text string"
    )
    corpus = _docs(
        spark,
        [
            (1, "x alpha beta gamma delta epsilon y"),  # full eval doc embedded
            (2, "alpha beta gamma zeta"),               # only a 3-gram shared
            (3, "totally unrelated words here now"),
        ],
    )
    got = {r.doc_id: r for r in contamination_hits(corpus, ev, k=4).collect()}
    # Doc 1 contains both 4-grams of the 5-token eval doc → frac 1.0.
    assert set(got) == {1}
    assert got[1].eval_doc_id == 100
    assert got[1].n_common == 2 and got[1].overlap_frac == 1.0


def test_contamination_min_common_threshold(spark):
    ev = spark.createDataFrame(
        [(7, "a b c d e f")], "eval_doc_id long, text string"
    )
    corpus = _docs(spark, [(1, "a b c d zz"), (2, "a b c d e zz")])
    one = contamination_hits(corpus, ev, k=4, min_common=1)
    two = contamination_hits(corpus, ev, k=4, min_common=2)
    assert {r.doc_id for r in one.collect()} == {1, 2}
    assert {r.doc_id for r in two.collect()} == {2}


def test_contamination_eval_side_broadcast(spark):
    ev = spark.createDataFrame([(7, "a b c d e")], "eval_doc_id long, text string")
    corpus = _docs(spark, [(1, "a b c d e")])
    df = contamination_hits(corpus, ev, k=4)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------------------------
# pack_next_fit
# --------------------------------------------------------------------------


def test_packing_respects_budget_and_order(spark):
    df = spark.createDataFrame(
        [(i, 30 + (i * 17) % 50) for i in range(200)], "doc_id long, w long"
    )
    packed = pack_next_fit(df, "doc_id", "w", budget=128, n_shards=4)
    stats = sequence_stats(packed, "w").collect()
    assert all(s.seq_tokens <= 128 for s in stats)  # no weight exceeds budget here
    rows = packed.collect()
    assert len(rows) == 200
    # Within a shard, (seq_id, seq_offset) is monotone in doc_id.
    by_shard: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
        by_shard.setdefault(r.shard, []).append(r)
    for seq in by_shard.values():
        for a, b in zip(seq, seq[1:]):
            assert (b.seq_id, b.seq_offset) > (a.seq_id, a.seq_offset)
            if b.seq_id == a.seq_id:
                assert b.seq_offset == a.seq_offset + a.w
            else:
                assert b.seq_offset == 0


def test_packing_oversized_doc_gets_own_sequence(spark):
    df = spark.createDataFrame(
        [(0, 50), (1, 500), (2, 50)], "doc_id long, w long"
    )
    got = {r.doc_id: r for r in
           pack_next_fit(df, "doc_id", "w", budget=128, n_shards=1).collect()}
    assert got[0].seq_id == 1
    assert got[1].seq_id == 2 and got[1].seq_offset == 0  # alone, over budget
    assert got[2].seq_id == 3  # oversized seq is full → next doc starts fresh


def test_packing_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, 20 + i % 90) for i in range(300)], "doc_id long, w long"
    )
    a = sorted(map(tuple, pack_next_fit(df, "doc_id", "w", 256, 8).collect()))
    b = sorted(
        map(tuple, pack_next_fit(df.repartition(13), "doc_id", "w", 256, 8).collect())
    )
    assert a == b


# --------------------------------------------------------------------------
# pii_profile
# --------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob@example.com or 555-123-4567 today"),
            (2, "server at 10.0.0.1 ssn 123-45-6789"),
            (3, "clean text with no identifiers"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_profile(df, "doc_id", "text").collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1
    assert "<EMAIL>" in got[1].redacted_text and "<PHONE>" in got[1].redacted_text
    assert "bob@example.com" not in got[1].redacted_text
    assert got[2].n_ipv4 == 1 and got[2].n_ssn == 1
    assert "<IPV4>" in got[2].redacted_text and "<SSN>" in got[2].redacted_text
    assert got[3].n_pii_total == 0
    assert got[3].redacted_text == "clean text with no identifiers"
    assert got[1].n_pii_total == 2 and got[2].n_pii_total == 2


# --------------------------------------------------------------------------
# streaming dedup
# --------------------------------------------------------------------------


def test_streaming_dedup_matches_batch_distinct(spark, tmp_path):
    from mbai_gdb_spark.streaming.dedup import dedup_stream

    base = spark.range(0, 50).select(
        F.col("id").alias("event_id"),
        (F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id") * 60)).alias("ts"),
        (F.col("id") % 7).alias("user_id"),
    )
    # Re-deliver every event 3× across separate files (micro-batches).
    src = str(tmp_path / "dup_stream")
    for i in range(3):
        base.coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(base.schema).parquet(src)
    out = dedup_stream(stream, ["event_id"], ts="ts", watermark="2 hours")
    sink = str(tmp_path / "out")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    assert got.count() == 50
    assert got.select("event_id").distinct().count() == 50


# --------------------------------------------------------------------------
# property tests: packing vs pure-python replay, decontam vs brute force
# --------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _next_fit_reference(items, budget):
    """Pure-python next-fit replay: id-sorted (id, w) → {id: (seq, off)}."""
    out = {}
    seq, fill = 0, budget
    for i, w in sorted(items):
        if fill + w > budget:
            seq, fill = seq + 1, 0
        out[i] = (seq, fill)
        fill += w
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    st.integers(min_value=1, max_value=200),
)
def test_packing_matches_pure_python(spark, weights, budget):
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = {
        r.doc_id: (r.seq_id, r.seq_offset)
        for r in pack_next_fit(df, "doc_id", "w", budget, n_shards=4).collect()
    }
    expected = {}
    for shard in range(4):
        ref = _next_fit_reference(
            [(i, w) for i, w in rows if i % 4 == shard], budget
        )
        expected.update({i: (s, o) for i, (s, o) in ref.items()})
    assert got == expected


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=4, max_size=12),
        min_size=1,
        max_size=12,
    )
)
def test_contamination_matches_brute_force(spark, token_lists):
    k = 4
    docs = [(i, " ".join(t)) for i, t in enumerate(token_lists)]
    ev = [(100 + i, txt) for i, (_, txt) in enumerate(docs[:2])]
    corpus = _docs(spark, docs)
    ev_df = spark.createDataFrame(ev, "eval_doc_id long, text string")
    got = {
        (r.doc_id, r.eval_doc_id): (r.n_common, r.overlap_frac)
        for r in contamination_hits(corpus, ev_df, k=k).collect()
    }

    def sh(txt):
        t = txt.split()
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    expected = {}
    for did, dtxt in docs:
        for eid, etxt in ev:
            common = sh(dtxt) & sh(etxt)
            if common and sh(etxt):
                expected[(did, eid)] = (len(common), len(common) / len(sh(etxt)))
    assert got == expected
