"""Round-7 hardening from the round-6 advisory review:

1. ``merge_changelog`` on a pre-existing table WITHOUT the sequence
   column must reach the documented NULL-arbitration fallback in
   STRICT mode (seq_col exempt from the added-columns check).
2. ``_changelog_winners`` must pick the same winner for duplicate
   (key, seq) upserts regardless of input row order — content-hash
   tie-break, preserving merge_changelog's order-independence claim.
3. The JPEG marker loop must accept legal 0xFF fill bytes before a
   marker code (T.81 B.1.1.2).
4. ``l2_topk_vectorized`` with an EMPTY query set returns an empty
   result instead of failing the stage on np.concatenate([]).
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# 1. merge_changelog strict mode with a seq-less base table
# ---------------------------------------------------------------------------


def test_merge_changelog_seqless_base_strict_mode(spark, tmp_path):
    from mbai_gdb_spark.io import merge_changelog

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "old"), (2, "keep")], "k int, attr string")
    base.write.parquet(path)
    batch = spark.createDataFrame(
        [(1, "new", 10, "U")], "k int, attr string, seq int, op string"
    )
    # Strict mode (default): must NOT raise on the protocol column —
    # the seq-less base is the documented NULL-arbitration fallback.
    merge_changelog(spark, path, batch, ["k"], "seq")
    out = {r.k: r.attr for r in spark.read.parquet(path).collect()}
    assert out == {1: "new", 2: "keep"}
    # A genuinely new DATA column still trips strictness.
    bad = spark.createDataFrame(
        [(1, "x", "oops", 11, "U")],
        "k int, attr string, extra string, seq int, op string",
    )
    with pytest.raises(ValueError, match="adds new columns"):
        merge_changelog(spark, path, bad, ["k"], "seq")


# ---------------------------------------------------------------------------
# 2. deterministic tie-break for duplicate (key, seq) upserts
# ---------------------------------------------------------------------------


def test_changelog_duplicate_seq_upserts_deterministic(spark):
    from mbai_gdb_spark.io import changelog_snapshot

    rows = [(1, 5, "U", "alpha"), (1, 5, "U", "beta")]
    schema = "k int, seq int, op string, attr string"
    winners = set()
    for perm in (rows, rows[::-1]):
        log = spark.createDataFrame(perm, schema).repartition(4)
        got = changelog_snapshot(log, ["k"], "seq").collect()
        assert len(got) == 1
        winners.add(got[0].attr)
    # Same winner under both arrival orders AND arbitrary partitioning.
    assert len(winners) == 1


# ---------------------------------------------------------------------------
# 3. JPEG FF fill bytes before markers
# ---------------------------------------------------------------------------


def test_jpeg_fill_bytes_before_markers_accepted():
    from mbai_gdb_spark.ops.multimodal import decode_payload_bytes, encode_jpeg

    good = encode_jpeg(8, 8, bytes(range(64)), channels=1)
    ref = decode_payload_bytes(good)
    assert ref is not None
    # Insert fill bytes before the DQT marker (first 0xFF after SOI
    # that is not part of entropy data): FF DB -> FF FF FF DB.
    idx = good.index(b"\xff\xdb")
    padded = good[:idx] + b"\xff\xff" + good[idx:]
    out = decode_payload_bytes(padded)
    assert out is not None
    assert out[1:4] == ref[1:4]  # same (w, h, channels)
    assert out[4] == ref[4]  # identical pixels


# ---------------------------------------------------------------------------
# 4. empty query set in the exact-L2 oracle
# ---------------------------------------------------------------------------


def test_l2_topk_vectorized_empty_queries(spark):
    from mbai_gdb_spark.ops.similarity import l2_topk_vectorized

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    empty_q = corpus.filter("vec_id < 0")
    out = l2_topk_vectorized(corpus, empty_q, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "l2_sq_dist", "rank"]


# ---------------------------------------------------------------------------
# Round-7 self-review findings
# ---------------------------------------------------------------------------


def test_changelog_map_typed_payload_still_works(spark):
    """The content-hash tie-break must skip map-typed columns (xxhash64
    rejects MAP at any nesting depth) instead of failing analysis."""
    from pyspark.sql import functions as F

    from mbai_gdb_spark.io import changelog_snapshot

    log = spark.createDataFrame(
        [(1, 5, "U", {"a": 1}), (1, 7, "U", {"a": 2}), (2, 1, "D", {"b": 3})],
        "k int, seq int, op string, props map<string,int>",
    )
    got = changelog_snapshot(log, ["k"], "seq").collect()
    assert len(got) == 1 and got[0].k == 1 and got[0].props == {"a": 2}
    # Hashable columns alongside the map still drive the tie-break
    # deterministically across arrival orders.
    rows = [(1, 5, "U", "alpha", {"x": 1}), (1, 5, "U", "beta", {"x": 2})]
    schema = "k int, seq int, op string, attr string, props map<string,int>"
    winners = {
        changelog_snapshot(spark.createDataFrame(perm, schema), ["k"], "seq")
        .collect()[0]
        .attr
        for perm in (rows, rows[::-1])
    }
    assert len(winners) == 1


def test_parquet_backend_refuses_delta_table(spark, tmp_path):
    """The parquet merge path must never touch a Delta table dir:
    reading it as plain parquet would resurrect superseded file
    versions and the rewrite would destroy _delta_log consistency."""
    import os

    from mbai_gdb_spark.io import merge_upsert

    path = str(tmp_path / "dt")
    spark.createDataFrame([(1, "a")], "id long, v string").write.parquet(path)
    os.makedirs(os.path.join(path, "_delta_log"))
    df = spark.createDataFrame([(2, "b")], "id long, v string")
    with pytest.raises(RuntimeError, match="Delta table"):
        merge_upsert(df, path, ["id"], spark, backend="parquet")
    with pytest.raises(Exception):  # auto in a non-delta session: same guard
        merge_upsert(df, path, ["id"], spark, backend="auto")


def test_kcore_string_vertex_ids(spark):
    """String ids take the optimizer-decided (non-forced-broadcast)
    delta path and still converge to the right core."""
    from mbai_gdb_spark.ops.graph import kcore

    k4 = [(f"v{a}", f"v{b}") for a in range(5) for b in range(a + 1, 5)]
    edges = spark.createDataFrame(
        k4 + [("v0", "tail")], "src string, dst string"
    )
    got = {r.vertex: r.core_degree for r in kcore(edges, 3).collect()}
    assert got == {f"v{i}": 4 for i in range(5)}
