"""Insert-if-absent sink semantics (reference MERGE ... ON CREATE SET —
idempotent re-ingest, SURVEY §2.4 A8)."""

from __future__ import annotations

import pytest


@pytest.fixture(params=["parquet", "delta"])
def merge_backend(request, spark):
    """Run merge_upsert's semantic tests over BOTH storage backends.
    The delta leg exercises the transactional MERGE INTO adapter in
    environments where delta-spark + the session extension exist; in
    this sandbox neither does, so it skips (and the skip is visible in
    the report rather than silently absent)."""
    if request.param == "delta":
        pytest.importorskip("delta", reason="delta-spark not installed")
        from mbai_gdb_spark.io import _delta_enabled

        if not _delta_enabled(spark):
            pytest.skip("session lacks the Delta SQL extension")
    return request.param


def _read_merged(spark, path: str, backend: str):
    if backend == "delta":
        return spark.read.format("delta").load(path)
    return spark.read.parquet(path)


def test_write_insert_if_absent_is_idempotent(spark, tmp_path):
    from mbai_gdb_spark.io import write_insert_if_absent

    path = str(tmp_path / "teams")
    df1 = spark.createDataFrame(
        [(1, "A"), (2, "B"), (2, "B-dup")], "id long, name string"
    )
    write_insert_if_absent(df1, path, ["id"], spark)
    # within-batch dedup by key
    assert spark.read.parquet(path).count() == 2

    # re-ingest with one new and two existing keys → only the new row lands
    df2 = spark.createDataFrame(
        [(1, "A-changed"), (2, "B"), (3, "C")], "id long, name string"
    )
    write_insert_if_absent(df2, path, ["id"], spark)
    rows = {r.id: r.name for r in spark.read.parquet(path).collect()}
    assert rows[3] == "C" and len(rows) == 3
    # ON CREATE semantics: existing key 1 keeps its original value
    assert rows[1] == "A"

    # full replay is a no-op
    write_insert_if_absent(df2, path, ["id"], spark)
    assert spark.read.parquet(path).count() == 3


def test_merge_upsert_updates_and_inserts(spark, tmp_path, merge_backend):
    from mbai_gdb_spark.io import merge_upsert

    path = str(tmp_path / "dim")
    merge_upsert(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        path, ["id"], spark, backend=merge_backend,
    )
    merge_upsert(
        spark.createDataFrame([(2, "B2"), (3, "c")], "id long, v string"),
        path, ["id"], spark, backend=merge_backend,
    )
    rows = {r.id: r.v for r in _read_merged(spark, path, merge_backend).collect()}
    assert rows == {1: "a", 2: "B2", 3: "c"}  # 2 updated, 3 inserted, 1 kept


def test_merge_upsert_backend_selection(spark, tmp_path):
    """'auto' must NEVER reinterpret an existing parquet dataset as
    Delta, an unknown backend rejects, and an explicit 'delta' request
    without the library fails loudly instead of silently degrading."""
    from mbai_gdb_spark.io import _delta_enabled, merge_upsert

    path = str(tmp_path / "sel")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    merge_upsert(df, path, ["id"], spark)  # auto -> parquet here
    merge_upsert(df, path, ["id"], spark, backend="auto")
    assert spark.read.parquet(path).count() == 1  # still plain parquet

    with pytest.raises(ValueError, match="backend"):
        merge_upsert(df, path, ["id"], spark, backend="iceberg")

    if not _delta_enabled(spark):
        with pytest.raises(Exception):  # ImportError or analysis error
            merge_upsert(df, path, ["id"], spark, backend="delta")


def test_partitioned_layout_prunes_partitions(spark, tmp_path):
    from pyspark.sql import functions as F
    from mbai_gdb_spark.io import write_partitioned

    path = str(tmp_path / "facts")
    df = spark.range(0, 1000).select(
        (F.col("id") % 10).alias("game_id"),
        F.col("id").alias("clock"),
        (F.col("id") * 2).alias("v"),
    )
    write_partitioned(df, path, ["game_id"], sort_cols=["clock"])

    read = spark.read.parquet(path).filter(F.col("game_id") == 3)
    plan = read._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(game_id" in plan, plan
    assert read.count() == 100


# --------------------------------------------------------------------------
# CSV / JSONL sources (explicit schema + quarantine)
# --------------------------------------------------------------------------


def test_read_csv_quarantines_malformed_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from mbai_gdb_spark.io import quarantine_split, read_csv

    p = tmp_path / "rows.csv"
    p.write_text(
        "id,name,score\n"
        "1,alpha,10\n"
        "2,beta,not_a_number\n"   # malformed: score not long
        "3,gamma,30\n"
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("score", T.LongType()),
        ]
    )
    good, bad = quarantine_split(read_csv(spark, str(p), schema))
    assert {(r.id, r.name, r.score) for r in good.collect()} == {
        (1, "alpha", 10),
        (3, "gamma", 30),
    }
    assert [r._corrupt_record for r in bad.collect()] == ["2,beta,not_a_number"]


def test_read_jsonl_schema_and_quarantine(spark, tmp_path):
    from pyspark.sql import types as T

    from mbai_gdb_spark.io import quarantine_split, read_jsonl

    p = tmp_path / "rows.jsonl"
    p.write_text(
        '{"id": 1, "tags": ["a", "b"]}\n'
        "this is not json\n"
        '{"id": 2, "tags": []}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    good, bad = quarantine_split(read_jsonl(spark, str(p), schema))
    assert {(r.id, tuple(r.tags)) for r in good.collect()} == {
        (1, ("a", "b")),
        (2, ()),
    }
    bad_rows = bad.collect()  # full rows: count() alone would prune to
    # the corrupt-only column set, which Spark disallows on raw reads
    assert len(bad_rows) == 1 and bad_rows[0]._corrupt_record == "this is not json"


def test_read_csv_no_inference_pass(spark, tmp_path):
    """The explicit-schema read must not trigger an inference job: the
    schema of the returned frame is exactly the declared one plus the
    quarantine column."""
    from pyspark.sql import types as T

    from mbai_gdb_spark.io import read_csv

    p = tmp_path / "one.csv"
    p.write_text("id\n7\n")
    schema = T.StructType([T.StructField("id", T.LongType())])
    df = read_csv(spark, str(p), schema)
    assert [f.name for f in df.schema.fields] == ["id", "_corrupt_record"]
    assert df.schema["id"].dataType == T.LongType()


def test_compact_dataset_reduces_files_and_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from mbai_gdb_spark.io import compact_dataset

    path = str(tmp_path / "many")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    df.repartition(64).write.parquet(path)  # the small-files problem
    before_rows = sorted(r.id for r in spark.read.parquet(path).collect())

    nb, na = compact_dataset(spark, path, target_rows_per_file=5_000, sort_cols=["id"])
    assert nb >= 64 and na <= 3
    after = spark.read.parquet(path)
    assert sorted(r.id for r in after.collect()) == before_rows
    # per-file id ranges are disjoint after the range re-sort
    import glob

    spans = []
    for f in glob.glob(path + "/part-*.parquet"):
        mm = spark.read.parquet(f).agg(F.min("id"), F.max("id")).collect()[0]
        spans.append((mm[0], mm[1]))
    spans.sort()
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 < b0


def test_merge_sinks_reject_concurrent_writer(spark, tmp_path):
    """The read-modify-write sinks are single-writer per dataset: a held
    intent marker makes a second writer fail fast instead of silently
    losing the first writer's batch."""
    import os

    import pytest

    from mbai_gdb_spark.io import (
        ConcurrentWriteError,
        merge_upsert,
        write_insert_if_absent,
        incremental_rollup,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "ds")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    merge_upsert(df, path, ["k"], spark)
    lock = path + "__lock"
    assert not os.path.exists(lock), "lock must be released after a merge"

    # Simulate writer A mid-merge: hold the lock, then writer B arrives.
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    try:
        with pytest.raises(ConcurrentWriteError):
            merge_upsert(df, path, ["k"], spark)
        with pytest.raises(ConcurrentWriteError):
            write_insert_if_absent(df, path, ["k"], spark)
        with pytest.raises(ConcurrentWriteError):
            incremental_rollup(
                spark,
                path,
                df.withColumn("day", F.lit("d1")),
                "day",
                ["k"],
                {"n": ("sum", F.count(F.lit(1)))},
            )
        # Dataset untouched by the failed attempts.
        assert spark.read.parquet(path).count() == 2
    finally:
        os.unlink(lock)

    # Lock gone → writes proceed again, and still release the lock.
    merge_upsert(
        spark.createDataFrame([(3, "c")], "k long, v string"), path, ["k"], spark
    )
    assert spark.read.parquet(path).count() == 3
    assert not os.path.exists(lock)


def test_merge_lock_breaks_stale_holder(spark, tmp_path):
    """A lock whose holder crashed long ago (mtime older than
    stale_after) is broken and the merge proceeds — the rename-aside
    swap guarantees no committed rows were at risk."""
    import os

    from mbai_gdb_spark.io import merge_upsert

    path = str(tmp_path / "ds2")
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    merge_upsert(df, path, ["k"], spark)

    lock = path + "__lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    two_hours_ago = os.path.getmtime(lock) - 7200
    os.utime(lock, (two_hours_ago, two_hours_ago))

    merge_upsert(
        spark.createDataFrame([(2, "b")], "k long, v string"), path, ["k"], spark
    )
    assert spark.read.parquet(path).count() == 2
    assert not os.path.exists(lock)


def test_changelog_snapshot_latest_op_wins(spark):
    from mbai_gdb_spark.io import changelog_snapshot

    log = spark.createDataFrame(
        [
            (1, 10, "I", "a1"),
            (1, 20, "U", "a2"),   # latest for key 1 → survives
            (2, 11, "I", "b1"),
            (2, 30, "D", None),   # deleted
            (3, 5, "D", None),
            (3, 6, "I", "c1"),    # re-created after delete → survives
            (4, 7, "I", "d1"),
            (4, 7, "U", "d2"),    # same seq, no delete: U ranks after D-rank rule → deterministic
        ],
        "k long, seq long, op string, attr string",
    )
    out = {r.k: (r.seq, r.op, r.attr) for r in changelog_snapshot(log, ["k"], "seq").collect()}
    assert out[1] == (20, "U", "a2")
    assert 2 not in out
    assert out[3] == (6, "I", "c1")
    assert 4 in out  # survives; tie at seq 7 picks the op-rank-1 row deterministically


def test_changelog_snapshot_delete_wins_seq_tie(spark):
    from mbai_gdb_spark.io import changelog_snapshot

    log = spark.createDataFrame(
        [(1, 5, "U", "x"), (1, 5, "D", None)], "k long, seq long, op string, attr string"
    )
    assert changelog_snapshot(log, ["k"], "seq").count() == 0


def test_merge_changelog_applies_batches_like_full_log(spark, tmp_path):
    from mbai_gdb_spark.io import changelog_snapshot, merge_changelog

    path = str(tmp_path / "cdc")
    b1 = spark.createDataFrame(
        [(1, 10, "I", "a"), (2, 11, "I", "b"), (3, 12, "I", "c")],
        "k long, seq long, op string, attr string",
    )
    b2 = spark.createDataFrame(
        [(2, 21, "U", "b2"), (3, 20, "D", None), (4, 22, "I", "d")],
        "k long, seq long, op string, attr string",
    )
    merge_changelog(spark, path, b1, ["k"], "seq")
    merge_changelog(spark, path, b2, ["k"], "seq")
    got = {r.k: (r.seq, r.attr) for r in spark.read.parquet(path).collect()}

    full = changelog_snapshot(b1.unionByName(b2), ["k"], "seq").drop("op")
    want = {r.k: (r.seq, r.attr) for r in full.collect()}
    assert got == want == {1: (10, "a"), 2: (21, "b2"), 4: (22, "d")}

    # Idempotence: re-applying the same batch changes nothing.
    merge_changelog(spark, path, b2, ["k"], "seq")
    again = {r.k: (r.seq, r.attr) for r in spark.read.parquet(path).collect()}
    assert again == want


def test_merge_changelog_respects_writer_lock(spark, tmp_path):
    import os

    import pytest

    from mbai_gdb_spark.io import ConcurrentWriteError, merge_changelog

    path = str(tmp_path / "cdc2")
    b = spark.createDataFrame([(1, 1, "I", "a")], "k long, seq long, op string, attr string")
    merge_changelog(spark, path, b, ["k"], "seq")
    lock = path + "__lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    try:
        with pytest.raises(ConcurrentWriteError):
            merge_changelog(spark, path, b, ["k"], "seq")
    finally:
        os.unlink(lock)


def test_merge_upsert_schema_evolution(spark, tmp_path, merge_backend):
    from mbai_gdb_spark.io import merge_upsert

    path = str(tmp_path / "evo")
    merge_upsert(
        spark.createDataFrame([(1, "a")], "k long, v string"),
        path, ["k"], spark, backend=merge_backend,
    )
    # Strict default: a batch with a NEW column fails loudly.
    wide = spark.createDataFrame([(2, "b", 9.5)], "k long, v string, score double")
    with pytest.raises(Exception):
        merge_upsert(wide, path, ["k"], spark, backend=merge_backend)
    # Evolution: new column admitted, old rows read back as NULL.
    merge_upsert(
        wide, path, ["k"], spark,
        allow_schema_evolution=True, backend=merge_backend,
    )
    got = {
        r.k: (r.v, r.score)
        for r in _read_merged(spark, path, merge_backend).collect()
    }
    assert got == {1: ("a", None), 2: ("b", 9.5)}
    # And a narrow batch (missing the new column) still merges.
    merge_upsert(
        spark.createDataFrame([(3, "c")], "k long, v string"),
        path, ["k"], spark,
        allow_schema_evolution=True, backend=merge_backend,
    )
    got = {
        r.k: (r.v, r.score)
        for r in _read_merged(spark, path, merge_backend).collect()
    }
    assert got[3] == ("c", None) and got[2] == ("b", 9.5)
    # Narrow-batch UPDATE of a matched key: the contract is whole-row
    # replace, so the target-only column goes NULL on the updated row —
    # identically on BOTH backends (Delta's whenMatchedUpdateAll would
    # instead have kept score=9.5; the adapter uses an explicit column
    # map precisely to avoid that divergence).
    merge_upsert(
        spark.createDataFrame([(2, "B3")], "k long, v string"),
        path, ["k"], spark,
        allow_schema_evolution=True, backend=merge_backend,
    )
    got = {
        r.k: (r.v, r.score)
        for r in _read_merged(spark, path, merge_backend).collect()
    }
    assert got == {1: ("a", None), 2: ("B3", None), 3: ("c", None)}
    # And WITHOUT evolution a narrow batch fails loudly on both
    # backends (parquet via strict unionByName, delta via the explicit
    # missing-column check) instead of part-updating.
    with pytest.raises(Exception):
        merge_upsert(
            spark.createDataFrame([(2, "nope")], "k long, v string"),
            path, ["k"], spark, backend=merge_backend,
        )


def test_vacuum_dataset_live_lock_blocks_everything(spark, tmp_path):
    """A LIVE lock means a writer may be mid-swap: vacuum must not
    touch staging/old (removing them would destroy the in-flight
    merge) — it skips entirely.  Once the lock is stale, everything
    cleans up in one pass."""
    import os
    import time as _time

    from mbai_gdb_spark.io import merge_upsert, vacuum_dataset

    path = str(tmp_path / "vac")
    merge_upsert(
        spark.createDataFrame([(1, "a")], "k long, v string"), path, ["k"], spark
    )
    # Simulate crash leftovers + a LIVE writer lock.
    os.makedirs(path + "__staging")
    os.makedirs(path + "__old")
    fd = os.open(path + "__lock", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)

    out = vacuum_dataset(path)
    assert out["skipped_live_lock"] is True
    assert os.path.exists(path + "__staging") and os.path.exists(path + "__old")
    assert os.path.exists(path + "__lock")

    old_t = _time.time() - 7200
    os.utime(path + "__lock", (old_t, old_t))
    out = vacuum_dataset(path)
    assert out["staging"] and out["old"] and out["lock"]
    assert not os.path.exists(path + "__lock")
    # Dataset untouched throughout.
    assert spark.read.parquet(path).count() == 1


def test_merge_changelog_order_independent(spark, tmp_path):
    """Sequence arbitration, not arrival order: applying batches in ANY
    order (including replaying an old batch last) converges to the
    full-log snapshot — the stored winning sequence defends the table
    against stale entries."""
    from mbai_gdb_spark.io import changelog_snapshot, merge_changelog

    b1 = spark.createDataFrame(
        [(1, 10, "I", "a"), (2, 11, "I", "b")], "k long, seq long, op string, attr string"
    )
    b2 = spark.createDataFrame(
        [(1, 20, "U", "a2"), (2, 21, "D", None), (3, 22, "I", "c")],
        "k long, seq long, op string, attr string",
    )
    want = {
        r.k: (r.seq, r.attr)
        for r in changelog_snapshot(b1.unionByName(b2), ["k"], "seq").collect()
    }
    for i, order in enumerate([(b1, b2), (b2, b1), (b1, b2, b1)]):
        path = str(tmp_path / f"cdc_{i}")
        for b in order:
            merge_changelog(spark, path, b, ["k"], "seq")
        got = {r.k: (r.seq, r.attr) for r in spark.read.parquet(path).collect()}
        assert got == want == {1: (20, "a2"), 3: (22, "c")}, order


def test_vacuum_restores_dataset_after_interrupted_swap(spark, tmp_path):
    """Crash between the swap's two renames leaves the dataset missing
    and __old holding the only copy — vacuum must RESTORE, not delete."""
    import os
    import shutil

    from mbai_gdb_spark.io import merge_upsert, vacuum_dataset

    path = str(tmp_path / "swapcrash")
    merge_upsert(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        path, ["k"], spark,
    )
    # Simulate the crash window: dataset renamed aside, staging never
    # promoted (it holds the would-be new data).
    os.makedirs(path + "__staging")
    os.replace(path, path + "__old")
    assert not os.path.exists(path)

    out = vacuum_dataset(path)
    assert out["restored_old"] is True
    assert out["staging"] is True and out["old"] is False
    assert spark.read.parquet(path).count() == 2
    assert not os.path.exists(path + "__old")

    # Normal case unchanged: with a live dataset, __old is a leftover.
    os.makedirs(path + "__old")
    out = vacuum_dataset(path)
    assert out == {"staging": False, "old": True, "lock": False,
                   "restored_old": False, "skipped_live_lock": False}
    assert spark.read.parquet(path).count() == 2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # key
            st.integers(min_value=0, max_value=50),   # seq
            st.sampled_from(["I", "U", "D"]),
            st.integers(min_value=0, max_value=99),
        ),
        min_size=1,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_changelog_snapshot_property_vs_pure_python(spark, entries, n_splits):
    """For ANY changelog, (a) the snapshot matches an independent pure-
    Python arbitration, and (b) splitting the log into consecutive
    batches and merging them equals the one-shot snapshot."""
    import tempfile
    import shutil

    from mbai_gdb_spark.io import changelog_snapshot, merge_changelog

    df = spark.createDataFrame(entries, "k long, seq long, op string, val long")
    got = {
        r.k: (r.seq, r.op, r.val)
        for r in changelog_snapshot(df, ["k"], "seq").collect()
    }

    # Pure-Python twin: max by (seq, delete-first at ties, then the
    # SAME physical tie-break the window uses is unspecified for fully
    # identical (seq, op) duplicates — compare only keys + winning
    # (seq, op) there.
    best: dict = {}
    for k, seq, op, val in entries:
        rank = (seq, 0 if op == "D" else 1)
        cur = best.get(k)
        # later seq wins; at same seq, D (rank 0) wins over I/U
        if cur is None or (seq, -(0 if op == "D" else 1)) > (
            cur[0], -(0 if cur[1] == "D" else 1)
        ):
            best[k] = (seq, op, val)
        elif seq == cur[0] and op == "D" and cur[1] != "D":
            best[k] = (seq, op, val)
    want_live = {k for k, (s, op, v) in best.items() if op != "D"}
    assert set(got) == want_live
    for k in got:
        assert got[k][0] == best[k][0]  # winning sequence agrees

    # Batch-split equivalence through the persisted path.
    base = tempfile.mkdtemp(prefix="cdcprop_")
    try:
        path = base + "/t"
        step = max(1, len(entries) // n_splits)
        for i in range(0, len(entries), step):
            chunk = spark.createDataFrame(
                entries[i : i + step], "k long, seq long, op string, val long"
            )
            merge_changelog(spark, path, chunk, ["k"], "seq")
        merged = {r.k: r.seq for r in spark.read.parquet(path).collect()}
        assert set(merged) == want_live
        for k in merged:
            assert merged[k] == best[k][0]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_merge_changelog_rejects_batch_missing_table_columns(spark, tmp_path):
    import pytest

    from mbai_gdb_spark.io import merge_changelog

    path = str(tmp_path / "cdc_schema")
    wide = spark.createDataFrame(
        [(1, 1, "I", "a", 9)], "k long, seq long, op string, attr string, extra long"
    )
    merge_changelog(spark, path, wide, ["k"], "seq")
    narrow = spark.createDataFrame(
        [(2, 2, "I", "b")], "k long, seq long, op string, attr string"
    )
    with pytest.raises(ValueError, match="missing table columns"):
        merge_changelog(spark, path, narrow, ["k"], "seq")


def test_merge_changelog_timestamp_sequence(spark, tmp_path):
    """Arbitration keeps the sequence column's own type: sub-second
    timestamp ordering must survive (a cast to long would truncate to
    seconds and tie)."""
    import datetime as dt

    from mbai_gdb_spark.io import merge_changelog

    path = str(tmp_path / "cdc_ts")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 100000)
    t1 = dt.datetime(2024, 1, 1, 0, 0, 0, 600000)  # same second, later
    b1 = spark.createDataFrame([(1, t1, "U", "late")], "k long, seq timestamp, op string, attr string")
    b2 = spark.createDataFrame([(1, t0, "U", "early")], "k long, seq timestamp, op string, attr string")
    merge_changelog(spark, path, b1, ["k"], "seq")
    merge_changelog(spark, path, b2, ["k"], "seq")  # older sub-second entry
    got = spark.read.parquet(path).collect()
    assert len(got) == 1 and got[0].attr == "late"


def test_lock_release_checks_ownership(tmp_path):
    """A writer that overran stale_after and lost its lock to a
    takeover must NOT delete the new holder's lock on exit."""
    import os

    from mbai_gdb_spark.io import _writer_lock

    path = str(tmp_path / "own")
    lock = path + "__lock"
    with _writer_lock(path, stale_after=3600.0):
        # Simulate a takeover while the first writer is still inside:
        # replace the lock with another holder's.
        os.unlink(lock)
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, b"token=someone-else pid=1 ts=0\n")
        os.close(fd)
    # First writer exited; the usurper's lock must survive.
    assert os.path.exists(lock)
    with open(lock, "rb") as f:
        assert f.read().startswith(b"token=someone-else")
    os.unlink(lock)


def test_stale_lock_takeover_is_atomic(tmp_path):
    import os
    import time as _time

    from mbai_gdb_spark.io import _writer_lock

    path = str(tmp_path / "stale")
    lock = path + "__lock"
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.write(fd, b"token=dead pid=1 ts=0\n")
    os.close(fd)
    old_t = _time.time() - 7200
    os.utime(lock, (old_t, old_t))
    with _writer_lock(path, stale_after=3600.0):
        with open(lock, "rb") as f:
            content = f.read()
        assert b"token=dead" not in content  # taken over, not reused
    assert not os.path.exists(lock)


def test_merge_changelog_schema_evolution_both_directions(spark, tmp_path):
    import pytest

    from mbai_gdb_spark.io import merge_changelog

    path = str(tmp_path / "cdc_evo")
    b1 = spark.createDataFrame(
        [(1, 1, "I", "a")], "k long, seq long, op string, attr string"
    )
    merge_changelog(spark, path, b1, ["k"], "seq")
    wide = spark.createDataFrame(
        [(2, 2, "I", "b", 9)], "k long, seq long, op string, attr string, extra long"
    )
    # Strict default rejects ADDED columns too (symmetric with missing).
    with pytest.raises(ValueError, match="adds new columns"):
        merge_changelog(spark, path, wide, ["k"], "seq")
    merge_changelog(spark, path, wide, ["k"], "seq", allow_schema_evolution=True)
    got = {r.k: (r.attr, r.extra) for r in spark.read.parquet(path).collect()}
    assert got == {1: ("a", None), 2: ("b", 9)}
    # And a batch missing the evolved column merges under evolution,
    # with the table-only column preserved (not dropped).
    narrow = spark.createDataFrame(
        [(3, 3, "I", "c"), (2, 4, "U", "b2")], "k long, seq long, op string, attr string"
    )
    merge_changelog(spark, path, narrow, ["k"], "seq", allow_schema_evolution=True)
    got = {r.k: (r.attr, r.extra) for r in spark.read.parquet(path).collect()}
    assert got[3] == ("c", None)
    assert got[1] == ("a", None)
    assert got[2][0] == "b2"  # updated row; its extra is NULL (batch had none)
