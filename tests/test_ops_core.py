"""Unit tests for the core operator library on tiny hand-built frames.

Mirrors the test strategy SURVEY.md §5 prescribes (the reference ships no
tests): each operator exercised on inputs small enough to verify by hand,
with the tricky edges — empty partitions, exact-boundary timestamps,
ties, tolerance cutoffs — covered explicitly.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.chain import chain_next, with_priority
from mbai_gdb_spark.ops.intervals import asof_join, interval_join, sessionize
from mbai_gdb_spark.ops.windows import running_sum, top1_per_key, topk_per_key


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_chain_next_basic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 20), ("a", 3, 30), ("b", 1, 100)],
        "k string, seq int, v int",
    )
    out = chain_next(df, ["k"], ["seq"], {"v": "next_v"}).orderBy("k", "seq")
    rows = [(r.k, r.seq, r.next_v) for r in out.collect()]
    assert rows == [("a", 1, 20), ("a", 2, 30)]  # last-of-partition dropped


def test_chain_next_keep_last(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2)], "k string, seq int")
    out = chain_next(df, ["k"], ["seq"], {"seq": "next_seq"}, keep_last=True)
    assert out.count() == 2


def test_with_priority(spark):
    df = spark.createDataFrame([("x",), ("y",), ("z",)], "t string")
    out = with_priority(df, "t", {"x": 1, "y": 2}, default=9)
    got = {r.t: r.priority for r in out.collect()}
    assert got == {"x": 1, "y": 2, "z": 9}


def test_sessionize_gap_boundary(spark):
    # gaps: exactly 60s (NOT a new session, strict >), 61s (new session)
    df = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:00")),
            (1, ts("2024-01-01T00:01:00")),  # +60s  -> same session
            (1, ts("2024-01-01T00:02:01")),  # +61s  -> new session
            (2, ts("2024-01-01T00:00:00")),  # other key -> its own session 1
        ],
        "user_id long, t timestamp",
    )
    out = sessionize(df, ["user_id"], "t", gap_seconds=60.0)
    got = [(r.user_id, r.session_id) for r in out.orderBy("user_id", "t").collect()]
    assert got == [(1, 1), (1, 1), (1, 2), (2, 1)]


def test_interval_join_closed_semantics(spark):
    events = spark.createDataFrame(
        [(1, 0.0), (1, 5.0), (1, 10.0)], "k long, t double"
    )
    intervals = spark.createDataFrame([(1, 0.0, 10.0)], "k long, lo double, hi double")
    half_open = interval_join(events, intervals, ["k"], "t", "lo", "hi", closed="left")
    closed = interval_join(events, intervals, ["k"], "t", "lo", "hi", closed="both")
    assert half_open.count() == 2  # 0, 5
    assert closed.count() == 3  # 0, 5, 10


def test_asof_backward_with_tolerance(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01T00:01:00"), "L1"), (1, ts("2024-01-01T00:10:00"), "L2")],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:00:30"), "R1"),
            (1, ts("2024-01-01T00:00:50"), "R2"),
            (1, ts("2024-01-01T00:05:00"), "R3"),
        ],
        "k long, t timestamp, rtag string",
    )
    out = asof_join(
        left,
        right,
        by=["k"],
        left_ts="t",
        right_ts="t",
        right_cols=["rtag"],
        tolerance_seconds=60.0,
        direction="backward",
    )
    got = {r.tag: r.rtag for r in out.collect()}
    # L1 at 60s: nearest preceding within 60s is R2 (50s).  L2 at 600s:
    # nearest preceding is R3 (300s) but 300s gap > 60s tolerance -> dropped.
    assert got == {"L1": "R2"}


def test_asof_equal_timestamps_inclusive(spark):
    left = spark.createDataFrame([(1, ts("2024-01-01T00:00:00"))], "k long, t timestamp")
    right = spark.createDataFrame(
        [(1, ts("2024-01-01T00:00:00"), "same")], "k long, t timestamp, rtag string"
    )
    out = asof_join(left, right, ["k"], "t", "t", ["rtag"])
    assert [r.rtag for r in out.collect()] == ["same"]


def test_running_sum_with_reset(spark):
    df = spark.createDataFrame(
        [("u", "d1", 1, 10), ("u", "d1", 2, 20), ("u", "d2", 3, 5)],
        "k string, day string, seq int, v int",
    )
    out = running_sum(df, ["k"], ["seq"], "v", alias="total")
    out = running_sum(out, ["k"], ["seq"], "v", alias="daily", reset_by=["day"])
    rows = {r.seq: (r.total, r.daily) for r in out.collect()}
    assert rows == {1: (10, 10), 2: (30, 30), 3: (35, 5)}


def test_top1_and_topk(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "k string, v int"
    )
    t1 = top1_per_key(df, ["k"], [F.col("v").desc()])
    assert {(r.k, r.v) for r in t1.collect()} == {("a", 3), ("b", 9)}
    tk = topk_per_key(df, ["k"], [F.col("v").desc()], k=2)
    assert tk.filter(F.col("k") == "a").count() == 2


def test_interval_overlap_join_matches_brute_force(spark):
    """Binned overlap join ≡ the theta-join predicate, on random
    intervals including degenerate, boundary-aligned, and negative
    coordinates — for both closed modes and several bin widths."""
    import random

    from mbai_gdb_spark.ops.intervals import interval_overlap_join

    rng = random.Random(77)
    def mk(n, id_prefix):
        rows = []
        for i in range(n):
            key = rng.choice(["a", "b"])
            s = round(rng.uniform(-20, 40), 2)
            # mix: normal, boundary-aligned, degenerate
            mode = rng.random()
            if mode < 0.15:
                e = s  # degenerate
            elif mode < 0.3:
                e = float(int(s) + rng.randint(1, 3) * 5)  # aligned to w=5
            else:
                e = s + round(rng.uniform(0.1, 25), 2)
            rows.append((key, f"{id_prefix}{i}", s, e))
        return rows

    lrows, rrows = mk(120, "L"), mk(150, "R")
    l = spark.createDataFrame(lrows, "k string, lid string, ls double, le double")
    r = spark.createDataFrame(rrows, "k string, rid string, rs double, re double")

    for closed in ("left", "both"):
        for w in (2.0, 5.0, 13.0):
            got = {
                (row.lid, row.rid)
                for row in interval_overlap_join(
                    l, r, ["k"], "ls", "le", "rs", "re", bin_width=w, closed=closed
                ).collect()
            }
            want = set()
            for lk, lid, ls, le in lrows:
                for rk, rid, rs, re in rrows:
                    if lk != rk:
                        continue
                    if closed == "left":
                        if ls < re and rs < le:
                            want.add((lid, rid))
                    else:
                        if ls <= re and rs <= le:
                            want.add((lid, rid))
            assert got == want, (closed, w, len(got), len(want))


def test_funnel_first_completion_ordering(spark):
    from pyspark.sql import functions as F

    from mbai_gdb_spark.ops.funnel import funnel_first_completion

    rows = [
        # user 1: full funnel in order
        (1, 10, "view"), (1, 20, "click"), (1, 30, "purchase"),
        # user 2: click BEFORE the first view -> click step never fires
        (2, 10, "click"), (2, 20, "view"), (2, 30, "purchase"),
        # user 3: purchase before click -> stops at click
        (3, 10, "view"), (3, 15, "purchase"), (3, 20, "click"),
        # user 4: later click after an early ignored one still counts
        (4, 10, "click"), (4, 20, "view"), (4, 25, "click"), (4, 30, "purchase"),
        # user 5: only unrelated events
        (5, 10, "error"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r["user_id"]: r for r in funnel_first_completion(
        ev, ["view", "click", "purchase"]).collect()}
    assert out[1]["steps_completed"] == 3 and out[1]["first_purchase_ts"] == 30
    assert out[2]["steps_completed"] == 1 and out[2]["first_click_ts"] is None
    assert out[3]["steps_completed"] == 2 and out[3]["first_purchase_ts"] is None
    assert out[4]["steps_completed"] == 3 and out[4]["first_click_ts"] == 25
    assert out[5]["steps_completed"] == 0 and out[5]["first_view_ts"] is None
    assert len(out) == 5  # every user appears, funnel-active or not


def test_funnel_strict_ordering_excludes_ties(spark):
    from mbai_gdb_spark.ops.funnel import funnel_first_completion

    rows = [(1, 10, "view"), (1, 10, "click")]  # same instant: not "after"
    ev = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = funnel_first_completion(ev, ["view", "click"]).collect()[0]
    assert out["steps_completed"] == 1 and out["first_click_ts"] is None


# --------------------------------------------------------------------------
# w15 gap fill (daily densify + forward fill) — query-level unit test
# --------------------------------------------------------------------------


def test_gap_fill_densifies_and_forward_fills(spark):
    import datetime as dt

    from mbai_gdb_spark.queries import QUERIES
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    # Build the same pipeline inline on a controlled frame.
    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 9), 10, 1.5),
            (1, dt.datetime(2024, 1, 1, 17), 11, 2.5),  # later → wins day 1
            (1, dt.datetime(2024, 1, 4, 8), 12, 7.0),   # 2-day gap
            (2, dt.datetime(2024, 1, 2, 12), 13, 9.0),  # single-day user
        ],
        "user_id long, ts timestamp, event_id long, value double",
    ).withColumn("day", F.date_trunc("day", F.col("ts")).cast("date"))
    w_rn = W.partitionBy("user_id", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    daily = (
        ev.withColumn("rn", F.row_number().over(w_rn))
        .filter(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    joined = grid.join(daily, ["user_id", "day"], "left")
    w_ff = (
        W.partitionBy("user_id").orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = joined.select(
        "user_id", "day",
        F.last("value", ignorenulls=True).over(w_ff).alias("value_filled"),
        F.col("value").isNotNull().cast("int").alias("is_observed"),
    ).collect()
    got = {(r.user_id, str(r.day)): (r.value_filled, r.is_observed) for r in out}
    assert got == {
        (1, "2024-01-01"): (2.5, 1),  # last event of the day wins
        (1, "2024-01-02"): (2.5, 0),  # forward-filled
        (1, "2024-01-03"): (2.5, 0),
        (1, "2024-01-04"): (7.0, 1),
        (2, "2024-01-02"): (9.0, 1),  # single-day span: no padding
    }


def test_rolling_range_window_semantics(spark):
    """RANGE frame includes ties and excludes events older than the
    window; gaps change the frame row count (unlike ROWS frames)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    day = 86_400_000_000
    rows = [
        (1, 1, 0 * day, 100),
        (2, 1, 3 * day, 200),
        (3, 1, 7 * day, 400),   # exactly 7 days after e1 → e1 included
        (4, 1, 8 * day, 800),   # e1 now out of range
        (5, 1, 8 * day, 1600),  # epoch tie with e4 → peers, both in both frames
        (6, 2, 0 * day, 7),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ets long, cents long")
    w = W.partitionBy("user_id").orderBy("ets").rangeBetween(-7 * day, W.currentRow)
    got = {
        r.event_id: (r.roll, r.n)
        for r in ev.select(
            "event_id",
            F.sum("cents").over(w).alias("roll"),
            F.count(F.lit(1)).over(w).alias("n"),
        ).collect()
    }
    assert got == {
        1: (100, 1),
        2: (300, 2),
        3: (700, 3),
        4: (3000, 4),  # e2,e3,e4,e5 (tie peer included)
        5: (3000, 4),
        6: (7, 1),
    }


def test_scd2_intervals_contract(spark):
    """SCD2 pipeline on a controlled frame: change rows only, intervals
    chain (valid_to = next valid_from), versions count from 1, last row
    open-ended."""
    import datetime as dt

    from mbai_gdb_spark.queries import QUERIES

    # Reuse the query's logic via a temp parquet fixture shaped like events.
    import tempfile, os, shutil

    rows = [
        (1, dt.datetime(2024, 1, 1, 9), 1, "t", 5.0, "{}"),
        (1, dt.datetime(2024, 1, 2, 9), 2, "t", 5.0, "{}"),   # same value: no new version
        (1, dt.datetime(2024, 1, 3, 9), 3, "t", 7.0, "{}"),   # change
        (1, dt.datetime(2024, 1, 3, 18), 4, "t", 9.0, "{}"),  # later same day wins
        (2, dt.datetime(2024, 1, 5, 9), 5, "t", 1.0, "{}"),
    ]
    base = tempfile.mkdtemp(prefix="scd2_fix_")
    try:
        spark.createDataFrame(
            rows,
            "user_id long, ts timestamp, event_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
        out = QUERIES["w17_scd2_user_value"](spark, base).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    got = sorted(
        ((r.user_id, str(r.valid_from), str(r.valid_to), r.value, r.version) for r in out)
    )
    assert got == [
        (1, "2024-01-01", "2024-01-03", 5.0, 1),
        (1, "2024-01-03", "None", 9.0, 2),
        (2, "2024-01-05", "None", 1.0, 1),
    ]
