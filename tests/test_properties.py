"""Property-based checks (hypothesis) for the island/window recipes —
the invariants hold for arbitrary event layouts, not just fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.intervals import sessionize
from mbai_gdb_spark.ops.windows import running_sum

GAP = 60.0
BASE = datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # key
        st.floats(min_value=0, max_value=3600, allow_nan=False),  # offset s
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionize_gap_invariants(spark, events):
    rows = [
        (k, BASE + timedelta(seconds=off), i, v)
        for i, (k, off, v) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "k long, ts timestamp, eid long, v long")
    out = sessionize(df, ["k"], "ts", GAP, tie_break=["eid"]).orderBy("k", "ts", "eid")
    per_key: dict = {}
    for r in out.collect():
        per_key.setdefault(r.k, []).append(r)
    for k, rs in per_key.items():
        prev = None
        for r in rs:
            if prev is not None:
                gap = (r.ts - prev.ts).total_seconds()
                if r.session_id == prev.session_id:
                    # within a session every consecutive gap ≤ GAP
                    assert gap <= GAP
                else:
                    # session ids increase by exactly 1 at a boundary, and
                    # the boundary gap exceeds GAP
                    assert r.session_id == prev.session_id + 1
                    assert gap > GAP
            else:
                assert r.session_id == 1
            prev = r


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_running_sum_prefix_property(spark, events):
    rows = [(k, i, v) for i, (k, _, v) in enumerate(events)]
    df = spark.createDataFrame(rows, "k long, seq long, v long")
    out = running_sum(df, ["k"], ["seq"], "v", alias="total").orderBy("k", "seq")
    acc: dict = {}
    for r in out.collect():
        acc[r.k] = acc.get(r.k, 0) + r.v
        assert r.total == acc[r.k]


asof_strategy = st.tuples(
    st.lists(  # left events: (key, offset_s)
        st.tuples(st.integers(1, 2), st.floats(0, 600, allow_nan=False)),
        min_size=1, max_size=20,
    ),
    st.lists(  # right events
        st.tuples(st.integers(1, 2), st.floats(0, 600, allow_nan=False)),
        min_size=1, max_size=20,
    ),
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_strategy)
def test_asof_join_matches_pandas_merge_asof(spark, data):
    """Our union-timeline as-of join must agree with pandas.merge_asof
    (backward, 30 s tolerance) on arbitrary timelines."""
    import pandas as pd

    from mbai_gdb_spark.ops.intervals import asof_join

    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=off), i) for i, (k, off) in enumerate(left_rows)],
        "k long, t timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(k, BASE + timedelta(seconds=off), 100 + i) for i, (k, off) in enumerate(right_rows)],
        "k long, t timestamp, rid long",
    )
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, ["k"], "t", "t", ["rid"], tolerance_seconds=30.0
        ).collect()
    }

    lp = left.toPandas().sort_values(["t", "lid"], kind="mergesort")
    rp = right.toPandas().sort_values(["t", "rid"], kind="mergesort")
    want_all = {}
    for k in lp.k.unique():
        lk = lp[lp.k == k]
        rk = rp[rp.k == k]
        if rk.empty:
            continue
        m = pd.merge_asof(
            lk, rk, on="t", direction="backward", tolerance=pd.Timedelta(seconds=30)
        )
        for _, row in m.iterrows():
            if pd.notna(row.rid):
                want_all[int(row.lid)] = int(row.rid)
    # merge_asof ties: when multiple right rows share the match timestamp,
    # pandas takes the LAST in sort order; ours takes the last in
    # (t, arrival) order too — both deterministic.  Compare matched keys
    # and timestamps rather than exact rid on ties.
    assert set(got) == set(want_all)
    rid_ts = {
        100 + i: off for i, (_, off) in enumerate(right_rows)
    }
    for lid, rid in got.items():
        assert abs(rid_ts[rid] - rid_ts[want_all[lid]]) < 1e-9


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.tuples(st.integers(1, 2), st.floats(0, 100, allow_nan=False)), min_size=1, max_size=15),
    st.lists(
        st.tuples(st.integers(1, 2), st.floats(0, 100, allow_nan=False), st.floats(0, 50, allow_nan=False)),
        min_size=1, max_size=10,
    ),
)
def test_interval_join_matches_brute_force(spark, points, spans):
    from mbai_gdb_spark.ops.intervals import interval_join

    events = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(points)], "k long, t double, eid long"
    )
    intervals = spark.createDataFrame(
        [(k, lo, lo + w, 100 + i) for i, (k, lo, w) in enumerate(spans)],
        "k long, lo double, hi double, iid long",
    )
    got = {
        (r.eid, r.iid)
        for r in interval_join(events, intervals, ["k"], "t", "lo", "hi", closed="left").collect()
    }
    want = {
        (eid, 100 + j)
        for eid, (k, t) in enumerate(points)
        for j, (ik, lo, w) in enumerate(spans)
        if k == ik and lo <= t < lo + w
    }
    assert got == want


spans_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2),                     # key
        st.floats(min_value=0, max_value=100, allow_nan=False),    # start
        st.floats(min_value=0, max_value=30, allow_nan=False),     # width
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(spans_strategy, spans_strategy)
def test_interval_overlap_join_matches_brute_force(spark, lspans, rspans):
    """Binned overlap join ≡ the theta-join definition, for arbitrary
    interval layouts (including degenerate zero-width and multi-bin
    spans) under both closed conventions."""
    from mbai_gdb_spark.ops.intervals import interval_overlap_join

    left = spark.createDataFrame(
        [(k, lo, lo + w, i) for i, (k, lo, w) in enumerate(lspans)],
        "k long, ls double, le double, lid long",
    )
    right = spark.createDataFrame(
        [(k, lo, lo + w, 100 + i) for i, (k, lo, w) in enumerate(rspans)],
        "k long, rs double, re double, rid long",
    )
    for closed in ("left", "both"):
        got_rows = interval_overlap_join(
            left, right, ["k"], "ls", "le", "rs", "re", bin_width=7.0, closed=closed
        ).collect()
        got = [(r.lid, r.rid) for r in got_rows]
        assert len(got) == len(set(got))  # emit-once: no duplicate pairs
        want = set()
        for i, (lk, llo, lw) in enumerate(lspans):
            for j, (rk, rlo, rw) in enumerate(rspans):
                if lk != rk:
                    continue
                if closed == "left":
                    hit = llo < rlo + rw and rlo < llo + lw
                else:
                    hit = llo <= rlo + rw and rlo <= llo + lw
                if hit:
                    want.add((i, 100 + j))
        assert set(got) == want


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ),
    min_size=0,
    max_size=40,
)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges_strategy)
def test_connected_components_matches_union_find(spark, edge_list):
    """Pointer-doubling CC ≡ a driver-side union-find, for arbitrary
    graphs — including shapes (long chains) where plain label
    propagation would exceed its iteration budget."""
    from mbai_gdb_spark.ops.graph import connected_components

    n = 25
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_list] or [(0, 0)], "src long, dst long"
    )
    got = {
        r.id: r.component for r in connected_components(vertices, edges).collect()
    }

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {v: find(v) for v in range(n)}
    # canonicalize: both sides label a component by its min member
    assert len(got) == n
    assert got == want


def test_cosine_topk_vectorized_exact_ties_across_batches(spark):
    """Duplicate corpus vectors produce EXACT score ties; with the
    corpus split over many partitions the tie-break (smallest vec_id)
    must still match the HOF path globally — the batch-local lexsort
    may never drop a tied global winner."""
    from mbai_gdb_spark.ops.similarity import cosine_topk, cosine_topk_vectorized

    patterns = [
        [10.0, 1.0, 0.0, 0.0],
        [1.0, 10.0, 0.0, 0.0],
        [0.0, 1.0, 10.0, 1.0],
    ]
    rows = [(i, patterns[i % 3]) for i in range(30)]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(13)
    queries = spark.createDataFrame(rows[:2], "vec_id long, embedding array<double>")
    # k=12 crosses the 10-member tie group of each query's own pattern
    want = sorted(
        map(
            tuple,
            cosine_topk(corpus, queries, k=12)
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    got = sorted(
        map(
            tuple,
            cosine_topk_vectorized(corpus, queries, k=12)
            .select("query_id", "vec_id", "rank")
            .collect(),
        )
    )
    assert got == want and len(got) == 24


# ---------------------------------------------------------------------------
# triangle_count vs brute-force enumeration
# ---------------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)),
    min_size=0,
    max_size=60,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges_strategy)
def test_triangle_count_matches_brute_force(spark, edges):
    from itertools import combinations

    from mbai_gdb_spark.ops.graph import triangle_count

    eset = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    expected: dict[int, int] = {}
    for a, b, c in combinations(sorted({x for e in eset for x in e}), 3):
        if (a, b) in eset and (a, c) in eset and (b, c) in eset:
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    if edges:
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.vertex: r.n_triangles for r in triangle_count(df).collect()}
    else:
        got = {}
    assert got == expected


# ---------------------------------------------------------------------------
# heavy_hitters vs exact GROUP BY ... HAVING
# ---------------------------------------------------------------------------

multiset_strategy = st.lists(
    st.integers(min_value=0, max_value=15), min_size=1, max_size=120
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(multiset_strategy, st.integers(min_value=1, max_value=10))
def test_heavy_hitters_matches_exact_having(spark, values, threshold):
    from collections import Counter

    from mbai_gdb_spark.ops.sketch import heavy_hitters

    df = spark.createDataFrame([(v,) for v in values], "val long")
    # width=4 stresses CMS collisions: candidates widen, output must not.
    got = {
        r.val: r.n_occurrences
        for r in heavy_hitters(df, "val", threshold, depth=2, width=4).collect()
    }
    expected = {v: c for v, c in Counter(values).items() if c >= threshold}
    assert got == expected
