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
