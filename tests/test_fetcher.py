"""Rate-limited fetch loop: pacing proven on a fake clock, retry with
backoff, per-key failure isolation, and end-to-end payload → snapshot
decode.  The sandbox never dials a network — the transport is a fake."""

from __future__ import annotations

import json

import pytest

from mbai_gdb_spark.sources.fetcher import (
    FetchResult,
    RateLimitedFetcher,
    payloads_df,
)


class FakeClock:
    def __init__(self):
        self.t = 100.0
        self.sleeps: list[float] = []

    def clock(self):
        return self.t

    def sleep(self, s):
        assert s >= 0
        self.sleeps.append(round(s, 6))
        self.t += s


def test_call_starts_are_spaced_by_min_interval():
    clk = FakeClock()
    starts = []

    def transport(key):
        starts.append(clk.t)
        clk.t += 0.05  # request itself takes 50 ms
        return b"ok" + str(key).encode()

    f = RateLimitedFetcher(
        transport, min_interval=0.5, clock=clk.clock, sleep=clk.sleep
    )
    out = f.fetch_many(range(4))
    assert [r.payload for r in out] == [b"ok0", b"ok1", b"ok2", b"ok3"]
    assert all(r.attempts == 1 and r.error is None for r in out)
    gaps = [b - a for a, b in zip(starts, starts[1:])]
    assert all(abs(g - 0.5) < 1e-9 for g in gaps), gaps  # politeness enforced
    # the 50 ms request time counts toward the interval — only the
    # remaining 450 ms is slept
    assert clk.sleeps[0] == pytest.approx(0.45)


def test_retry_backoff_then_success():
    clk = FakeClock()
    calls = {"n": 0}

    def flaky(key):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ConnectionError("reset")
        return b"finally"

    f = RateLimitedFetcher(
        flaky, min_interval=0.5, max_retries=3, backoff=2.0,
        clock=clk.clock, sleep=clk.sleep,
    )
    r = f.fetch("k")
    assert r.payload == b"finally" and r.attempts == 3 and r.error is None
    # backoff sleeps (0.5, 1.0) interleave with pacing sleeps
    assert 0.5 in clk.sleeps and 1.0 in clk.sleeps


def test_exhausted_retries_record_error_and_do_not_abort_batch():
    clk = FakeClock()

    def transport(key):
        if key == "bad":
            raise TimeoutError("slow api")
        return b"ok"

    f = RateLimitedFetcher(
        transport, min_interval=0.1, max_retries=2, clock=clk.clock, sleep=clk.sleep
    )
    out = f.fetch_many(["a", "bad", "b"])
    by_key = {r.key: r for r in out}
    assert by_key["a"].payload == b"ok"
    assert by_key["b"].payload == b"ok"  # batch continued past the failure
    assert by_key["bad"].payload is None
    assert by_key["bad"].attempts == 3
    assert "TimeoutError" in by_key["bad"].error


def test_bad_parameters_rejected():
    with pytest.raises(ValueError):
        RateLimitedFetcher(lambda k: b"", min_interval=-1)
    with pytest.raises(ValueError):
        RateLimitedFetcher(lambda k: b"", backoff=0.5)


def test_fetched_payloads_decode_through_snapshot_reader(spark):
    """End-to-end: fake REST transport → fetcher → payloads_df → the
    team snapshot reader — the full ingestion path of the reference's
    fetch_teams, minus the real socket."""
    from mbai_gdb_spark.sources.api_snapshot import read_team_snapshot

    static = json.dumps(
        {
            "teams": [
                {"id": 1, "full_name": "Alpha", "abbreviation": "AAA",
                 "city": "A-town", "state": "ST"},
                {"id": 2, "full_name": "Beta", "abbreviation": "BBB",
                 "city": "B-ville", "state": "ST"},
            ]
        }
    )

    def transport(key):
        if key == "teams":
            return static.encode()
        tid = int(str(key).split("/")[1])
        if tid == 2:
            raise ConnectionError("flaked permanently")
        return json.dumps(
            {
                "resultSets": [
                    {
                        "name": "TeamBackground",
                        "headers": ["TEAM_ID", "ARENA"],
                        "rowSet": [[tid, f"Arena {tid}"]],
                    }
                ]
            }
        ).encode()

    clk = FakeClock()
    f = RateLimitedFetcher(
        transport, min_interval=0.5, max_retries=1, clock=clk.clock, sleep=clk.sleep
    )
    static_res = f.fetch_many(["teams"])
    detail_res = f.fetch_many(["details/1", "details/2"])

    static_df = payloads_df(spark, static_res).filter("payload IS NOT NULL")
    details_df = payloads_df(spark, detail_res).filter("payload IS NOT NULL")
    out = {r.id: r.arena for r in read_team_snapshot(static_df, details_df).collect()}
    # team 2's details fetch failed → NULL arena via the left join, but
    # the team row itself survives (per-key isolation, not batch abort)
    assert out == {1: "Arena 1", 2: None}


def test_payloads_df_schema(spark):
    df = payloads_df(
        spark,
        [FetchResult("k1", b"abc", 1, None), FetchResult("k2", None, 3, "boom")],
    )
    rows = {r.request_key: r for r in df.collect()}
    assert rows["k1"].payload == "abc" and rows["k1"].error is None
    assert rows["k2"].payload is None and rows["k2"].error == "boom"
    assert rows["k2"].attempts == 3
