"""Streaming rebound→shot claim-once attribution ≡ the batch kernel.

The batch ``attribute_rebounds`` (J7 as-of + J8 claim-once) is the one
remaining batch operator that had no streaming twin; round 8 adds it as
a single applyInPandasWithState operator (``streaming.joins.
rebound_attribution``).  This fixture pins, across DIFFERENT micro-batch
splits of the same data:

- as-of: a rebound resolves to the LATEST missed shot within 10 s
  before it (inclusive tolerance boundary);
- claim-once: of several rebounds picking the same shot, the EARLIEST
  wins; the losers are dropped entirely, never reassigned to an older
  shot (R4 picks C, loses to R3, and does NOT fall back to B);
- game scoping (a game-2 shot is invisible to game-1 rebounds);
- a rebound with no candidate shot is dropped (inner as-of);
- cross-micro-batch arrival (a shot landing in a later file than its
  rebound still matches — watermark-buffered state);
- the twin's pinned exact-tie order (same shot_ts → higher shot_id),
  which the batch union-timeline window leaves unspecified.
"""

from __future__ import annotations

from datetime import datetime, timedelta

BASE = datetime(2024, 1, 1, 12, 0, 0)


def _ts(sec: float) -> datetime:
    return BASE + timedelta(seconds=sec)


SHOT_DDL = "game_id long, shot_id long, ts timestamp"
REB_DDL = "game_id long, rebound_id long, ts timestamp"

# (game, shot_id, t_sec) — all MISSED field goals
SHOTS = [
    (1, 1001, 0.0),  # A: claimed by R1 (earliest of R1/R2)
    (1, 1002, 20.0),  # B: only ever second-latest -> never claimed
    (1, 1003, 25.0),  # C: picked by R3 and R4; R3 (earlier) wins
    (1, 1004, 40.0),  # D: claimed by R5 at the exact 10 s boundary
    (1, 1005, 80.0),  # G: arrives in file 2, AFTER its rebound R9
    (2, 1101, 5.0),  # F: game-2 scoping
]
REBOUNDS = [
    (1, 2001, 5.0),  # R1 -> A (wins)
    (1, 2002, 8.0),  # R2 -> A (loses to R1, dropped)
    (1, 2003, 26.0),  # R3 -> C (wins)
    (1, 2004, 28.0),  # R4 -> C (loses; NOT reassigned to B)
    (1, 2005, 50.0),  # R5 -> D (50-40 = tolerance, inclusive)
    (1, 2006, 70.0),  # R6: no shot within 10 s -> dropped
    (1, 2007, 85.0),  # R9 -> G (shot arrives in a later micro-batch)
    (2, 2101, 7.0),  # R8 -> F
]
# Far-future flush rows: push the final watermark (2 min delay) past
# every decision horizon above.
FLUSH_SHOT = (99, 9901, 600.0)

EXPECTED = {
    (1, 2001, 1001),
    (1, 2003, 1003),
    (1, 2005, 1004),
    (1, 2007, 1005),
    (2, 2101, 1101),
}


def _batch_expected(spark):
    """Run the BATCH kernel on the same fixture (game-clock seconds as
    the numeric timeline) and return its attribution set."""
    from mbai_gdb_spark.pipeline.actions import attribute_rebounds

    rows = [
        (g, sid, "2pt", False, float(t)) for g, sid, t in SHOTS + [FLUSH_SHOT]
    ] + [(g, rid, "rebound", False, float(t)) for g, rid, t in REBOUNDS]
    actions = spark.createDataFrame(
        rows,
        "game_id long, action_id long, action_type string, "
        "is_made boolean, global_clock double",
    )
    out = attribute_rebounds(actions)
    return {(r.game_id, r.rebound_id, r.shot_id) for r in out.collect()}


def _drain(spark, tmp_path, shot_files, reb_files, tag: str):
    from mbai_gdb_spark.streaming.joins import rebound_attribution

    ssrc = str(tmp_path / f"shots_{tag}")
    rsrc = str(tmp_path / f"rebs_{tag}")
    for chunk in shot_files:
        rows = [(g, i, _ts(t)) for g, i, t in chunk]
        spark.createDataFrame(rows, SHOT_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(ssrc)
    for chunk in reb_files:
        rows = [(g, i, _ts(t)) for g, i, t in chunk]
        spark.createDataFrame(rows, REB_DDL).coalesce(1).write.mode(
            "append"
        ).parquet(rsrc)
    shots = (
        spark.readStream.schema(SHOT_DDL).option("maxFilesPerTrigger", 1).parquet(ssrc)
    )
    rebs = (
        spark.readStream.schema(REB_DDL).option("maxFilesPerTrigger", 1).parquet(rsrc)
    )
    out = rebound_attribution(rebs, shots, tolerance_seconds=10.0, watermark="2 minutes")
    sink = str(tmp_path / f"out_{tag}")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    return {
        (r.game_id, r.rebound_id, r.shot_id)
        for r in spark.read.parquet(sink).collect()
    }


def test_stream_matches_batch_kernel(spark, tmp_path):
    assert _batch_expected(spark) == EXPECTED  # the batch kernel's answer

    # Split 1: everything except shot G and rebound R4/R5/R6 in file 1;
    # G, the game-2 rebound, the remaining rebounds, and the flush in
    # file 2 — shot G arrives AFTER its rebound R9.
    got = _drain(
        spark,
        tmp_path,
        shot_files=[SHOTS[:4] + [SHOTS[5]], [SHOTS[4], FLUSH_SHOT]],
        reb_files=[REBOUNDS[:4] + [REBOUNDS[6]], REBOUNDS[4:6] + [REBOUNDS[7]]],
        tag="split1",
    )
    assert got == EXPECTED


def test_stream_single_batch_same_answer(spark, tmp_path):
    # Same data, one file per side: micro-batch boundaries must not
    # change the result (finalization is watermark-driven).
    got = _drain(
        spark,
        tmp_path,
        shot_files=[SHOTS + [FLUSH_SHOT]],
        reb_files=[REBOUNDS],
        tag="single",
    )
    assert got == EXPECTED


def test_exact_shot_ts_tie_pinned_to_higher_shot_id(spark, tmp_path):
    # Two missed shots at the SAME instant; the twin documents the tie
    # as (shot_ts, shot_id) MAX -> higher shot_id wins.  (The batch
    # union-timeline window leaves this unordered, which is why the
    # equivalence fixture above avoids ties.)
    shots = [(1, 5001, 60.0), (1, 5002, 60.0), FLUSH_SHOT]
    rebs = [(1, 6001, 62.0)]
    got = _drain(spark, tmp_path, [shots], [rebs], tag="tie")
    assert got == {(1, 6001, 5002)}
