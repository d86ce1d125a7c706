"""Multi-game isolation: running the pipeline over a concatenated corpus
must produce per-game results identical to running each game alone.

This guards the engine against the reference's own defect class —
containment joins missing the game scope (SURVEY §2.11: MERGE_TURNOVERS
/ MERGE_TIMEOUTS collide stints across games; MERGE_REBOUNDS unscoped).
Every join/window in our pipeline keys on game_id; this test proves it.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from mbai_gdb_spark.pipeline.fixtures import PBP_DDL, STARTERS_DDL, make_game
from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

GAMES = [(3001, 3), (3002, 11), (3003, 27)]  # (game_id, seed)


def _corpus(spark):
    pbp_rows, starter_rows, home_rows = [], [], []
    for gid, seed in GAMES:
        pbp, st = make_game(game_id=gid, home_team=10, away_team=20, n_ot=gid % 2, seed=seed)
        pbp_rows += pbp
        starter_rows += st
        home_rows.append((gid, 10))
    return (
        spark.createDataFrame(pbp_rows, PBP_DDL),
        spark.createDataFrame(starter_rows, STARTERS_DDL),
        spark.createDataFrame(home_rows, "game_id long, home_team_id long"),
    )


def test_per_game_results_unchanged_by_concatenation(spark):
    pbp, starters, home = _corpus(spark)
    combined = game_pipeline(pbp, starters, home)

    for gid, seed in GAMES:
        pbp1, st1 = (
            spark.createDataFrame(p, ddl)
            for p, ddl in zip(
                make_game(game_id=gid, home_team=10, away_team=20, n_ot=gid % 2, seed=seed),
                (PBP_DDL, STARTERS_DDL),
            )
        )
        single = game_pipeline(
            pbp1, st1, spark.createDataFrame([(gid, 10)], "game_id long, home_team_id long")
        )
        for table in (
            "lineup_plus_minus",
            "scores",
            "rebound_attribution",
            "action_edges",
            "stint_next",
        ):
            got = sorted(
                map(tuple, combined[table].filter(F.col("game_id") == gid).collect())
            )
            want = sorted(map(tuple, single[table].collect()))
            assert got == want, f"{table} differs for game {gid}"


def test_plus_minus_reconciles_per_game(spark):
    pbp, starters, home = _corpus(spark)
    t = game_pipeline(pbp, starters, home)
    finals = {
        r.game_id: r.margin
        for r in t["scores"]
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("game_id").orderBy(
                    F.desc("global_clock"), F.desc("score_action_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .collect()
    }
    pm = {
        (r.game_id, r.team_id): r.pm
        for r in t["lineup_plus_minus"]
        .groupBy("game_id", "team_id")
        .agg(F.sum("plus_minus").alias("pm"))
        .collect()
    }
    for gid, _ in GAMES:
        assert pm[(gid, 10)] == finals[gid]
        assert pm[(gid, 20)] == -finals[gid]


def test_partitioned_storage_roundtrip_with_pruning(spark, tmp_path):
    """The production storage path: play-by-play written partitioned by
    game_id (sorted by time within partitions), pipeline run over a
    pruned subset — the plan must read only the selected partitions and
    the results must match the in-memory pipeline."""
    from mbai_gdb_spark.io import write_partitioned

    pbp, starters, home = _corpus(spark)
    path = str(tmp_path / "pbp_store")
    write_partitioned(pbp, path, ["game_id"], sort_cols=["timeActual"])

    stored = spark.read.parquet(path).filter(F.col("game_id") == 3001)
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(game_id" in plan

    t_disk = game_pipeline(
        stored,
        starters.filter(F.col("game_id") == 3001),
        home.filter(F.col("game_id") == 3001),
    )
    t_mem = game_pipeline(
        pbp.filter(F.col("game_id") == 3001),
        starters.filter(F.col("game_id") == 3001),
        home.filter(F.col("game_id") == 3001),
    )
    got = sorted(map(tuple, t_disk["lineup_plus_minus"].collect()))
    want = sorted(map(tuple, t_mem["lineup_plus_minus"].collect()))
    assert got == want
