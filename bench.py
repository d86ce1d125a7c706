"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully executed JVM-side via the noop sink (no driver
collect), so the timing reflects the distributed plan, not Python
serialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "flagship_session_attribution",
    "a1_pricing_summary",
    "j1_region_revenue",
    "j5_local_supplier_revenue",
    "j3_purchases_in_sessions",
    "j7_asof_click_to_view",
    "w5_sessionize_events",
    "w8_running_total_reset",
    "o3_top10_customers_by_revenue",
    "sim_cosine_top5",
    "text_fingerprint",
    # Round-2 north-star breadth (regression gate on the dedup/ANN path)
    "dedup_minhash_lsh",
    "sim_ivf_top5",
    "text_profile",
    # Training-pipeline additions: packing, decontamination, sketches
    "pack_sequences",
    "decontam_eval_overlap",
    "sketch_kmv_distinct",
    "text_repetition",
    # Curation additions: cross-doc span dedup signal, domain mixing
    "text_dup_spans",
    "mix_source_weights",
    # Embedding-quality eval: fixed-point centroids + nearest-centroid
    "emb_centroid_classify",
]


def _bench_nba_pipeline(spark, n_games: int) -> float:
    """Time the full EP2 game pipeline (periods → lineup kernel → stints →
    actions → scores → plus-minus) across a multi-game corpus."""
    import time as _time

    from mbai_gdb_spark.pipeline.fixtures import PBP_DDL, STARTERS_DDL, make_game
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline

    pbp_rows, starter_rows, home_rows = [], [], []
    for i in range(n_games):
        gid = 9000 + i
        pbp, st = make_game(game_id=gid, home_team=10, away_team=20, n_ot=i % 2, seed=i)
        pbp_rows += pbp
        starter_rows += st
        home_rows.append((gid, 10))
    pbp_df = spark.createDataFrame(pbp_rows, PBP_DDL)
    st_df = spark.createDataFrame(starter_rows, STARTERS_DDL)
    home_df = spark.createDataFrame(home_rows, "game_id long, home_team_id long")

    from mbai_gdb_spark.pipeline.plus_minus import materialize_outputs

    t0 = _time.perf_counter()
    tables = game_pipeline(pbp_df, st_df, home_df)
    materialize_outputs(
        tables, ("lineup_plus_minus", "player_plus_minus", "scores", "action_next")
    )
    return _time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    import mbai_gdb_spark.queries_north  # noqa: F401  (registers north-star queries)
    from mbai_gdb_spark.queries import QUERIES
    from mbai_gdb_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers once (excluded from per-query times).
    QUERIES["a1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Each query runs twice; the reported figure is the SECOND run
    # (steady state).  The first run pays one-off whole-stage-codegen
    # compilation (~1-2 s), which at sf0.1 is the same order as the
    # query itself and pure noise w.r.t. 100 TB throughput; cold times
    # stay visible in "queries_cold" so the overhead is not hidden.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    def _cleanup() -> None:
        # Release leftovers from the query sweep (localCheckpoint blocks,
        # cached fan-outs) so the pipeline entries time the PIPELINE, not
        # a major GC of 36 prior query executions' garbage — measured
        # skew without this: 18 s vs 6.5 s for the same 20-game run.
        import gc

        gc.collect()
        spark.catalog.clearCache()

    _cleanup()
    cold["nba_game_pipeline_20"] = round(_bench_nba_pipeline(spark, n_games=20), 3)
    _cleanup()
    timings["nba_game_pipeline_20"] = round(_bench_nba_pipeline(spark, n_games=20), 3)
    _cleanup()
    timings["nba_game_pipeline_200"] = round(
        _bench_nba_pipeline(spark, n_games=200), 3
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
