"""Per-output attribution for the nba_game_pipeline bench tiers.

The bench materializes 4 outputs CONCURRENTLY from a thread pool, so
tools/profile_query.py cannot attribute their stages (job descriptions
are thread-local).  This runs the same pipeline but materializes the
fan-out caches and each output SEQUENTIALLY, each labelled, and prints
per-step walls — enough to rank the outputs before optimizing.

Usage: python tools/profile_nba_pipeline.py [n_games] [reps]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_games = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from bench import _stage_nba_corpus
    from mbai_gdb_spark.pipeline.plus_minus import game_pipeline
    from mbai_gdb_spark.session import get_spark

    spark = get_spark("profile-nba")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix=f"profnba_{n_games}_")
    try:
        _stage_nba_corpus(spark, n_games, base)
        pbp = spark.read.parquet(base + "/pbp")
        st = spark.read.parquet(base + "/starters")
        home = spark.read.parquet(base + "/home")
        outputs = ("lineup_plus_minus", "player_plus_minus", "scores", "action_next")
        for rep in range(reps):
            t_all = time.perf_counter()
            tables = game_pipeline(pbp, st, home)
            steps: list[tuple[str, float]] = []
            t0 = time.perf_counter()
            steps.append(("plan_construction", t0 - t_all))
            for fan in ("lineup_stints", "actions", "player_stints"):
                if tables[fan].is_cached:
                    spark.sparkContext.setJobDescription(f"fanout:{fan}")
                    t = time.perf_counter()
                    tables[fan].count()
                    steps.append((f"fanout:{fan}", time.perf_counter() - t))
            for name in outputs:
                spark.sparkContext.setJobDescription(f"out:{name}")
                t = time.perf_counter()
                tables[name].write.format("noop").mode("overwrite").save()
                steps.append((f"out:{name}", time.perf_counter() - t))
            total = time.perf_counter() - t_all
            for fan in ("lineup_stints", "actions", "player_stints"):
                if tables[fan].is_cached:
                    tables[fan].unpersist()
            print(f"-- rep {rep} n_games={n_games} total={total:.2f}s (sequential)")
            for nm, s in steps:
                print(f"   {nm:28s} {s:6.2f}s")
            sys.stdout.flush()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
