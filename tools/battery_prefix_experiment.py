"""Battery-pollution experiment (r14): run the first N HEADLINE queries
exactly as bench.py does (cold+warm, noop sink, same periodic GC) and
print per-query warm times — used to A/B session-level variables
(driver heap, GC cadence) that the full battery would take 20 minutes
to resolve.

Usage: python tools/battery_prefix_experiment.py [N] [--gc-every K]
Heap comes from $SPARK_GRAFT_DRIVER_MEM (session.py default 8g).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 24
    gc_every = 8
    if "--gc-every" in sys.argv:
        gc_every = int(sys.argv[sys.argv.index("--gc-every") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import mbai_gdb_spark.queries_north  # noqa: F401
    from mbai_gdb_spark.queries import QUERIES
    from mbai_gdb_spark.session import get_spark

    spark = get_spark("battery-prefix")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["a1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    t_start = time.perf_counter()
    for qi, name in enumerate(HEADLINE[:n]):
        fn = QUERIES.get(name)
        if fn is None:
            continue
        if qi and gc_every and qi % gc_every == 0:
            gc.collect()
            spark.catalog.clearCache()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm[name] = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "n": n,
                "gc_every": gc_every,
                "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
                "wall": round(time.perf_counter() - t_start, 2),
                "warm_sum": round(sum(warm.values()), 2),
                "cold_sum": round(sum(cold.values()), 2),
                "warm": warm,
            }
        )
    )


if __name__ == "__main__":
    main()
