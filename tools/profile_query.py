"""Per-stage profiler for registry queries (r14 optimization instrument).

Runs named queries (cold + warm, noop sink) in ONE fresh session with the
Spark event log enabled, then parses the log into a per-stage report:
wall, summed task time, task count, max/median task skew, shuffle bytes,
input bytes — attributed to the enclosing job's description
("<query>#cold" / "<query>#warm").  This is the guide-§1 empirical loop
without a live UI (spark.ui.enabled is false in this sandbox).

Usage:
    python tools/profile_query.py <sf_dir> <query> [<query> ...]
    python tools/profile_query.py <sf_dir> --top N <query>   # top-N stages

Output: one human-readable block per query run, warm run first.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _run(sf_dir: str, names: list[str], log_dir: str) -> dict[str, dict[str, float]]:
    import mbai_gdb_spark.queries_nba  # noqa: F401
    import mbai_gdb_spark.queries_north  # noqa: F401
    import mbai_gdb_spark.queries_tpch  # noqa: F401
    from mbai_gdb_spark.queries import QUERIES
    from mbai_gdb_spark.session import _RUNTIME_CONF

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    b = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", "file://" + log_dir)
        .config("spark.eventLog.compress", "false")
        .config("spark.eventLog.rolling.enabled", "false")
    )
    for k, v in _RUNTIME_CONF.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # JVM warm-up excluded from the profile (same shape as bench.py).
    warm = "a1_pricing_summary" if "a1_pricing_summary" not in names else "a7_distinct_segments"
    QUERIES[warm](spark, sf_dir).write.format("noop").mode("overwrite").save()

    import re as _re

    walls: dict[str, dict[str, float]] = {}
    for name in names:
        m = _re.fullmatch(r"nba_game_pipeline_(\d+)", name)
        walls[name] = {}
        for phase in ("cold", "warm"):
            spark.sparkContext.setJobDescription(f"{name}#{phase}")
            t0 = time.perf_counter()
            if m:
                from bench import _bench_nba_pipeline

                _bench_nba_pipeline(spark, int(m.group(1)))
            else:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            walls[name][phase] = time.perf_counter() - t0
            spark.sparkContext.setJobDescription(None)
    spark.stop()
    return walls


def _parse(log_dir: str) -> tuple[dict, dict, dict]:
    """→ (stage_meta, stage_tasks, job_of_stage) keyed by stage id."""
    files = []
    for f in os.listdir(log_dir):
        p = os.path.join(log_dir, f)
        if f.startswith("."):
            continue
        if os.path.isdir(p):  # Spark 4 rolling event-log dir (v2)
            files.extend(
                os.path.join(p, g)
                for g in os.listdir(p)
                if g.startswith("events_") or g.startswith("eventLog")
            )
        else:
            files.append(p)
    stage_meta: dict[int, dict] = {}
    stage_tasks: dict[int, list[dict]] = {}
    job_desc: dict[int, str] = {}
    job_of_stage: dict[int, str] = {}
    for path in files:
        with open(path) as fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    desc = (ev.get("Properties") or {}).get(
                        "spark.job.description"
                    ) or ""
                    jid = ev["Job ID"]
                    job_desc[jid] = desc
                    for sid in ev.get("Stage IDs", []):
                        job_of_stage[sid] = desc
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    com = si.get("Completion Time")
                    stage_meta[sid] = {
                        "name": si.get("Stage Name", ""),
                        "wall_ms": (com - sub) if sub and com else 0,
                        "n_tasks": si.get("Number of Tasks", 0),
                    }
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    tm = ev.get("Task Metrics") or {}
                    sr = tm.get("Shuffle Read Metrics") or {}
                    sw = tm.get("Shuffle Write Metrics") or {}
                    inp = tm.get("Input Metrics") or {}
                    stage_tasks.setdefault(sid, []).append(
                        {
                            "run_ms": tm.get("Executor Run Time", 0),
                            "cpu_ms": (tm.get("Executor CPU Time", 0)) / 1e6,
                            "fetch_ms": sr.get("Fetch Wait Time", 0),
                            "sh_read": sr.get("Local Bytes Read", 0)
                            + sr.get("Remote Bytes Read", 0),
                            "sh_write": sw.get("Shuffle Bytes Written", 0),
                            "input": inp.get("Bytes Read", 0),
                        }
                    )
    return stage_meta, stage_tasks, job_of_stage


def main() -> None:
    args = [a for a in sys.argv[1:]]
    top_n = 12
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]
    sf_dir, names = args[0], args[1:]
    log_dir = tempfile.mkdtemp(prefix="profile_evlog_")
    try:
        walls = _run(sf_dir, names, log_dir)
        stage_meta, stage_tasks, job_of_stage = _parse(log_dir)
        for name in names:
            for phase in ("warm", "cold"):
                desc = f"{name}#{phase}"
                sids = sorted(
                    s for s, d in job_of_stage.items() if d == desc and s in stage_meta
                )
                print(f"\n=== {desc}  wall={walls[name][phase]:.2f}s  "
                      f"stages={len(sids)} ===")
                rows = []
                for sid in sids:
                    m = stage_meta[sid]
                    tasks = stage_tasks.get(sid, [])
                    run = sorted(t["run_ms"] for t in tasks) or [0]
                    rows.append(
                        {
                            "sid": sid,
                            "wall": m["wall_ms"] / 1e3,
                            "sum_run": sum(run) / 1e3,
                            "cpu": sum(t["cpu_ms"] for t in tasks) / 1e3,
                            "n": len(tasks),
                            "max_run": run[-1] / 1e3,
                            "med_run": run[len(run) // 2] / 1e3,
                            "fetch": sum(t["fetch_ms"] for t in tasks) / 1e3,
                            "sh_r": sum(t["sh_read"] for t in tasks),
                            "sh_w": sum(t["sh_write"] for t in tasks),
                            "inp": sum(t["input"] for t in tasks),
                            "name": m["name"].split("\n")[0][:70],
                        }
                    )
                rows.sort(key=lambda r: -r["wall"])
                total_wall = sum(r["wall"] for r in rows)
                print(f"  stage-wall total {total_wall:.2f}s "
                      f"(gaps/driver = {walls[name][phase] - total_wall:.2f}s)")
                hdr = (f"  {'sid':>4} {'wall':>6} {'sumRun':>7} {'cpu':>7} "
                       f"{'n':>4} {'max':>6} {'med':>6} {'fetch':>6} "
                       f"{'shR MB':>7} {'shW MB':>7} {'in MB':>7}  name")
                print(hdr)
                for r in rows[:top_n]:
                    print(
                        f"  {r['sid']:>4} {r['wall']:>6.2f} {r['sum_run']:>7.2f} "
                        f"{r['cpu']:>7.2f} {r['n']:>4} {r['max_run']:>6.2f} "
                        f"{r['med_run']:>6.2f} {r['fetch']:>6.2f} "
                        f"{r['sh_r'] / 1e6:>7.1f} {r['sh_w'] / 1e6:>7.1f} "
                        f"{r['inp'] / 1e6:>7.1f}  {r['name']}"
                    )
        known = {f"{n}#{p}" for n in names for p in ("cold", "warm")}
        other = sorted(
            (
                s
                for s, d in job_of_stage.items()
                if d not in known and s in stage_meta
            )
        )
        if other:
            print(f"\n=== (unattributed: pool-thread jobs etc.)  "
                  f"stages={len(other)} ===")
            rows = sorted(
                (
                    {
                        "sid": sid,
                        "wall": stage_meta[sid]["wall_ms"] / 1e3,
                        "n": len(stage_tasks.get(sid, [])),
                        "sum_run": sum(
                            t["run_ms"] for t in stage_tasks.get(sid, [])
                        )
                        / 1e3,
                        "name": stage_meta[sid]["name"].split("\n")[0][:70],
                    }
                    for sid in other
                ),
                key=lambda r: -r["wall"],
            )
            print(f"  stage-wall total {sum(r['wall'] for r in rows):.2f}s")
            for r in rows[:top_n]:
                print(
                    f"  {r['sid']:>4} {r['wall']:>6.2f} {r['sum_run']:>7.2f} "
                    f"{r['n']:>4}  {r['name']}"
                )
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
