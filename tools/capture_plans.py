"""Capture .explain("formatted") output for registry queries.

Usage:
    python tools/capture_plans.py <tag> [query ...]

Writes plans/$SPARK_GRAFT_PLANS_ROUND/<name>_<tag>.txt (round defaults
to r15) for each named query (default: the bench HEADLINE list).  The
tag is normally "before" or "after" — the optimization-round evidence
files the judge diffs against the code.

Plans are captured from the same tuned session bench.py uses, at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), so Exchange
placement/join strategies match what the battery actually ran.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import mbai_gdb_spark.queries_nba  # noqa: F401
    import mbai_gdb_spark.queries_north  # noqa: F401
    import mbai_gdb_spark.queries_tpch  # noqa: F401
    from mbai_gdb_spark.queries import QUERIES
    from mbai_gdb_spark.session import get_spark

    if not names:
        from bench import HEADLINE

        names = [n for n in HEADLINE if n in QUERIES]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            print(f"skip {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture what we can, keep going
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
            print(f"warn {name}: {exc!r}", file=sys.stderr)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
