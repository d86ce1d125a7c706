"""Local mimic of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet, then compares row count, column names/order
(sorted), and an order-insensitive value hash.  Usage:

    python tools/check_parity.py [--virgin] [--head] [sf_dir] [query_name ...]

``--virgin`` uses a PLAIN untuned SparkSession exactly like the
evaluation driver does (queries must self-tune — timezone, parquet
nanosAsLong — via mbai_gdb_spark.session.tune); the default tuned
session is faster for bulk sweeps.  ``--head`` restricts to the first
50 registry entries — the driver's certification window.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _value_hash(df: pd.DataFrame) -> str:
    return hashlib.sha256(
        df.to_csv(index=False, float_format="%.10g").encode()
    ).hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    virgin = "--virgin" in args
    head_only = "--head" in args
    args = [a for a in args if a not in ("--virgin", "--head")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import __spark_entry__ as entry_mod

    if virgin:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from mbai_gdb_spark.session import get_spark

        spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written dataset (e.g. tools/gen_sf1.py output): a
            # DIRECTORY of part files — register via glob.
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{p}/*.parquet')"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    if head_only:
        qs = dict(list(qs.items())[:50])
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows={len(sdf)} (no oracle — rows-only check)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"FAIL  {name}: duckdb error\n{traceback.format_exc()}")
            failures.append(name)
            continue
        s, o = _normalize(sdf), _normalize(odf)
        problems = []
        if len(s) != len(o):
            problems.append(f"rows {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        elif _value_hash(s) != _value_hash(o):
            problems.append("value hash mismatch")
            diff = s.compare(o) if len(s) == len(o) else None
            if diff is not None and not diff.empty:
                problems.append(f"first diffs:\n{diff.head(5)}")
        dt = time.time() - t0
        if problems:
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(str(p) for p in problems))
            failures.append(name)
        else:
            print(f"PASS  {name} ({dt:.1f}s) rows={len(s)}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
