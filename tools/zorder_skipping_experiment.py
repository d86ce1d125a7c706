"""File-skipping benefit of Z-order clustering, measured directly.

Writes the same (x, y) dataset under three layouts — natural order,
x-sorted, z-ordered — then, for a batch of small square box queries,
counts how many parquet FILES would have to be read under footer
min/max pruning (file overlaps the box on both dims).  That file count
IS the 100 TB cost model: a filter only helps if whole files fall out.

Run: python tools/zorder_skipping_experiment.py [n_rows] [n_files]
(one JSON line).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.layout import write_zordered
from mbai_gdb_spark.session import get_spark

M31 = 2_147_483_647
SIDE = 65536


def file_stats(spark, path):
    out = []
    for f in glob.glob(path + "/part-*.parquet"):
        r = (
            spark.read.parquet(f)
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"))
            .collect()[0]
        )
        out.append((r[0], r[1], r[2], r[3]))
    return out


def files_hit(stats, bx0, bx1, by0, by1):
    return sum(
        1 for x0, x1, y0, y1 in stats if x1 >= bx0 and x0 <= bx1 and y1 >= by0 and y0 <= by1
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("zorder-skip")
    spark.sparkContext.setLogLevel("ERROR")
    # Quasi-random uniform points over the 65536 x 65536 grid.
    df = spark.range(n).select(
        ((F.col("id") * 2654435761 + 97) % M31 % SIDE).alias("x"),
        ((F.col("id") * 1000003 + 7919) % M31 % SIDE).alias("y"),
    )
    base = tempfile.mkdtemp(prefix="zorder_skip_")
    layouts = {}
    t0 = time.perf_counter()
    df.repartition(n_files).write.mode("overwrite").parquet(base + "/natural")
    layouts["natural"] = file_stats(spark, base + "/natural")
    df.repartitionByRange(n_files, "x").sortWithinPartitions("x").write.mode(
        "overwrite"
    ).parquet(base + "/xsorted")
    layouts["xsorted"] = file_stats(spark, base + "/xsorted")
    write_zordered(df, base + "/zorder", "x", "y", n_files=n_files)
    layouts["zorder"] = file_stats(spark, base + "/zorder")
    build_s = time.perf_counter() - t0

    # 64 deterministic 1/16-side box queries.
    boxes = []
    for i in range(64):
        bx = (i * 2654435761 + 13) % M31 % (SIDE - SIDE // 16)
        by = (i * 48271 + 7) % M31 % (SIDE - SIDE // 16)
        boxes.append((bx, bx + SIDE // 16, by, by + SIDE // 16))

    result = {"n_rows": n, "n_files": n_files, "build_s": round(build_s, 1)}
    for name, stats in layouts.items():
        hits = [files_hit(stats, *b) for b in boxes]
        # y-only range filters (x unconstrained): the case a single-
        # column sort cannot help — its y min/max spans are global.
        yhits = [files_hit(stats, 0, SIDE, b[2], b[3]) for b in boxes]
        result[name] = {
            "mean_files_read_box": round(sum(hits) / len(hits), 1),
            "mean_files_read_y_only": round(sum(yhits) / len(yhits), 1),
            "of_total": len(stats),
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
