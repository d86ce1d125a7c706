"""Generate a local sf1.0 fixture tier (~6M lineitem) from sf0.1.

The driver's bench contract stops at sf0.1; the sf0.1→sf1 sweep exists
to catch super-linear surprises the 10×-smaller scale guard can't see.
The tier is derived, not re-generated: each fact/dim table is the sf0.1
table replicated ``reps`` times with REFERENTIALLY-CONSISTENT key
offsets (replica r's orders point at replica r's customers, etc.), so
every join keeps its selectivity and no key becomes hot.  Payload
columns are jittered per replica where identity would distort an
operator (document text gets a replica token so the dedup family
doesn't see 10-way exact clones; embeddings get a tiny component-0
nudge; event user_ids are offset so the time span stays fixed while the
user population ×10 — the "bigger corpus, same period" shape).

Writes to ``.localdata/sf1`` (gitignored). Run once:
    python tools/gen_sf1.py [reps]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.io import read_table
from mbai_gdb_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1"
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(DST, exist_ok=True)

    def load(name):
        return read_table(spark, SRC, name)

    # Key strides: one past the max key so offsets never collide.
    def stride(df, col):
        return df.agg(F.max(col)).collect()[0][0] + 1

    C = stride(load("customer"), "c_custkey")
    S = stride(load("supplier"), "s_suppkey")
    P = stride(load("part"), "p_partkey")
    O = stride(load("orders"), "o_orderkey")
    E = stride(load("events"), "event_id")
    U = stride(load("events"), "user_id")
    D = stride(load("documents"), "doc_id")
    V = stride(load("embeddings"), "vec_id")

    rep = F.col("__rep__")

    def replicate(df, edits):
        """Cross-join with the replica ids, apply per-replica column
        edits, drop the replica id."""
        reps_df = spark.range(reps).select(F.col("id").alias("__rep__"))
        out = df.crossJoin(F.broadcast(reps_df))
        for col, expr in edits.items():
            out = out.withColumn(col, expr)
        return out.drop("__rep__")

    plans = {
        "region": {},
        "nation": {},
        "customer": {"c_custkey": F.col("c_custkey") + rep * C},
        "supplier": {"s_suppkey": F.col("s_suppkey") + rep * S},
        "part": {"p_partkey": F.col("p_partkey") + rep * P},
        "orders": {
            "o_orderkey": F.col("o_orderkey") + rep * O,
            "o_custkey": F.col("o_custkey") + rep * C,
        },
        "lineitem": {
            "l_orderkey": F.col("l_orderkey") + rep * O,
            "l_partkey": F.col("l_partkey") + rep * P,
            "l_suppkey": F.col("l_suppkey") + rep * S,
        },
        "events": {
            "event_id": F.col("event_id") + rep * E,
            "user_id": F.col("user_id") + rep * U,
        },
        "documents": {
            "doc_id": F.col("doc_id") + rep * D,
            "text": F.concat(F.col("text"), F.lit(" rep"), rep.cast("string")),
        },
        "embeddings": {
            "vec_id": F.col("vec_id") + rep * V,
            "embedding": F.transform(
                F.col("embedding"),
                lambda x, i: F.when(i == 0, x + rep.cast("float") * F.lit(0.001)).otherwise(x),
            ),
        },
    }
    for name, edits in plans.items():
        src = load(name)
        out = src if not edits and name in ("region", "nation") else replicate(src, edits)
        if name in ("region", "nation"):
            out = src  # dimensions stay fixed
        n_files = 1 if name in ("region", "nation") else 8
        out.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(DST, f"{name}.parquet")
        )
        print(name, spark.read.parquet(os.path.join(DST, f"{name}.parquet")).count())
    print("sf1 tier written to", DST)


if __name__ == "__main__":
    main()
