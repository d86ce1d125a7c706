"""End-to-end dedup-pipeline throughput probe at a corpus size well
beyond the fixtures.

Synthetic: N documents of ~60 tokens over a 50k-word vocabulary, with
1-in-50 docs being a light mutation of another doc (the planted near-dup
pool).  Pipeline measured: tokenize → char-poly ids → MinHash signatures
→ LSH banding (hot-bucket capped) → candidate pairs → connected
components → canonical picks — i.e. the whole `dedup_minhash_clusters`
path the declared query runs, at 400× the sf0.01 row count.

Run: python tools/dedup_scale_experiment.py [n_docs]  (one JSON line).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mbai_gdb_spark.ops.dedup import (
    char_poly_token_ids,
    dedup_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
)
from mbai_gdb_spark.ops.text import tokens
from mbai_gdb_spark.session import get_spark


def build(spark, n_docs: int):
    """~60-token docs; every 50th doc reuses doc (id-37)'s generator seed
    with a small perturbation, yielding genuine high-Jaccard pairs."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 50 == 0, F.col("id") - 37).otherwise(F.col("id")).alias(
            "seed"
        ),
        F.when(F.col("id") % 50 == 0, 3).otherwise(0).alias("n_mutations"),
    )
    word = (
        lambda i: (F.col("seed") * 7919 + i * 104729 + F.col("n_mutations")
                   * F.when(i < F.col("n_mutations"), 1).otherwise(0))
        % 50_000
    )
    text = F.concat_ws(
        " ", *[F.concat(F.lit("w"), word(i).cast("string")) for i in range(60)]
    )
    return base.select("doc_id", text.alias("text"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark()
    docs = build(spark, n_docs).persist()
    docs.count()  # materialize input out of the timed region

    t0 = time.perf_counter()
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    doc_set = char_poly_token_ids(toks, "token").select("doc_id", "tok_id").distinct()
    sigs = minhash_signatures(doc_set, "doc_id", "tok_id", n_hashes=16)
    pairs = lsh_candidate_pairs(sigs, "doc_id", rows_per_band=4, max_bucket_size=50)
    clusters = dedup_clusters(pairs)
    n_clustered = clusters.count()
    n_canonical = clusters.filter("is_canonical").count()
    wall = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "experiment": "dedup_minhash_clusters_scale",
                "n_docs": n_docs,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall),
                "n_docs_in_clusters": n_clustered,
                "n_canonical": n_canonical,
            }
        )
    )


if __name__ == "__main__":
    main()
