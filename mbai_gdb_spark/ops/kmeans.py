"""Distributed k-means (Lloyd's) in pure DataFrame algebra — the real
coarse quantizer behind an IVF index (ops.similarity uses a stride
sample for oracle reproducibility; this is the production trainer).

Each iteration is two shuffles, both linear in the data:
- ASSIGN: broadcast the k centroids, per-vector argmin over cosine/L2 —
  map-only (the same shape as ivf_assign);
- UPDATE: posexplode the assigned vectors to (centroid, dim, value) and
  groupBy-avg — a partial-aggregated shuffle keyed by (centroid, dim),
  i.e. k×d groups regardless of corpus size.

Init is deterministic (farthest-point over a hash-oversampled candidate
set — id-distribution-agnostic), so runs are reproducible; empty
clusters keep their previous centroid.  Lineage is
truncated per iteration with localCheckpoint (same pattern as
ops.graph's iterative operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mbai_gdb_spark.ops.similarity import as_double


def _sq_dist(a, b):
    """Element-wise squared L2 distance between two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    corpus: DataFrame,
    k: int,
    n_iter: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train k centroids; returns (centroid_id, embedding array<double>).

    ``centroid_id`` is the dense index 0..k-1 in farthest-point
    selection order, so output is stable across runs and partitionings
    (fewer than k centroids only when the corpus itself has < k rows).
    """
    import numpy as np

    v = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v__"))
    # Init: farthest-point seeding over a hash-oversampled candidate set.
    # Step 1 (distributed): take the 8k vectors with the smallest
    # LCG-hashed ids — deterministic for ANY id distribution (a stride
    # filter `id % stride == 0` assumes dense contiguous-from-0 ids and
    # can select < k — or zero — seeds on sparse/offset id spaces), and
    # a single TakeOrdered job.  Step 2 (driver, numpy over ≤ 8k rows):
    # greedy k-center — start from the smallest hash, repeatedly add the
    # candidate farthest from the chosen set.  Spread-out seeds keep
    # well-separated clusters from sharing a seed (plain uniform picks
    # collapse two true clusters ~¾ of the time at k=3).  For k beyond
    # coarse-quantizer sizes swap step 2 for k-means||.
    mod = 2_147_483_647
    h = ((F.col(id_col).cast("long") % mod) * 2654435761 + 97) % mod
    cand_rows = (
        v.withColumn("__h__", h).orderBy("__h__", id_col).limit(8 * k).collect()
    )
    cand = np.array([r["__v__"] for r in cand_rows], dtype=np.float64)
    chosen = [0] if len(cand) else []
    if len(cand):
        d_min = ((cand - cand[0]) ** 2).sum(axis=1)
        while len(chosen) < min(k, len(cand)):
            nxt = int(d_min.argmax())  # first max — deterministic
            chosen.append(nxt)
            d_min = np.minimum(d_min, ((cand - cand[nxt]) ** 2).sum(axis=1))
    spark = corpus.sparkSession
    init = spark.createDataFrame(
        [(i, [float(x) for x in cand[j]]) for i, j in enumerate(chosen[: k])],
        "centroid_id long, __c__ array<double>",
    )
    centroids = init.localCheckpoint(eager=True)
    v = v.localCheckpoint(eager=True)
    for _ in range(n_iter):
        assigned = (
            v.crossJoin(F.broadcast(centroids))
            .withColumn("__d__", _sq_dist(F.col("__v__"), F.col("__c__")))
            .withColumn(
                "__rn__",
                F.row_number().over(
                    Window.partitionBy(id_col).orderBy(
                        F.col("__d__").asc(), F.col("centroid_id").asc()
                    )
                ),
            )
            .filter(F.col("__rn__") == 1)
            .select(id_col, "centroid_id", "__v__")
        )
        new_centroids = (
            assigned.select(
                "centroid_id", F.posexplode("__v__").alias("__dim__", "__x__")
            )
            .groupBy("centroid_id", "__dim__")
            .agg(F.avg("__x__").alias("__m__"))
            .groupBy("centroid_id")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("__dim__", "__m__"))
                ).alias("__pairs__")
            )
            .select(
                "centroid_id",
                F.transform(F.col("__pairs__"), lambda p: p["__m__"]).alias("__c__"),
            )
        )
        # Empty clusters keep their previous centroid.
        centroids = (
            centroids.select("centroid_id", F.col("__c__").alias("__old__"))
            .join(new_centroids, "centroid_id", "left")
            .select(
                "centroid_id", F.coalesce("__c__", "__old__").alias("__c__")
            )
            .localCheckpoint(eager=True)
        )
    return centroids.select("centroid_id", F.col("__c__").alias(vec_col))


def kmeans_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, sq_dist) — nearest trained centroid per vector
    (broadcast argmin, ties to the smallest centroid id)."""
    v = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v__"))
    c = centroids.select("centroid_id", as_double(F.col(vec_col)).alias("__c__"))
    return (
        v.crossJoin(F.broadcast(c))
        .withColumn("__d__", _sq_dist(F.col("__v__"), F.col("__c__")))
        .withColumn(
            "__rn__",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("__d__").asc(), F.col("centroid_id").asc()
                )
            ),
        )
        .filter(F.col("__rn__") == 1)
        .select(id_col, "centroid_id", F.col("__d__").alias("sq_dist"))
    )


def inertia(assigned: DataFrame) -> float:
    """Total within-cluster squared distance of a kmeans_assign result."""
    return assigned.agg(F.sum("sq_dist")).collect()[0][0]
