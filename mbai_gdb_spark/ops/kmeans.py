"""Distributed k-means (Lloyd's) in pure DataFrame algebra — the real
coarse quantizer behind an IVF index (ops.similarity uses a stride
sample for oracle reproducibility; this is the production trainer).

Each iteration is two shuffles, both linear in the data:
- ASSIGN: broadcast the k centroids, per-vector argmin over cosine/L2 —
  map-only (the same shape as ivf_assign);
- UPDATE: posexplode the assigned vectors to (centroid, dim, value) and
  groupBy-avg — a partial-aggregated shuffle keyed by (centroid, dim),
  i.e. k×d groups regardless of corpus size.

Init is deterministic (every ``stride``-th vector), so runs are
reproducible; empty clusters keep their previous centroid.  Lineage is
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

    ``centroid_id`` is the dense index 0..k-1 of the deterministic
    stride init, so output is stable across runs and partitionings.
    """
    v = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v__"))
    n = v.count()
    stride = max(n // k, 1)
    init = (
        v.filter((F.col(id_col) % stride == 0))
        .orderBy(id_col)
        .limit(k)
        .select(
            (F.col(id_col) / stride).cast("long").alias("centroid_id"),
            F.col("__v__").alias("__c__"),
        )
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
