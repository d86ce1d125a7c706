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
truncated per iteration with ops.lineage.truncate (localCheckpoint, or
a reliable checkpoint when a dir is registered — same pattern as
ops.graph's iterative operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from mbai_gdb_spark.ops.lineage import truncate as _ckpt

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
    centroids = init.transform(_ckpt)
    v = v.transform(_ckpt)
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
            .transform(_ckpt)
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


FIXED_POINT_SCALE = 1 << 20  # ~1e-6 component resolution


def class_centroid_components(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = FIXED_POINT_SCALE,
) -> DataFrame:
    """Per-class mean embedding in long form: (label, dim, centroid_val,
    n_vecs) — the supervised counterpart of the k-means UPDATE step, but
    with ORDER-FREE float determinism: each component is quantized to
    fixed point (``floor(x * scale)``, exact in both engines for any
    sign — the same convention as int8 quantization) and summed as
    64-bit integers, which is associative and commutative, so ANY
    partitioning / merge order / cluster size produces bit-identical
    centroids; one double division at the end.  Quantization bias is
    bounded by 1/scale per component.

    This is the scale-safe recipe for reproducible distributed float
    aggregation: plain ``avg(double)`` answers depend on partition
    merge order, and sorted-fold determinism (the KMV/mixture recipe)
    needs the group collected to one place — integer fixed point needs
    neither.  Shuffle is keyed on (label, dim): k*d groups regardless
    of corpus size, partial-aggregated map-side."""
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double(F.col(vec_col))).alias("dim", "__x__"),
    ).withColumn(
        "__fx__", F.floor(F.col("__x__") * F.lit(float(scale))).cast("long")
    )
    return (
        ex.groupBy("label", "dim")
        .agg(F.sum("__fx__").alias("__s__"), F.count(F.lit(1)).alias("__n__"))
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            (
                F.col("__s__").cast("double")
                / (F.col("__n__") * F.lit(scale)).cast("double")
            ).alias("centroid_val"),
            F.col("__n__").cast("long").alias("n_vecs"),
        )
    )


def class_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = FIXED_POINT_SCALE,
) -> DataFrame:
    """(label, n_vecs, centroid array<double>) — the long-form
    components of :func:`class_centroid_components` reassembled in dim
    order (collect_list is bounded by d, not by class size)."""
    comp = class_centroid_components(df, label_col, vec_col, scale)
    return (
        comp.groupBy("label")
        .agg(
            F.max("n_vecs").alias("n_vecs"),
            F.array_sort(
                F.collect_list(F.struct("dim", "centroid_val"))
            ).alias("__p__"),
        )
        .select(
            "label",
            "n_vecs",
            F.transform("__p__", lambda p: p["centroid_val"]).alias("centroid"),
        )
    )


def centroid_classify(
    df: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = FIXED_POINT_SCALE,
) -> DataFrame:
    """Nearest-class-centroid evaluation — the embedding-quality /
    label-noise probe for a labeled corpus: assign every vector to its
    most-cosine-similar class centroid (ties → smallest label) and
    report per TRUE class (label, n_vecs, n_correct, accuracy).

    Scale shape: centroids are k rows (broadcast); the corpus is
    touched once map-side for scoring plus one per-id window for the
    argmax and one count shuffle on the true label.  Determinism:
    centroids are bit-exact (fixed-point sums), and the cosine is the
    sequential-fold dot/norm chain, so the argmax is reproducible."""
    from mbai_gdb_spark.ops.similarity import dot, l2_norm
    from mbai_gdb_spark.ops.windows import topk_per_key

    cents = (
        class_centroids(df, label_col, vec_col, scale)
        .select(F.col("label").alias("class_label"), "centroid")
        .withColumn("__cn__", l2_norm(F.col("centroid")))
    )
    v = df.select(
        F.col(id_col),
        F.col(label_col).alias("true_label"),
        as_double(F.col(vec_col)).alias("__v__"),
    ).withColumn("__vn__", l2_norm(F.col("__v__")))
    scored = v.crossJoin(F.broadcast(cents)).select(
        id_col,
        "true_label",
        "class_label",
        (
            dot(F.col("__v__"), F.col("centroid"))
            / (F.col("__vn__") * F.col("__cn__"))
        ).alias("__sim__"),
    )
    pred = topk_per_key(
        scored, [id_col], [F.col("__sim__").desc(), F.col("class_label")], 1
    )
    return (
        pred.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.when(F.col("class_label") == F.col("true_label"), 1).otherwise(0)
            ).alias("n_correct"),
        )
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            F.col("n_correct").cast("long").alias("n_correct"),
            (F.col("n_correct").cast("double") / F.col("n_vecs")).alias("accuracy"),
        )
    )
