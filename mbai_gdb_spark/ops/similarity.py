"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; random-hyperplane
LSH bucketing is the scale path (candidates via equi-join on bucket
signature, exact re-rank inside buckets).

All arithmetic stays JVM-side as higher-order functions (zip_with /
aggregate) — sequential, deterministic accumulation that DuckDB's
list_reduce mirrors bit-for-bit, so the oracle gate can hash raw
doubles.  For throughput-critical brute force at very high dims, a
vectorized Pandas-UDF matmul variant is the documented alternative
(trade: Arrow transfer + non-reproducible summation order).

Scale notes: queries are broadcast (small side); the corpus never
shuffles for brute force.  LSH replaces the |Q|×|C| expansion with
per-bucket joins; plane count tunes recall/cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.windows import topk_per_key


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (deterministic accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the (small) query set against
    the corpus, rank per query with a deterministic id tie-break.

    Output: (query_id, vec_id, cosine_sim, rank).

    Norms are hoisted below the join — computed once per query row and
    once per corpus row, not per pair; ``dot/(norm_q*norm_c)`` is
    arithmetically identical to :func:`cosine` so oracle hashes are
    unchanged while the per-pair aggregate work drops 3×.
    """
    q = queries.select(
        F.col(id_col).alias(query_id_col), as_double(F.col(vec_col)).alias("__qv__")
    ).withColumn("__qn__", l2_norm(F.col("__qv__")))
    c = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__cv__")
    ).withColumn("__cn__", l2_norm(F.col("__cv__")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col(query_id_col) != F.col(id_col))
        .select(
            query_id_col,
            id_col,
            (
                dot(F.col("__qv__"), F.col("__cv__"))
                / (F.col("__qn__") * F.col("__cn__"))
            ).alias("cosine_sim"),
        )
    )
    return topk_per_key(
        scored,
        [query_id_col],
        [F.col("cosine_sim").desc(), F.col(id_col)],
        k,
        rank_alias="rank",
    )


def _plane_component(plane: Column, j: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    LCG on the flattened (plane, dim) index — reproducible in plain SQL."""
    idx = (plane * 64 + j).cast("long")
    return ((idx * F.lit(1103515245).cast("long") + 12345) % 65536) / 65536.0 - 0.5


def lsh_bucket_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    sig_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane signature: bit p = [dot(vec, plane_p) >= 0].
    Map-only; bucket is a small integer usable as an equi-join key."""
    v = as_double(F.col(vec_col))
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    bits = F.transform(
        planes,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda x, j: x * _plane_component(p, j),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0)),
    )
    sig = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return df.withColumn(sig_col, sig)


def lsh_table_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    sig_col: str = "lsh_bucket",
    table_col: str = "lsh_table",
) -> DataFrame:
    """Multi-table hyperplane signatures: one row per (input row, table),
    table t's bucket built from planes ``t*n_planes .. t*n_planes+k-1``
    (same LCG family, flattened plane index).  Map-only ×L expansion.

    Single-table LSH has poor recall (a cos-0.9 pair agrees on all 8
    planes only ~29% of the time); with L tables a pair is a candidate
    if ANY table matches — recall 1-(1-p^k)^L ≈ 0.94 at cos 0.9 for
    k=8, L=8, while distant pairs stay improbable (~3% at cos 0)."""
    v = as_double(F.col(vec_col))
    table = F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias(table_col)
    with_t = df.select("*", table)
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    bits = F.transform(
        planes,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.sequence(F.lit(0), F.size(v) - 1),
                    lambda x, j: x
                    * _plane_component(F.col(table_col) * n_planes + p, j),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0)),
    )
    sig = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)
    return with_t.withColumn(sig_col, sig)


def lsh_candidate_neighbors(
    corpus: DataFrame,
    n_planes: int = 8,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float | None = None,
) -> DataFrame:
    """ANN candidate pairs: same bucket in ANY of the L hash tables →
    dedup → exact cosine re-rank.  Output (id_a, id_b, cosine_sim),
    id_a < id_b.  Equi-join on (table, bucket) — never a cross join;
    the pair set is deduped BEFORE the cosine so each surviving pair
    pays the exact re-rank once.  The double-cast vector and its norm
    are hoisted once per corpus row (BEFORE the ×L table explode and the
    join), so the per-pair re-rank is a single dot product."""
    base = corpus.withColumn("__vd__", as_double(F.col(vec_col))).withColumn(
        "__norm__", l2_norm(F.col("__vd__"))
    )
    sig = lsh_table_signatures(base, vec_col, n_planes, n_tables)
    a = sig.select(
        F.col(id_col).alias("id_a"),
        F.col("__vd__").alias("__va__"),
        F.col("__norm__").alias("__na__"),
        "lsh_table",
        "lsh_bucket",
    )
    b = sig.select(
        F.col(id_col).alias("id_b"),
        F.col("__vd__").alias("__vb__"),
        F.col("__norm__").alias("__nb__"),
        "lsh_table",
        "lsh_bucket",
    )
    pairs = (
        a.join(b, ["lsh_table", "lsh_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "__va__", "__vb__", "__na__", "__nb__")
        .dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            (
                dot(F.col("__va__"), F.col("__vb__"))
                / (F.col("__na__") * F.col("__nb__"))
            ).alias("cosine_sim"),
        )
    )
    if min_cosine is not None:
        pairs = pairs.filter(F.col("cosine_sim") >= min_cosine)
    return pairs


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """IVF coarse quantization: each vector → nearest centroid by cosine
    (ties → smallest centroid id).  Centroids broadcast; assignment is a
    map-side scan — the partitioned inverted-file layout at scale.

    Per-row vector norms are computed ONCE below the join (a projection
    on each join input) and the pair score is ``dot/(norm_v*norm_c)`` —
    arithmetically identical to :func:`cosine` (which re-derives both
    norms per pair, 3× the aggregate work over K centroids), so oracle
    hashes are unchanged."""
    c = centroids.select(
        F.col(id_col).alias(centroid_id_col), as_double(F.col(vec_col)).alias("__cv__")
    ).withColumn("__cn__", l2_norm(F.col("__cv__")))
    v = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__vv__")
    ).withColumn("__vn__", l2_norm(F.col("__vv__")))
    scored = v.crossJoin(F.broadcast(c)).select(
        id_col,
        centroid_id_col,
        (dot(F.col("__vv__"), F.col("__cv__")) / (F.col("__vn__") * F.col("__cn__"))).alias("__sim__"),
    )
    return topk_per_key(
        scored, [id_col], [F.col("__sim__").desc(), F.col(centroid_id_col)], 1
    ).select(id_col, centroid_id_col)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-flat ANN: deterministic coarse centroids (every
    ``centroid_stride``-th vector — a production system would k-means;
    fixed seeds keep this oracle-reproducible), nearest-centroid
    inverted lists, query probes its ``n_probe`` closest lists, exact
    cosine re-rank inside them.

    Scale shape: centroids broadcast; the corpus is PARTITIONED BY
    centroid_id (the inverted file); a query touches n_probe/K of the
    data — the classic recall/cost dial.  Assignment norms are hoisted
    once per row inside :func:`ivf_assign`."""
    centroids = corpus.filter(F.col(id_col) % centroid_stride == 0)
    assignment = ivf_assign(corpus, centroids, id_col, vec_col)
    lists = corpus.join(assignment, id_col)

    q = queries.select(
        F.col(id_col).alias(query_id_col), as_double(F.col(vec_col)).alias("__qv__")
    ).withColumn("__qn__", l2_norm(F.col("__qv__")))
    q_probes = topk_per_key(
        q.crossJoin(
            F.broadcast(
                centroids.select(
                    F.col(id_col).alias("centroid_id"),
                    as_double(F.col(vec_col)).alias("__cv__"),
                ).withColumn("__cn__", l2_norm(F.col("__cv__")))
            )
        ).select(
            query_id_col,
            "__qv__",
            "__qn__",
            "centroid_id",
            (
                dot(F.col("__qv__"), F.col("__cv__"))
                / (F.col("__qn__") * F.col("__cn__"))
            ).alias("__csim__"),
        ),
        [query_id_col],
        [F.col("__csim__").desc(), F.col("centroid_id")],
        n_probe,
    ).select(query_id_col, "__qv__", "__qn__", "centroid_id")

    candidates = q_probes.join(
        lists.select(
            id_col, as_double(F.col(vec_col)).alias("__lv__"), "centroid_id"
        ).withColumn("__ln__", l2_norm(F.col("__lv__"))),
        "centroid_id",
    ).filter(F.col(query_id_col) != F.col(id_col))
    scored = candidates.select(
        query_id_col,
        id_col,
        (
            dot(F.col("__qv__"), F.col("__lv__"))
            / (F.col("__qn__") * F.col("__ln__"))
        ).alias("cosine_sim"),
    ).dropDuplicates([query_id_col, id_col])
    return topk_per_key(
        scored, [query_id_col], [F.col("cosine_sim").desc(), F.col(id_col)], k,
        rank_alias="rank",
    )


def ivf_persist(
    corpus: DataFrame,
    path: str,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> None:
    """Write the IVF inverted file as a parquet layout PARTITIONED BY
    centroid_id — the on-disk vector index.  A probe then reads only its
    ``n_probe`` list directories (partition pruning; see
    :func:`ivf_probe_persisted`), so query cost is n_probe/K of the
    corpus regardless of corpus size.  The (tiny) centroid table is
    written as a ``_centroids`` side-car INSIDE the layout — the
    underscore prefix hides it from the inverted-list scan, and probes
    read it directly instead of re-scanning the corpus for stride
    matches."""
    from mbai_gdb_spark.io import write_partitioned

    if centroids is None:
        # Stride sample (oracle-reproducible default); pass
        # ops.kmeans.kmeans_fit(corpus, k) output for trained centroids.
        centroids = corpus.filter(F.col(id_col) % centroid_stride == 0).select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col)
        )
    cent_for_assign = centroids.select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    assignment = ivf_assign(corpus, cent_for_assign, id_col, vec_col)
    lists = corpus.join(assignment, id_col)
    write_partitioned(lists, path, ["centroid_id"])
    centroids.select("centroid_id", F.col(vec_col)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path + "/_centroids")


def ivf_query_probes(
    spark,
    path: str,
    queries: DataFrame,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Each query's ``n_probe`` nearest centroids from the index's
    ``_centroids`` side-car: (query_id, __qv__, __qn__, probe_centroid)
    — the double-cast query vector and its norm ride along so the
    re-rank never recomputes them.  Centroids broadcast; no
    inverted-list data is touched."""
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias("centroid_id_c"),
        as_double(F.col(vec_col)).alias("__cv__"),
    ).withColumn("__cn__", l2_norm(F.col("__cv__")))
    q = queries.select(
        F.col(id_col).alias(query_id_col), as_double(F.col(vec_col)).alias("__qv__")
    ).withColumn("__qn__", l2_norm(F.col("__qv__")))
    return topk_per_key(
        q.crossJoin(F.broadcast(centroids)).select(
            query_id_col,
            "__qv__",
            "__qn__",
            F.col("centroid_id_c").alias("probe_centroid"),
            (
                dot(F.col("__qv__"), F.col("__cv__"))
                / (F.col("__qn__") * F.col("__cn__"))
            ).alias("__csim__"),
        ),
        [query_id_col],
        [F.col("__csim__").desc(), F.col("probe_centroid")],
        n_probe,
    ).select(query_id_col, "__qv__", "__qn__", "probe_centroid")


def ivf_probe_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN search against a persisted IVF layout: pick each query's
    ``n_probe`` nearest centroids (broadcast, from the ``_centroids``
    side-car), then scan ONLY those list directories
    — the ``centroid_id IN (...)`` filter is a partition filter, so the
    unprobed inverted lists are never read (plan-tested)."""
    lists = spark.read.parquet(path)
    # Materialize the probe assignment ONCE: it feeds both the
    # partition-filter id list (collected) and the candidate join —
    # without the checkpoint the query-by-centroid scoring and the
    # _centroids sidecar scan would run twice.
    q_probes = ivf_query_probes(
        spark, path, queries, n_probe, id_col, vec_col, query_id_col
    ).localCheckpoint(eager=True)

    probe_ids = [r.probe_centroid for r in q_probes.select("probe_centroid").distinct().collect()]
    pruned = lists.filter(F.col("centroid_id").isin(probe_ids))
    candidates = q_probes.join(
        pruned.select(
            id_col, as_double(F.col(vec_col)).alias("__lv__"), "centroid_id"
        ).withColumn("__ln__", l2_norm(F.col("__lv__"))),
        q_probes["probe_centroid"] == F.col("centroid_id"),
    ).filter(F.col(query_id_col) != F.col(id_col))
    scored = candidates.select(
        query_id_col,
        id_col,
        (
            dot(F.col("__qv__"), F.col("__lv__"))
            / (F.col("__qn__") * F.col("__ln__"))
        ).alias("cosine_sim"),
    ).dropDuplicates([query_id_col, id_col])
    return topk_per_key(
        scored,
        [query_id_col],
        [F.col("cosine_sim").desc(), F.col(id_col)],
        k,
        rank_alias="rank",
    )
