"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the correctness baseline; random-hyperplane
LSH bucketing is the scale path (candidates via equi-join on bucket
signature, exact re-rank inside buckets).

All arithmetic stays JVM-side as higher-order functions (zip_with /
aggregate) — sequential, deterministic accumulation that DuckDB's
list_reduce mirrors bit-for-bit, so the oracle gate can hash raw
doubles.  For throughput-critical bulk work the vectorized escape
hatch is real, not just documented: :func:`ivf_assign_vectorized`
does one numpy matmul per Arrow batch against the broadcast centroid
matrix (trade: Arrow transfer + non-reproducible summation order —
so the oracle-hashed queries stay on the HOF path).

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


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Arrow-batched brute-force cosine top-k: the query matrix is
    row-normalized on the driver (bounded — same small-side assumption
    as :func:`cosine_topk`'s broadcast) and each corpus Arrow batch
    contributes ONE numpy matmul plus a batch-local top-k per query;
    the global rank then reduces over ≤ k·n_batches candidate rows per
    query instead of the full |C| pair expansion.

    Same output contract as :func:`cosine_topk` (query_id, vec_id,
    cosine_sim, rank; self-pair excluded; ties → smallest vec_id —
    enforced batch-locally by a (-score, id) lexsort, so a tied global
    winner can never be dropped by the partial top-k).  FP caveat as
    :func:`ivf_assign_vectorized`: matmul accumulation order differs
    from the HOF path, so oracle-hashed queries stay on
    :func:`cosine_topk`; this is the bulk/serving variant.
    """
    import numpy as np
    import pandas as pd

    q_rows = sorted(
        queries.select(
            F.col(id_col), as_double(F.col(vec_col)).alias("__qv__")
        ).collect(),
        key=lambda r: r[0],
    )
    qid = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.array([r[1] for r in q_rows], dtype=np.float64)
    qnorm = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn_t = np.ascontiguousarray((qmat / np.where(qnorm == 0.0, 1.0, qnorm)).T)

    def partial_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy()
            vmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vnorm = np.linalg.norm(vmat, axis=1, keepdims=True)
            sims = (vmat / np.where(vnorm == 0.0, 1.0, vnorm)) @ qn_t
            out_q, out_id, out_sim = [], [], []
            for j in range(len(qid)):
                col = sims[:, j]
                keep = ids != qid[j]  # self-pair exclusion
                cand_ids, cand = ids[keep], col[keep]
                order = np.lexsort((cand_ids, -cand))[:k]
                out_q.append(np.full(len(order), qid[j], dtype=np.int64))
                out_id.append(cand_ids[order])
                out_sim.append(cand[order])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_id),
                    "cosine_sim": np.concatenate(out_sim),
                }
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(
        partial_topk,
        schema=f"{query_id_col} long, {id_col} long, cosine_sim double",
    )
    return topk_per_key(
        partial,
        [query_id_col],
        [F.col("cosine_sim").desc(), F.col(id_col)],
        k,
        rank_alias="rank",
    )


def _plane_component(plane: Column, j: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    TWO LCG rounds on the flattened (plane, dim) index — reproducible in
    plain SQL, and int64-safe (intermediates < 2^61).

    The XOR-shifts between LCG rounds are load-bearing: affine rounds
    alone compose into another affine map of the index, whose lattice
    structure correlates consecutive planes — signature bits then clump
    into periodic patterns (measured on a 50k-vector probe: hot 16-bit
    buckets of ~1200 like 0x6DB6, and 17M candidate pairs where the
    planted near-dup set was 999; with the xorshift mixing the same
    probe yields near-uniform buckets and a ~300k candidate set).  XOR
    and shifts are exact on BIGINT in both engines, and intermediates
    stay < 2^61."""
    idx = (plane * 64 + j).cast("long")
    h1 = (idx * F.lit(1103515245).cast("long") + 12345) % 2147483647
    h1x = h1.bitwiseXOR(F.shiftright(h1, 13))
    h2 = (h1x * F.lit(1103515245).cast("long") + 12345) % 2147483647
    h2x = h2.bitwiseXOR(F.shiftright(h2, 7))
    return (h2x % 65536) / 65536.0 - 0.5


def _plane_value(idx: int) -> float:
    """Python mirror of :func:`_plane_component` for a flat plane index
    — exact integer arithmetic, so the resulting double is bit-identical
    to the Column formula (cross-checked in tests).  Used to materialize
    the plane matrix as a LITERAL at plan time: Catalyst constant-folds
    it, so the per-element signature work collapses to multiply-add —
    measured ~6× faster than evaluating the hash chain per element."""
    h1 = (idx * 1103515245 + 12345) % 2147483647
    h1x = h1 ^ (h1 >> 13)
    h2 = (h1x * 1103515245 + 12345) % 2147483647
    h2x = h2 ^ (h2 >> 7)
    return (h2x % 65536) / 65536.0 - 0.5


def _plane_matrix_lit(n_flat_planes: int, plane_dim: int) -> Column:
    """Literal [n_flat_planes][plane_dim] plane matrix; flat plane p's
    component j is ``_plane_value(p*64 + j)`` (the same flattened-index
    convention the SQL oracles compute symbolically)."""
    return F.array(
        *[
            F.array(*[F.lit(_plane_value(p * 64 + j)) for j in range(plane_dim)])
            for p in range(n_flat_planes)
        ]
    )


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "projected",
    plane_dim: int = 64,
) -> DataFrame:
    """Johnson-Lindenstrauss-style random projection: output component
    p = dot(vec, plane_p) over the same deterministic xorshift-LCG
    plane family the LSH signatures use (flat index ``p*64 + j``) —
    i.e. the UNthresholded version of :func:`lsh_bucket_signature`.

    Dimensionality reduction ahead of ANN / clustering: JL says
    O(log n / eps^2) dims preserve pairwise distances within 1±eps, and
    a shared deterministic plane family means two independently
    processed corpora land in the SAME projected space (engine- and
    run-reproducible, oracle-expressible in plain SQL).

    Map-only: the plane matrix is a constant-folded literal, the dots
    are sequential-accumulation HOFs (bit-stable, DuckDB-mirrorable),
    no shuffle.  ``plane_dim`` must be ≥ the vector dimension (guarded
    like the signature path)."""
    v = as_double(F.col(vec_col))
    planes_lit = _plane_matrix_lit(out_dim, plane_dim)
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(out_dim - 1)),
        lambda p: F.aggregate(
            F.zip_with(
                v,
                F.slice(
                    F.element_at(planes_lit, (p + 1).cast("int")),
                    F.lit(1),
                    F.size(v),
                ),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    guard = F.coalesce(
        F.assert_true(
            F.size(v) <= plane_dim,
            F.lit(f"vector dim exceeds plane_dim={plane_dim}"),
        ).cast("double"),
        F.lit(0.0),
    )
    return df.withColumn(
        out_col, F.transform(comps, lambda c: c + guard)
    )


def lsh_bucket_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    sig_col: str = "lsh_bucket",
    plane_dim: int = 64,
) -> DataFrame:
    """Random-hyperplane signature: bit p = [dot(vec, plane_p) >= 0].
    Map-only; bucket is a small integer usable as an equi-join key.
    Planes are a constant-folded literal matrix (``plane_dim`` must be
    >= the vector dimension; values identical to the symbolic formula
    the SQL oracles compute)."""
    v = as_double(F.col(vec_col))
    planes_lit = _plane_matrix_lit(n_planes, plane_dim)
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    bits = F.transform(
        planes,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.slice(
                        F.element_at(planes_lit, (p + 1).cast("int")),
                        F.lit(1),
                        F.size(v),
                    ),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0)),
    )
    guard = F.coalesce(
        F.assert_true(
            F.size(v) <= plane_dim,
            F.lit(f"vector dim exceeds plane_dim={plane_dim}"),
        ).cast("long"),
        F.lit(0),
    )
    sig = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x) + guard
    return df.withColumn(sig_col, sig)


def lsh_table_signatures(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 8,
    sig_col: str = "lsh_bucket",
    table_col: str = "lsh_table",
    plane_dim: int = 64,
) -> DataFrame:
    """Multi-table hyperplane signatures: one row per (input row, table),
    table t's bucket built from planes ``t*n_planes .. t*n_planes+k-1``
    (same LCG family, flattened plane index).  Map-only ×L expansion.

    Single-table LSH has poor recall (a cos-0.9 pair agrees on all 8
    planes only ~29% of the time); with L tables a pair is a candidate
    if ANY table matches — recall 1-(1-p^k)^L ≈ 0.94 at cos 0.9 for
    k=8, L=8, while distant pairs stay improbable (~3% at cos 0).

    The L*k planes are materialized as a constant-folded literal matrix
    (bit-identical to the symbolic hash-chain formula — that stays the
    SQL oracles' form), so the per-element signature work is one
    multiply-add: ~6× faster on a 50k-vector probe."""
    v = as_double(F.col(vec_col))
    planes_lit = _plane_matrix_lit(n_tables * n_planes, plane_dim)
    table = F.explode(F.sequence(F.lit(0), F.lit(n_tables - 1))).alias(table_col)
    with_t = df.select("*", table)
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))
    bits = F.transform(
        planes,
        lambda p: F.when(
            F.aggregate(
                F.zip_with(
                    v,
                    F.slice(
                        F.element_at(
                            planes_lit,
                            (F.col(table_col) * n_planes + p + 1).cast("int"),
                        ),
                        F.lit(1),
                        F.size(v),
                    ),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.pow(F.lit(2.0), p).cast("long"),
        ).otherwise(F.lit(0)),
    )
    # Guard: a vector longer than plane_dim would silently zip against a
    # truncated plane (assert_true returns NULL when the check holds, so
    # the coalesce adds 0 and the guard costs one comparison per row).
    guard = F.coalesce(
        F.assert_true(
            F.size(v) <= plane_dim,
            F.lit(f"vector dim exceeds plane_dim={plane_dim}"),
        ).cast("long"),
        F.lit(0),
    )
    sig = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x) + guard
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
    pays the exact re-rank once.

    Shuffle-volume design: the bucket self-join and the multi-table
    dedup move ONLY (id_a, id_b) — ~16 bytes per candidate — and the
    embeddings are joined back AFTER the dedup (two hash joins on the
    ids).  Carrying both vectors through the ×L-expanded pair shuffle
    instead multiplies the dedup's shuffle bytes by the embedding width
    (~50× at 64 dims; measured 73 GB of sort spill on a 50k-vector
    probe, vs none with the join-back).  Vector double-casts and norms
    are still hoisted once per corpus row for the re-rank."""
    # localCheckpoint: the self-join below references the signature
    # frame twice; without materialization the signature fold (the
    # dominant map cost) runs once per side.
    sig = lsh_table_signatures(
        corpus.select(F.col(id_col), F.col(vec_col)), vec_col, n_planes, n_tables
    ).select(id_col, "lsh_table", "lsh_bucket").localCheckpoint(eager=False)
    a = sig.select(F.col(id_col).alias("id_a"), "lsh_table", "lsh_bucket")
    b = sig.select(F.col(id_col).alias("id_b"), "lsh_table", "lsh_bucket")
    pair_ids = (
        a.join(b, ["lsh_table", "lsh_bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    base = corpus.select(
        F.col(id_col), as_double(F.col(vec_col)).alias("__vd__")
    ).withColumn("__norm__", l2_norm(F.col("__vd__")))
    pairs = (
        pair_ids.join(
            base.select(
                F.col(id_col).alias("id_a"),
                F.col("__vd__").alias("__va__"),
                F.col("__norm__").alias("__na__"),
            ),
            "id_a",
        )
        .join(
            base.select(
                F.col(id_col).alias("id_b"),
                F.col("__vd__").alias("__vb__"),
                F.col("__norm__").alias("__nb__"),
            ),
            "id_b",
        )
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


def ivf_assign_vectorized(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Arrow-batched coarse quantization for the LARGE-nlist regime:
    one numpy ``V @ Cn.T`` matmul per batch against the broadcast
    row-normalized centroid matrix, argmax per row.

    Same nearest-centroid semantics as :func:`ivf_assign` (centroid
    norms divided out, exact-tie → smallest centroid id via ascending
    argmax-first-hit), but the per-pair cost drops from a scalar
    ``aggregate`` HOF to BLAS — measured ~40× at nlist=512, which is
    what makes nlist ∝ sqrt(N) affordable (the HOF path's N×nlist dots
    stop scaling past nlist≈64; see NOTES.md round-4 scale curves).

    Trade documented in the module docstring: float64 matmul
    accumulation order is not the HOF's sequential order, so ranking
    near EXACT cosine ties can differ by FP noise — keep the HOF path
    for oracle-hashed queries (tiny nlist there), use this for bulk
    index builds.  Centroid count is bounded (it must fit broadcast
    in both paths); the collect here is nlist rows, not data."""
    import numpy as np
    import pandas as pd

    rows = sorted(
        centroids.select(
            F.col(id_col), as_double(F.col(vec_col)).alias("__cv__")
        ).collect(),
        key=lambda r: r[0],
    )
    cid = np.array([r[0] for r in rows], dtype=np.int64)
    cmat = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(cmat, axis=1, keepdims=True)
    cn_t = np.ascontiguousarray((cmat / np.where(norms == 0.0, 1.0, norms)).T)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            best = np.argmax(vmat @ cn_t, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), centroid_id_col: cid[best]}
            )

    return corpus.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} long, {centroid_id_col} long"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    centroid_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    vectorized_assign: bool = False,
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
    assign_fn = ivf_assign_vectorized if vectorized_assign else ivf_assign
    assignment = assign_fn(corpus, centroids, id_col, vec_col)
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
    vectorized_assign: bool = False,
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
    assign_fn = ivf_assign_vectorized if vectorized_assign else ivf_assign
    assignment = assign_fn(corpus, cent_for_assign, id_col, vec_col)
    lists = corpus.join(assignment, id_col)
    # One file per inverted-list directory (see ops.text's note on the
    # file-spray fix; probes scan whole lists, so fewer+bigger files).
    write_partitioned(lists, path, ["centroid_id"], sort_cols=[id_col])
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
    unprobed inverted lists are never read (plan-tested).  An index
    whose every list was deleted probes to the typed empty result: the
    query id type comes from the queries frame, the CORPUS id type from
    the ``_centroids`` side-car (aliased from the corpus id at build
    time — the layout itself is the source of truth, the same rule the
    BM25 and IVF-PQ empty probes follow)."""
    import os

    from mbai_gdb_spark.io import check_serving_safe

    check_serving_safe(path)
    if not any(n.startswith("centroid_id=") for n in os.listdir(path)):
        qid_ddl = queries.schema[id_col].dataType.simpleString()
        cid_ddl = (
            spark.read.parquet(path + "/_centroids")
            .schema["centroid_id"]
            .dataType.simpleString()
        )
        return spark.createDataFrame(
            [],
            f"`{query_id_col}` {qid_ddl}, `{id_col}` {cid_ddl},"
            " cosine_sim double, rank int",
        )
    lists = spark.read.parquet(path)
    # Materialize the probe assignment ONCE — r14: with a single
    # COLLECT (bounded: n_queries × n_probe rows carrying the query
    # vectors) instead of an eager checkpoint job + a distinct+collect
    # job; the collected rows feed both the partition-filter id list
    # and, rebuilt as a local frame, the candidate join — one scheduled
    # job on the serving path instead of three (guide §7.3).
    qp = ivf_query_probes(
        spark, path, queries, n_probe, id_col, vec_col, query_id_col
    )
    qp_rows = qp.collect()
    probe_ids = sorted({r["probe_centroid"] for r in qp_rows})
    q_probes = spark.createDataFrame(qp_rows, qp.schema)
    pruned = lists.filter(F.col("centroid_id").isin(probe_ids))
    candidates = F.broadcast(q_probes).join(
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


def ivf_append(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = False,
) -> None:
    """Append NEW vectors into a persisted :func:`ivf_persist` layout
    with the ``_centroids`` side-car FROZEN — the raw-vector sibling of
    :func:`ivfpq_append`, completing the lifecycle story for the plain
    IVF layout (round-10 verdict gap #1).

    New vectors assign to the EXISTING centroids (production IVF
    semantics: the coarse quantizer trains once; drift-driven
    retraining is an offline new-generation build).  The layout stores
    raw vectors with NO derived corpus statistics, so the merge is a
    pure INSERT: new rows land as additional files inside their
    centroid_id list directories and no existing file is rewritten —
    append is associative and bit-equivalent to a rebuild over the
    union corpus (property-tested).

    Appended ids must be NEW.  The overlap guard scans only the lists
    the delta assigns to — complete for exact re-adds, since frozen
    centroids assign a re-added vector to the same list.

    Crash story: the bare layout carries no completeness side-car, so a
    crashed append can leave a partially inserted delta — run appends
    under a generation-managed root (:func:`mbai_gdb_spark.indexgen.
    ivf_gen_append`), where a crash is an unpublished generation and
    probes keep serving the previous one."""
    from mbai_gdb_spark.io import check_serving_safe
    from mbai_gdb_spark.ops.lineage import truncate

    check_serving_safe(path)
    spark = new_vectors.sparkSession
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    assignment = truncate(assign_fn(new_vectors, centroids, id_col, vec_col))
    if assignment.isEmpty():
        return  # empty delta: nothing to insert
    touched = [
        r["centroid_id"]
        for r in assignment.select("centroid_id").distinct().collect()
    ]
    import os

    has_data = any(n.startswith("centroid_id=") for n in os.listdir(path))
    if has_data:
        existing_ids = (
            spark.read.parquet(path)
            .filter(F.col("centroid_id").isin(touched))
            .select(id_col)
        )
        dup = existing_ids.join(
            assignment.select(id_col), id_col, "leftsemi"
        ).limit(1)
        if dup.count() > 0:
            raise ValueError(
                "ivf_append: delta contains vec_ids already in the index "
                "— append is insert-only; use ivf_delete + ivf_append (or "
                "a fused update) for changed vectors"
            )
    rows = new_vectors.join(assignment, id_col)
    (
        rows.repartition(max(len(touched), 1), F.col("centroid_id"))
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def ivf_delete(
    del_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = False,
) -> None:
    """Physically DELETE vectors from a persisted :func:`ivf_persist`
    layout — the raw-vector sibling of :func:`ivfpq_delete` (round-10
    verdict gap #1: takedowns against the plain-IVF layout no longer
    force a rebuild).  The ``_centroids`` side-car stays FROZEN: a
    deleted vector that also served as a centroid keeps its centroid
    role (the side-car is the quantizer, not corpus data).

    Delete-by-VECTOR: assigning the delta under the frozen centroids
    names exactly the list directories its rows live in, so
    identification is O(delta) map-only work + |assigned lists|
    directory reads, never an index scan.  Verification is STRONGER
    than the lossy-code layout can offer: the plain layout stores the
    raw vectors, so each delta row must match its stored row's vector
    VALUES exactly (element-for-element), not merely be found by id — a
    vector passed with different values than indexed refuses loudly
    before any mutation.

    Exactness contract (property-tested): probes after the delete are
    bit-identical to an index built over the corpus without the deleted
    vectors under the same frozen centroids.

    Crash story: a ``_delete_inflight`` sentinel spans the partition-
    directory swaps; probes refuse while it stands.  Under a
    generation-managed root (:func:`mbai_gdb_spark.indexgen.
    ivf_gen_delete`) a crashed delete is an unpublished generation."""
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe
    from mbai_gdb_spark.ops.lineage import truncate

    check_serving_safe(path)
    spark = del_vectors.sparkSession
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    stats = del_vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    d_vecs = int(stats["n"] or 0)
    if d_vecs == 0:
        return  # empty delta: nothing to delete
    if int(stats["nd"]) != d_vecs:
        raise ValueError(
            "ivf_delete: delta contains duplicate vec_ids — each deleted "
            "vector must appear exactly once"
        )
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    assignment = truncate(assign_fn(del_vectors, centroids, id_col, vec_col))
    touched = sorted(
        r["centroid_id"]
        for r in assignment.select("centroid_id").distinct().collect()
    )
    # Stored-vs-passed EXACT verification: every delta id must be found
    # in its assigned list with the SAME vector values the caller
    # passed (raw vectors are stored, so full value equality is free —
    # the exactness upgrade over the lossy-code layout's found-by-id).
    delta_vals = truncate(
        del_vectors.select(
            F.col(id_col), F.col(vec_col).alias("__dv__")
        )
    )
    stored = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .select(id_col, F.col(vec_col).alias("__sv__"))
    )
    matched = (
        stored.join(F.broadcast(delta_vals), id_col)
        .filter(F.col("__sv__") == F.col("__dv__"))
        .count()
    )
    if matched != d_vecs:
        raise ValueError(
            f"ivf_delete: only {matched} of {d_vecs} delta vectors were "
            "found in their assigned lists with matching values — a "
            "vector absent from the index, or passed with different "
            "values than indexed, refuses loudly instead of corrupting "
            "the layout"
        )
    # Materialize the filtered survivors BEFORE mutating anything.
    staging = os.path.join(path, "_delete_staging")
    keep = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .join(F.broadcast(delta_vals.select(id_col)), id_col, "left_anti")
    )
    (
        keep.repartition(max(len(touched), 1), F.col("centroid_id"))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(staging)
    )
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for c in touched:
        src = os.path.join(staging, f"centroid_id={c}")
        dst = os.path.join(path, f"centroid_id={c}")
        aside = os.path.join(path, f"_compact_old_centroid_id={c}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: filtered replacement in
        # A list whose every vector was deleted has no staged dir: the
        # directory simply goes away (probes tolerate missing lists).
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)


def ivf_update(
    old_vectors: DataFrame,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = False,
) -> None:
    """FUSED in-place update of vectors in a persisted
    :func:`ivf_persist` layout: semantically delete(old) + append(new)
    under the FROZEN ``_centroids`` quantizer, but executed as ONE
    mutation — each touched list directory is rewritten exactly once
    with (survivors ∪ re-assigned new vectors).  Under a
    generation-managed root (:func:`mbai_gdb_spark.indexgen.
    ivf_gen_update`) that is ONE published generation per update.

    Contract: ``old_vectors`` are the EXACT indexed (id, vector) rows
    (value-verified element-for-element before any mutation, the plain
    layout's delete-grade check), ``new_vectors`` the SAME id set with
    replacement values (id-set equality enforced).  The new values
    re-assign under the frozen centroids — an updated vector may move
    lists, which is why touched = lists(old) ∪ lists(new).

    Exactness contract (property-tested): probes after the update are
    bit-identical to an index built over the updated corpus under the
    same frozen centroids, and to delete(old)+append(new)."""
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe
    from mbai_gdb_spark.ops.lineage import truncate

    check_serving_safe(path)
    spark = old_vectors.sparkSession
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    o_stats = old_vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    u_vecs = int(o_stats["n"] or 0)
    if u_vecs == 0:
        return  # empty update set: nothing to do
    if int(o_stats["nd"]) != u_vecs:
        raise ValueError(
            "ivf_update: old_vectors contains duplicate vec_ids — each "
            "updated vector must appear exactly once"
        )
    n_stats = new_vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    if int(n_stats["nd"] or 0) != int(n_stats["n"] or 0):
        raise ValueError("ivf_update: new_vectors contains duplicate vec_ids")
    id_mismatch = (
        old_vectors.select(F.col(id_col).alias("__o__"))
        .join(
            new_vectors.select(F.col(id_col).alias("__n__")),
            F.col("__o__") == F.col("__n__"),
            "full_outer",
        )
        .filter(F.col("__o__").isNull() | F.col("__n__").isNull())
        .limit(1)
    )
    if id_mismatch.count() > 0:
        raise ValueError(
            "ivf_update: old_vectors and new_vectors must carry the SAME "
            "id set (update, not upsert) — use ivf_append / ivf_delete "
            "for membership changes"
        )
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    o_assign = truncate(assign_fn(old_vectors, centroids, id_col, vec_col))
    n_assign = truncate(assign_fn(new_vectors, centroids, id_col, vec_col))
    touched = sorted(
        {
            r["centroid_id"]
            for r in o_assign.select("centroid_id")
            .unionAll(n_assign.select("centroid_id"))
            .distinct()
            .collect()
        }
    )
    if not any(n.startswith("centroid_id=") for n in os.listdir(path)):
        raise ValueError(
            "ivf_update: index holds no vectors — the update's vectors "
            "are not in it"
        )
    # Stored-vs-passed EXACT verification of the OLD side (the plain
    # layout stores raw vectors, so full value equality is free).
    delta_vals = truncate(
        old_vectors.select(F.col(id_col), F.col(vec_col).alias("__dv__"))
    )
    stored = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .select(id_col, F.col(vec_col).alias("__sv__"))
    )
    matched = (
        stored.join(F.broadcast(delta_vals), id_col)
        .filter(F.col("__sv__") == F.col("__dv__"))
        .count()
    )
    if matched != u_vecs:
        raise ValueError(
            f"ivf_update: only {matched} of {u_vecs} old vectors were "
            "found in their assigned lists with matching values — a "
            "vector absent from the index, or passed with different "
            "values than indexed, refuses loudly instead of corrupting "
            "the layout"
        )
    # --- stage (survivors ∪ re-assigned new rows) once, swap once ---
    staging = os.path.join(path, "_delete_staging")
    survivors = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .join(F.broadcast(delta_vals.select(id_col)), id_col, "left_anti")
    )
    cols = survivors.columns  # corpus columns + centroid_id
    new_rows = new_vectors.join(n_assign, id_col).select(*cols)
    (
        survivors.select(*cols)
        .unionAll(new_rows)
        .repartition(max(len(touched), 1), F.col("centroid_id"))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(staging)
    )
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for c in touched:
        src = os.path.join(staging, f"centroid_id={c}")
        dst = os.path.join(path, f"centroid_id={c}")
        aside = os.path.join(path, f"_compact_old_centroid_id={c}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: rewritten replacement in
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compact codes + asymmetric-distance search
# ---------------------------------------------------------------------------


def l2_sq(a: Column, b: Column) -> Column:
    """Sequential-order squared L2 distance (deterministic accumulation,
    mirrored 1:1 by the SQL oracles)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codebook(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    stride: int = 50,
) -> DataFrame:
    """Deterministic PQ codebook: (sub_id, code_id, cw).

    Codewords are the sub_vectors of every ``stride``-th corpus vector
    (ids 0, stride, 2*stride, ... < n_codes*stride) — the same
    stride-sampled quantizer trick as the IVF oracle path: no k-means
    in the oracled pipeline, so an external engine rebuilds the exact
    codebook.  ``ops.kmeans.kmeans_fit`` remains the production
    trainer; swap its centroids in for better codes when cross-engine
    exactness is not required.
    """
    vid = F.col(id_col)
    base = emb.filter((vid % stride == 0) & (vid < n_codes * stride)).select(
        F.expr(f"{id_col} div {stride}").alias("code_id"),
        as_double(F.col(vec_col)).alias("__v__"),
    )
    slices = F.array(
        *[F.slice("__v__", m * sub_dim + 1, sub_dim) for m in range(m_sub)]
    )
    return base.select(
        "code_id", F.posexplode(slices).alias("sub_id", "cw")
    )


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    sub_dim: int = 8,
) -> DataFrame:
    """PQ-encode the corpus: (vec_id, sub_id, code_id) — each vector's
    sub_vector mapped to its nearest codeword (squared-L2, code_id
    tie-break).

    Plan shape: the corpus explodes to m_sub rows, broadcast-hash-joins
    the <= m_sub*n_codes-row codebook, and a (vec, sub)-partitioned
    row_number picks the argmin — no shuffle of the corpus beyond the
    m_sub-way explode, and the 64-float vector compresses to m_sub
    small ints (the whole point: a billion-vector index fits where the
    raw vectors never would).
    """
    from pyspark.sql import Window as W

    vecs = emb.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v__"))
    slices = F.array(
        *[F.slice("__v__", m * sub_dim + 1, sub_dim) for m in range(m_sub)]
    )
    vsubs = vecs.select(id_col, F.posexplode(slices).alias("sub_id", "sv"))
    dists = vsubs.join(F.broadcast(codebook), "sub_id").withColumn(
        "__d__", l2_sq(F.col("sv"), F.col("cw"))
    )
    w = W.partitionBy(id_col, "sub_id").orderBy(
        F.col("__d__").asc(), F.col("code_id").asc()
    )
    return (
        dists.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .select(id_col, "sub_id", "code_id")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    stride: int = 50,
) -> DataFrame:
    """PQ asymmetric-distance top-k: (query_id, vec_id, adc_dist, rank).

    Classic ADC (Jegou et al., PAMI 2011): the corpus is scanned only
    as codes; each query precomputes an m_sub × n_codes distance table
    (query sub_vector vs every codeword), and a candidate's approximate
    distance is the sum of m_sub table lookups — no corpus-side float
    math at query time.  Here the lookup is a broadcast join of the
    tiny table against the code rows, the per-(query, vec) sum pivots
    the m_sub rows to columns and adds them in a FIXED left-to-right
    chain (doubles stay bit-identical across engines and shuffle
    orders), and ties rank by vec_id.
    """
    from pyspark.sql import Window as W

    cb = pq_codebook(
        corpus, id_col, vec_col, m_sub, sub_dim, n_codes, stride
    )
    codes = pq_encode(corpus, cb, id_col, vec_col, m_sub, sub_dim)
    qvecs = queries.select(
        F.col(id_col).alias(query_id_col), as_double(F.col(vec_col)).alias("__q__")
    )
    qslices = F.array(
        *[F.slice("__q__", m * sub_dim + 1, sub_dim) for m in range(m_sub)]
    )
    qsubs = qvecs.select(query_id_col, F.posexplode(qslices).alias("sub_id", "sv"))
    table = qsubs.join(F.broadcast(cb), "sub_id").select(
        query_id_col, "sub_id", "code_id", l2_sq(F.col("sv"), F.col("cw")).alias("__d__")
    )
    pivoted = (
        codes.join(F.broadcast(table), ["sub_id", "code_id"])
        .groupBy(query_id_col, id_col)
        .agg(
            *[
                F.max(F.when(F.col("sub_id") == m, F.col("__d__"))).alias(f"__d{m}__")
                for m in range(m_sub)
            ]
        )
    )
    adc = F.lit(0.0)
    for m in range(m_sub):
        adc = adc + F.col(f"__d{m}__")
    w = W.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        pivoted.filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized_assign: bool = False,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate detection: cluster the
    corpus by nearest centroid, then compare pairs ONLY within a
    cluster; a vector whose cosine to a lower-id cluster-mate is
    ``>= threshold`` is marked a duplicate of its lowest-id match.

    Scale shape (the reason SemDeDup exists): the quadratic pair
    comparison is confined to single clusters — with K centroids the
    candidate volume drops from N² to Σ|cluster|², and the cluster
    join is a plain equi-join on ``centroid_id`` (shuffle-partitioned,
    never a global crossJoin).  Centroids are a broadcast-sized side
    artifact, exactly like a trained tokenizer; at 100 TB K grows
    ∝ sqrt(N) and per-cluster size stays bounded, with the hot-cluster
    cap pattern of ops.dedup available for degenerate corpora.

    Output: one row per duplicate vector — (vec_id, centroid_id,
    dup_of, best_cosine, n_dup_candidates).  Representatives (lowest
    id in each near-dup group) don't appear, mirroring
    dedup_embedding_cosine's greedy-keep convention.

    ``vectorized_assign=True`` swaps the HOF nearest-centroid pass for
    the BLAS matmul path (ivf_assign_vectorized) — required when K
    grows with sqrt(N)/cluster-size bounds at real scale; keep the HOF
    default for oracle-hashed queries (see ivf_assign_vectorized's
    FP-tie note).
    """
    assign_fn = ivf_assign_vectorized if vectorized_assign else ivf_assign
    assign = assign_fn(corpus, centroids, id_col, vec_col)
    v = (
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v__"))
        .withColumn("__n__", l2_norm(F.col("__v__")))
        .join(assign, id_col)
    )
    a = v.select(
        F.col(id_col).alias("id_a"),
        F.col("centroid_id"),
        F.col("__v__").alias("__va__"),
        F.col("__n__").alias("__na__"),
    )
    b = v.select(
        F.col(id_col).alias("id_b"),
        F.col("centroid_id"),
        F.col("__v__").alias("__vb__"),
        F.col("__n__").alias("__nb__"),
    )
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "centroid_id",
            "id_a",
            "id_b",
            (
                dot(F.col("__va__"), F.col("__vb__"))
                / (F.col("__na__") * F.col("__nb__"))
            ).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
    return pairs.groupBy(
        F.col("id_b").alias(id_col), F.col("centroid_id")
    ).agg(
        F.min("id_a").alias("dup_of"),
        F.max("cosine_sim").alias("best_cosine"),
        F.count(F.lit(1)).alias("n_dup_candidates"),
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    centroid_stride: int = 50,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    code_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    prebuilt: tuple[DataFrame, DataFrame] | None = None,
    vectorized_assign: bool = False,
) -> DataFrame:
    """IVF-PQ: the production billion-scale ANN shape (Jegou et al.) —
    IVF's inverted lists prune WHICH vectors are scored (n_probe/K of
    the corpus), PQ's 8-byte codes prune WHAT is read per vector (no
    raw floats touched in the scan).  Composition of
    :func:`ivf_assign` + :func:`pq_codebook`/:func:`pq_encode` +
    the ADC distance-table join of :func:`pq_adc_topk`.

    This variant encodes RAW vectors (IVF prunes, PQ compresses);
    classic IVF-PQ encodes residuals against the coarse centroid for
    tighter codes — that is :func:`ivf_pq_residual_topk` (also
    oracle-exact on the HOF path; measured 8-9× this path's recall on
    clustered corpora at identical scan cost).

    Plan shape: centroids + codebook + per-query distance tables are
    all broadcast; the corpus shuffles once to (vec, sub) codes; the
    candidate scan is an equi-join on centroid_id then (sub, code) —
    never a crossJoin against the corpus.
    """
    centroids = corpus.filter(F.col(id_col) % centroid_stride == 0)
    cb = pq_codebook(corpus, id_col, vec_col, m_sub, sub_dim, n_codes, code_stride)
    if prebuilt is not None:
        # (codes, assignment) built once via ivf_pq_index and amortized
        # across query batches — the production split: encode is BUILD
        # cost, the timed path below is QUERY cost.
        codes_raw, assignment = prebuilt
        codes = codes_raw.join(assignment, id_col)
    else:
        assign_fn = ivf_assign_vectorized if vectorized_assign else ivf_assign
        assignment = assign_fn(corpus, centroids, id_col, vec_col)
        codes = pq_encode(corpus, cb, id_col, vec_col, m_sub, sub_dim).join(
            assignment, id_col
        )

    q = queries.select(
        F.col(id_col).alias(query_id_col), as_double(F.col(vec_col)).alias("__qv__")
    ).withColumn("__qn__", l2_norm(F.col("__qv__")))
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("__cv__"),
        ).withColumn("__cn__", l2_norm(F.col("__cv__")))
    )
    q_probes = topk_per_key(
        q.crossJoin(cents).select(
            query_id_col,
            "centroid_id",
            (
                dot(F.col("__qv__"), F.col("__cv__"))
                / (F.col("__qn__") * F.col("__cn__"))
            ).alias("__csim__"),
        ),
        [query_id_col],
        [F.col("__csim__").desc(), F.col("centroid_id")],
        n_probe,
    ).select(query_id_col, "centroid_id")

    qslices = F.array(
        *[F.slice("__qv__", m * sub_dim + 1, sub_dim) for m in range(m_sub)]
    )
    qsubs = q.select(query_id_col, F.posexplode(qslices).alias("sub_id", "sv"))
    table = qsubs.join(F.broadcast(cb), "sub_id").select(
        query_id_col, "sub_id", "code_id", l2_sq(F.col("sv"), F.col("cw")).alias("__d__")
    )

    from pyspark.sql import Window as W

    pivoted = (
        codes.join(q_probes, "centroid_id")
        .join(F.broadcast(table), [query_id_col, "sub_id", "code_id"])
        .groupBy(query_id_col, id_col)
        .agg(
            *[
                F.max(F.when(F.col("sub_id") == m, F.col("__d__"))).alias(f"__d{m}__")
                for m in range(m_sub)
            ]
        )
    )
    adc = F.lit(0.0)
    for m in range(m_sub):
        adc = adc + F.col(f"__d{m}__")
    w = W.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        pivoted.filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def pq_encode_vectorized(
    emb: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m_sub: int = 8,
    sub_dim: int = 8,
) -> DataFrame:
    """Arrow-batched PQ encoding for the BULK index-build regime: one
    numpy distance matrix per (batch, subspace) against the broadcast
    codebook, argmin per row — same nearest-codeword semantics as
    :func:`pq_encode` (squared L2, exact-tie → smallest code_id via
    argmin-first-hit), with the same FP caveat as
    :func:`ivf_assign_vectorized`: matmul accumulation order differs
    from the HOF fold, so EXACT distance ties near the float boundary
    can pick differently — keep the HOF path for oracle-hashed
    queries, use this to build big indexes (measured ~20× at 400k
    vectors: encode dominates IVF-PQ build cost there).

    Output matches pq_encode: (id, sub_id, code_id)."""
    import numpy as np
    import pandas as pd

    rows = codebook.select("sub_id", "code_id", "cw").collect()
    n_codes = max(r.code_id for r in rows) + 1
    cmats = {}
    for m in range(m_sub):
        cm = np.zeros((n_codes, sub_dim))
        for r in rows:
            if r.sub_id == m:
                cm[r.code_id] = r.cw
        cmats[m] = cm

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            out_id, out_sub, out_code = [], [], []
            for m in range(m_sub):
                sub = vmat[:, m * sub_dim : (m + 1) * sub_dim]
                # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; argmin over codes
                d = (
                    (sub * sub).sum(axis=1, keepdims=True)
                    - 2.0 * (sub @ cmats[m].T)
                    + (cmats[m] * cmats[m]).sum(axis=1)[None, :]
                )
                best = np.argmin(d, axis=1)
                out_id.append(ids)
                out_sub.append(np.full(len(ids), m, dtype=np.int32))
                out_code.append(best.astype(np.int64))
            yield pd.DataFrame(
                {
                    id_col: np.concatenate(out_id),
                    "sub_id": np.concatenate(out_sub),
                    "code_id": np.concatenate(out_code),
                }
            )

    return emb.select(id_col, vec_col).mapInPandas(
        encode, schema=f"{id_col} long, sub_id int, code_id long"
    )


def ivf_pq_index(
    corpus: DataFrame,
    centroid_stride: int = 50,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    code_stride: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Build the IVF-PQ index once: (codes, assignment), both cheap
    narrow frames to persist/checkpoint and reuse across query batches
    — encode+assign is BUILD cost, amortized in production exactly
    like ivf_persist's on-disk layout."""
    centroids = corpus.filter(F.col(id_col) % centroid_stride == 0)
    cb = pq_codebook(corpus, id_col, vec_col, m_sub, sub_dim, n_codes, code_stride)
    enc = pq_encode_vectorized if vectorized else pq_encode
    codes = enc(corpus, cb, id_col, vec_col, m_sub, sub_dim)
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    assignment = assign_fn(corpus, centroids, id_col, vec_col)
    return codes, assignment


def ivf_residuals(
    corpus: DataFrame,
    centroids: DataFrame,
    assignment: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, residual): each vector minus its coarse
    centroid — the classic IVF-PQ encoding input (Jegou et al., PAMI
    2011 §III): residuals concentrate around the origin, so the same
    codebook budget quantizes them with far less error than raw
    vectors.  Broadcast join on centroid_id + elementwise zip_with —
    map-only over the corpus."""
    c = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("__cv__"),
        )
    )
    return (
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("__v__"))
        .join(assignment, id_col)
        .join(c, "centroid_id")
        .select(
            id_col,
            "centroid_id",
            F.zip_with("__v__", "__cv__", lambda a, b: a - b).alias("residual"),
        )
    )


def ivf_pq_residual_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    centroid_stride: int = 50,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    code_stride: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    prebuilt: tuple[DataFrame, DataFrame] | None = None,
    vectorized_assign: bool = False,
) -> DataFrame:
    """Residual-encoded IVF-PQ (the variant :func:`ivf_pq_topk`'s
    docstring promises): PQ codes quantize ``v - centroid(v)`` instead
    of ``v``, and each query builds ONE distance table PER PROBED LIST
    from its own residual ``q - c`` — approximating
    ``||q - v||² = ||(q - c) - r_v||²`` with m_sub table lookups.

    Tighter codes at identical scan cost: the candidate scan still
    reads only (sub, code) ints; the extra work is the per-(query,
    probe) table, sized Q × n_probe × m_sub × n_codes — broadcast
    territory for any realistic query batch.  Recall@k against the
    exact L2 oracle is pinned ≥ the raw-encoding path in
    tests/test_pq.py and measured in tools/ivfpq_scale_experiment.py.

    Same determinism conventions as the raw path (stride-sampled
    codebook over residuals of ids 0, code_stride, ...; fixed
    left-to-right ADC sum; vec_id tie-breaks), so the result can sit
    behind a value-hash oracle when the HOF assign path is used.

    Default ``code_stride=7`` is deliberately NOT the centroid stride:
    sampling codewords at the centroid ids would take the centroids'
    OWN residuals — exactly zero — and degenerate the codebook to
    identical zero codewords.
    """
    centroids = corpus.filter(F.col(id_col) % centroid_stride == 0)
    assign_fn = ivf_assign_vectorized if vectorized_assign else ivf_assign
    if prebuilt is not None:
        # (codes, assignment) or (codes, assignment, codebook) — pass
        # the codebook from ivf_pq_residual_index to skip re-deriving
        # it per query batch; without it the codebook is recomputed
        # deterministically (parameters must match the build's, or ADC
        # decodes against the wrong book with no error).
        if len(prebuilt) == 3:
            codes_raw, assignment, cb = prebuilt
        else:
            codes_raw, assignment = prebuilt
            res = ivf_residuals(corpus, centroids, assignment, id_col, vec_col)
            cb = pq_codebook(
                res, id_col, "residual", m_sub, sub_dim, n_codes, code_stride
            )
        codes = codes_raw.join(assignment, id_col)
    else:
        assignment = assign_fn(corpus, centroids, id_col, vec_col)
        res = ivf_residuals(corpus, centroids, assignment, id_col, vec_col)
        cb = pq_codebook(res, id_col, "residual", m_sub, sub_dim, n_codes, code_stride)
        codes = pq_encode(res, cb, id_col, "residual", m_sub, sub_dim).join(
            assignment, id_col
        )

    return _residual_adc_search(
        queries, centroids, cb, codes, k, n_probe, m_sub, sub_dim,
        id_col, vec_col, query_id_col,
    )


def _residual_adc_search(
    queries: DataFrame,
    centroids: DataFrame,
    cb: DataFrame,
    codes: DataFrame,
    k: int,
    n_probe: int,
    m_sub: int,
    sub_dim: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    probes: DataFrame | None = None,
) -> DataFrame:
    """Query half of residual IVF-PQ, shared by the inline path and the
    persisted-index probe: probe selection, per-(query, list) residual
    distance tables, ADC pivot, rank.  ``probes`` (query_id,
    centroid_id, __qv__) skips the probe-selection pass when the
    caller already computed it (the persisted path needs it first for
    partition pruning)."""
    from pyspark.sql import Window as W

    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("__cv__"),
        ).withColumn("__cn__", l2_norm(F.col("__cv__")))
    )
    if probes is not None:
        q_probes = probes
    else:
        q = queries.select(
            F.col(id_col).alias(query_id_col),
            as_double(F.col(vec_col)).alias("__qv__"),
        ).withColumn("__qn__", l2_norm(F.col("__qv__")))
        q_probes = topk_per_key(
            q.crossJoin(cents).select(
                query_id_col,
                "centroid_id",
                F.col("__qv__"),
                (
                    dot(F.col("__qv__"), F.col("__cv__"))
                    / (F.col("__qn__") * F.col("__cn__"))
                ).alias("__csim__"),
            ),
            [query_id_col],
            [F.col("__csim__").desc(), F.col("centroid_id")],
            n_probe,
        ).select(query_id_col, "centroid_id", "__qv__")

    # Per-(query, probed-list) residual → slices → distance table.
    qres = q_probes.join(cents.drop("__cn__"), "centroid_id").select(
        query_id_col,
        "centroid_id",
        F.zip_with("__qv__", "__cv__", lambda a, b: a - b).alias("__qr__"),
    )
    qslices = F.array(
        *[F.slice("__qr__", m * sub_dim + 1, sub_dim) for m in range(m_sub)]
    )
    qsubs = qres.select(
        query_id_col, "centroid_id", F.posexplode(qslices).alias("sub_id", "sv")
    )
    table = qsubs.join(F.broadcast(cb), "sub_id").select(
        query_id_col,
        "centroid_id",
        "sub_id",
        "code_id",
        l2_sq(F.col("sv"), F.col("cw")).alias("__d__"),
    )

    pivoted = (
        codes.join(q_probes.select(query_id_col, "centroid_id"), "centroid_id")
        .join(F.broadcast(table), [query_id_col, "centroid_id", "sub_id", "code_id"])
        .groupBy(query_id_col, id_col)
        .agg(
            *[
                F.max(F.when(F.col("sub_id") == m, F.col("__d__"))).alias(f"__d{m}__")
                for m in range(m_sub)
            ]
        )
    )
    adc = F.lit(0.0)
    for m in range(m_sub):
        adc = adc + F.col(f"__d{m}__")
    w = W.partitionBy(query_id_col).orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    return (
        pivoted.filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("adc_dist", adc)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "adc_dist", "rank")
    )


def ivf_pq_residual_index(
    corpus: DataFrame,
    centroid_stride: int = 50,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    code_stride: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Residual twin of :func:`ivf_pq_index`: (codes-over-residuals,
    assignment, codebook) — pass the full 3-tuple as ``prebuilt`` so
    query batches skip the codebook re-derivation too."""
    centroids = corpus.filter(F.col(id_col) % centroid_stride == 0)
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    from mbai_gdb_spark.ops.lineage import truncate

    assignment = assign_fn(corpus, centroids, id_col, vec_col)
    assignment = truncate(assignment)  # read twice: residuals + return
    res = ivf_residuals(corpus, centroids, assignment, id_col, vec_col)
    cb = pq_codebook(res, id_col, "residual", m_sub, sub_dim, n_codes, code_stride)
    enc = pq_encode_vectorized if vectorized else pq_encode
    codes = enc(res, cb, id_col, "residual", m_sub, sub_dim)
    return codes, assignment, truncate(cb)


def l2_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Arrow-batched brute-force SQUARED-L2 top-k — the exact oracle the
    PQ family approximates (ADC sums quantized ||q - v||² terms), so
    this is the recall denominator for :func:`pq_adc_topk` /
    :func:`ivf_pq_topk` / :func:`ivf_pq_residual_topk`.  Same plan
    shape as :func:`cosine_topk_vectorized`: broadcast query matrix,
    one matmul + batch-local top-(k+1) per Arrow batch (k+1 so the
    self-pair can be dropped without losing a true neighbor), then a
    global rank over ≤ (k+1)·n_batches candidates per query.

    Distances reported OMIT the constant ||q||² term (rank-invariant
    per query): ``d2 = ||v||² - 2 q·v``, so values can be negative —
    compare within a query only.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql import Window as W

    q_rows = sorted(
        queries.select(
            F.col(id_col), as_double(F.col(vec_col)).alias("__qv__")
        ).collect(),
        key=lambda r: r[0],
    )
    qid = np.array([r[0] for r in q_rows], dtype=np.int64)
    qmat = np.array([r[1] for r in q_rows], dtype=np.float64)

    def scan(batches):
        if len(qid) == 0:
            # No queries: emit nothing.  Without this guard the
            # per-query candidate lists stay empty and
            # np.concatenate([]) raises INSIDE the executor, failing
            # the stage instead of returning an empty result.
            return
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vmat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy()
            d = (vmat * vmat).sum(axis=1)[None, :] - 2.0 * (qmat @ vmat.T)
            kk = min(k + 1, d.shape[1])
            # batch-local candidates: lexsort by (d2, vec_id) so a tied
            # global winner can never be dropped by the partial top-k
            order = np.lexsort((ids[None, :].repeat(len(qid), 0), d), axis=1)[:, :kk]
            out_q, out_v, out_d = [], [], []
            for qi in range(len(qid)):
                sel = order[qi]
                out_q.append(np.full(kk, qid[qi], dtype=np.int64))
                out_v.append(ids[sel])
                out_d.append(d[qi, sel])
            yield pd.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_v),
                    "l2_sq_dist": np.concatenate(out_d),
                }
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        scan, schema=f"{query_id_col} long, {id_col} long, l2_sq_dist double"
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("l2_sq_dist").asc(), F.col(id_col).asc()
    )
    return (
        cand.filter(F.col(query_id_col) != F.col(id_col))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "l2_sq_dist", "rank")
    )


def ivfpq_persist(
    corpus: DataFrame,
    path: str,
    centroid_stride: int = 50,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    code_stride: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> None:
    """Write a residual IVF-PQ index as an on-disk layout: the
    (vec_id, sub_id, code_id) codes PARTITIONED BY centroid_id (a
    probe reads only its n_probe list directories — partition pruning,
    plan-tested), with ``_centroids`` and ``_codebook`` side-cars
    (underscore-hidden from the list scan).  The whole index for a
    billion 64-float vectors is m_sub small ints per vector plus two
    broadcast-sized side-cars — the layout :func:`ivf_persist` uses for
    raw vectors, at PQ's storage footprint."""
    from mbai_gdb_spark.io import write_partitioned
    from mbai_gdb_spark.ops.lineage import truncate

    centroids = corpus.filter(F.col(id_col) % centroid_stride == 0)
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    assignment = truncate(assign_fn(corpus, centroids, id_col, vec_col))
    res = ivf_residuals(corpus, centroids, assignment, id_col, vec_col)
    cb = truncate(
        pq_codebook(res, id_col, "residual", m_sub, sub_dim, n_codes, code_stride)
    )
    enc = pq_encode_vectorized if vectorized else pq_encode
    codes = enc(res, cb, id_col, "residual", m_sub, sub_dim).join(assignment, id_col)
    # One file per list directory (see ops.text's file-spray note).
    write_partitioned(codes, path, ["centroid_id"], sort_cols=[id_col, "sub_id"])
    centroids.select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col)
    ).coalesce(1).write.mode("overwrite").parquet(path + "/_centroids")
    cb.coalesce(1).write.mode("overwrite").parquet(path + "/_codebook")


def ivfpq_append(
    new_vectors: DataFrame,
    path: str,
    m_sub: int | None = None,
    sub_dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> None:
    """Append NEW vectors into a persisted :func:`ivfpq_persist` layout
    with FROZEN side-cars — the vector-search counterpart of
    ``ops.text.bm25_index_append``: corpus growth without a rebuild.

    New vectors assign to the EXISTING centroids and residual-encode
    with the EXISTING codebook (production IVF-PQ semantics: quantizers
    are trained once and retrained offline when drift warrants a new
    index generation).  Unlike BM25's df, PQ codes carry NO corpus-
    global statistics, so the merge is a pure INSERT: new code rows
    land as additional files inside their centroid_id partition
    directories and no existing file is ever rewritten.  Consequences,
    both tested: append is associative (one batch ≡ any split into
    batches, bit-identical probes), and appended rows equal the frozen
    encoding of the delta exactly.

    Appended ids must be NEW.  The overlap guard reads only the
    partitions the delta assigns to — complete for exact re-adds, since
    frozen centroids assign a re-added vector to the same list.

    PQ geometry (``m_sub``, ``sub_dim``) is DERIVED from the persisted
    ``_codebook`` side-car by default — the side-car, not the caller,
    is the source of truth, exactly as ``bm25_index_append`` reads
    ``n_buckets`` from ``_meta``.  Passing them explicitly is allowed
    but validated against the side-car: a mismatch raises instead of
    silently inserting corrupt codes.

    Plan shape at scale: assignment and encoding are the same
    broadcast-join map-only pipeline the builder uses, over the DELTA
    only; the guard scans |assigned lists| partitions; the write
    touches the same.  Cost is |delta|, never the index."""
    from mbai_gdb_spark.io import check_serving_safe
    from mbai_gdb_spark.ops.lineage import truncate

    # Same gate as the probes: never insert into a layout holding
    # crashed-maintenance evidence (the guard would read a missing or
    # half-filtered list and the merge would compound the damage).
    check_serving_safe(path)
    spark = new_vectors.sparkSession
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    cb = spark.read.parquet(path + "/_codebook")
    geo = cb.agg(
        (F.max("sub_id") + 1).alias("m"),
        F.min(F.size("cw")).alias("d_min"),
        F.max(F.size("cw")).alias("d_max"),
    ).first()
    if geo["d_min"] != geo["d_max"]:
        raise ValueError(
            f"ivfpq_append: corrupt _codebook at {path}: codeword "
            f"lengths vary ({geo['d_min']}..{geo['d_max']})"
        )
    cb_m, cb_d = int(geo["m"]), int(geo["d_min"])
    if m_sub is None:
        m_sub = cb_m
    elif m_sub != cb_m:
        raise ValueError(
            f"ivfpq_append: m_sub={m_sub} does not match the persisted "
            f"codebook's {cb_m} sub-quantizers"
        )
    if sub_dim is None:
        sub_dim = cb_d
    elif sub_dim != cb_d:
        raise ValueError(
            f"ivfpq_append: sub_dim={sub_dim} does not match the "
            f"persisted codebook's codeword length {cb_d}"
        )
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    assignment = truncate(assign_fn(new_vectors, centroids, id_col, vec_col))
    if assignment.isEmpty():
        return  # empty delta: nothing to insert
    touched = [
        r["centroid_id"]
        for r in assignment.select("centroid_id").distinct().collect()
    ]
    existing_ids = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .select(id_col)
    )
    dup = existing_ids.join(
        assignment.select(id_col), id_col, "leftsemi"
    ).limit(1)
    if dup.count() > 0:
        raise ValueError(
            "ivfpq_append: delta contains vec_ids already in the index — "
            "append is insert-only; rebuild for updates"
        )
    res = ivf_residuals(new_vectors, centroids, assignment, id_col, vec_col)
    enc = pq_encode_vectorized if vectorized else pq_encode
    codes = enc(res, cb, id_col, "residual", m_sub, sub_dim).join(assignment, id_col)
    (
        codes.repartition(max(len(touched), 1), F.col("centroid_id"))
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def ivfpq_delete(
    del_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> None:
    """Physically DELETE vectors from a persisted :func:`ivfpq_persist`
    layout — the counterpart of ``ops.text.bm25_index_delete`` and the
    missing half of the update story (update = delete + re-append).
    Quantizers stay FROZEN: deletion removes code rows, never retrains
    — production vector-database semantics, where drift-driven
    retraining is an offline new-generation build.  A deleted vector
    that also served as a centroid keeps its centroid role (the
    ``_centroids`` side-car is the quantizer, not corpus data).

    Delete-by-VECTOR, not by id, for the same reason the BM25 delete is
    by-document: assigning the delta under the frozen centroids names
    exactly the list directories its code rows live in, so
    identification is O(delta) map-only work + |assigned lists|
    directory reads, never an index scan.  Every delta id must be found
    in its assigned list (a vector passed with different values than
    indexed assigns elsewhere, is not found, and raises — refuse over
    corrupt).  Deletion itself only needs the LIST, so code rows are
    removed exactly even though codes are lossy.

    Exactness contract (property-tested): probes after the delete are
    bit-identical to an index built the same way over the corpus
    without the deleted vectors (same frozen quantizers — deletion
    cannot retrain, by design).

    Crash story: a ``_delete_inflight`` sentinel spans the partition-
    directory swaps; probes refuse while it stands (mixed filtered/
    unfiltered lists must not serve).  Under a generation-managed root
    (:mod:`mbai_gdb_spark.indexgen`) a crashed delete is simply an
    unpublished generation."""
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe
    from mbai_gdb_spark.ops.lineage import truncate

    check_serving_safe(path)
    spark = del_vectors.sparkSession
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    stats = del_vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    d_vecs = int(stats["n"] or 0)
    if d_vecs == 0:
        return  # empty delta: nothing to delete
    if int(stats["nd"]) != d_vecs:
        raise ValueError(
            "ivfpq_delete: delta contains duplicate vec_ids — each "
            "deleted vector must appear exactly once"
        )
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    assignment = truncate(assign_fn(del_vectors, centroids, id_col, vec_col))
    touched = sorted(
        r["centroid_id"]
        for r in assignment.select("centroid_id").distinct().collect()
    )
    stored_ids = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .select(id_col)
        .distinct()
    )
    found = stored_ids.join(
        F.broadcast(assignment.select(id_col)), id_col, "leftsemi"
    ).count()
    if found != d_vecs:
        raise ValueError(
            f"ivfpq_delete: only {found} of {d_vecs} delta vec_ids were "
            "found in their assigned lists — a vector absent from the "
            "index, or passed with different values than indexed "
            "(assigning to a different list), refuses loudly instead of "
            "corrupting the layout"
        )
    # Materialize the filtered survivors BEFORE mutating anything.
    staging = os.path.join(path, "_delete_staging")
    keep = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .join(F.broadcast(assignment.select(id_col)), id_col, "left_anti")
    )
    (
        keep.repartition(max(len(touched), 1), F.col("centroid_id"))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(staging)
    )
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for c in touched:
        src = os.path.join(staging, f"centroid_id={c}")
        dst = os.path.join(path, f"centroid_id={c}")
        aside = os.path.join(path, f"_compact_old_centroid_id={c}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: filtered replacement in
        # A list whose every vector was deleted has no staged dir: the
        # directory simply goes away (probes tolerate missing lists).
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)


def ivfpq_update(
    old_vectors: DataFrame,
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> None:
    """FUSED in-place update of vectors in a persisted
    :func:`ivfpq_persist` layout: semantically delete(old) +
    append(new) under the FROZEN quantizers (centroids + codebook stay
    exactly as built — production semantics; drift-driven retraining is
    an offline new-generation build), executed as ONE mutation — each
    touched list directory is rewritten exactly once with (surviving
    code rows ∪ the new values' frozen re-encoding).  Under a
    generation-managed root (:func:`mbai_gdb_spark.indexgen.
    ivfpq_gen_update`) that is ONE published generation per update
    instead of the composed path's two.

    Contract: ``old_vectors`` are the indexed (id, vector) rows —
    verified found-by-id in their assigned lists, the strongest check a
    lossy-code layout offers (a vector passed with values that assign
    to a different list is not found and refuses) — and ``new_vectors``
    the SAME id set with replacement values (id-set equality enforced).
    New values re-assign and re-encode under the frozen quantizers; an
    updated vector may move lists, hence touched = lists(old) ∪
    lists(new).

    Exactness contract (property-tested): probes after the update are
    bit-identical to delete(old)+append(new), and to an index whose
    code rows for the updated ids are the frozen encoding of the new
    values."""
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe
    from mbai_gdb_spark.ops.lineage import truncate

    check_serving_safe(path)
    spark = old_vectors.sparkSession
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    cb = spark.read.parquet(path + "/_codebook")
    geo = cb.agg(
        (F.max("sub_id") + 1).alias("m"),
        F.min(F.size("cw")).alias("d_min"),
        F.max(F.size("cw")).alias("d_max"),
    ).first()
    if geo["d_min"] != geo["d_max"]:
        raise ValueError(
            f"ivfpq_update: corrupt _codebook at {path}: codeword "
            f"lengths vary ({geo['d_min']}..{geo['d_max']})"
        )
    m_sub, sub_dim = int(geo["m"]), int(geo["d_min"])
    o_stats = old_vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    u_vecs = int(o_stats["n"] or 0)
    if u_vecs == 0:
        return  # empty update set: nothing to do
    if int(o_stats["nd"]) != u_vecs:
        raise ValueError(
            "ivfpq_update: old_vectors contains duplicate vec_ids — "
            "each updated vector must appear exactly once"
        )
    n_stats = new_vectors.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(id_col)).alias("nd"),
    ).first()
    if int(n_stats["nd"] or 0) != int(n_stats["n"] or 0):
        raise ValueError("ivfpq_update: new_vectors contains duplicate vec_ids")
    id_mismatch = (
        old_vectors.select(F.col(id_col).alias("__o__"))
        .join(
            new_vectors.select(F.col(id_col).alias("__n__")),
            F.col("__o__") == F.col("__n__"),
            "full_outer",
        )
        .filter(F.col("__o__").isNull() | F.col("__n__").isNull())
        .limit(1)
    )
    if id_mismatch.count() > 0:
        raise ValueError(
            "ivfpq_update: old_vectors and new_vectors must carry the "
            "SAME id set (update, not upsert) — use ivfpq_append / "
            "ivfpq_delete for membership changes"
        )
    assign_fn = ivf_assign_vectorized if vectorized else ivf_assign
    o_assign = truncate(assign_fn(old_vectors, centroids, id_col, vec_col))
    n_assign = truncate(assign_fn(new_vectors, centroids, id_col, vec_col))
    touched = sorted(
        {
            r["centroid_id"]
            for r in o_assign.select("centroid_id")
            .unionAll(n_assign.select("centroid_id"))
            .distinct()
            .collect()
        }
    )
    if not any(n.startswith("centroid_id=") for n in os.listdir(path)):
        raise ValueError(
            "ivfpq_update: index holds no vectors — the update's vectors "
            "are not in it"
        )
    stored_ids = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .select(id_col)
        .distinct()
    )
    found = stored_ids.join(
        F.broadcast(o_assign.select(id_col)), id_col, "leftsemi"
    ).count()
    if found != u_vecs:
        raise ValueError(
            f"ivfpq_update: only {found} of {u_vecs} old vec_ids were "
            "found in their assigned lists — a vector absent from the "
            "index, or passed with different values than indexed "
            "(assigning to a different list), refuses loudly instead of "
            "corrupting the layout"
        )
    # --- stage (surviving codes ∪ frozen re-encoding) once, swap once ---
    res = ivf_residuals(new_vectors, centroids, n_assign, id_col, vec_col)
    enc = pq_encode_vectorized if vectorized else pq_encode
    new_codes = enc(res, cb, id_col, "residual", m_sub, sub_dim).join(
        n_assign, id_col
    )
    staging = os.path.join(path, "_delete_staging")
    survivors = (
        spark.read.parquet(path)
        .filter(F.col("centroid_id").isin(touched))
        .join(F.broadcast(o_assign.select(id_col)), id_col, "left_anti")
    )
    cols = survivors.columns  # code columns + centroid_id
    (
        survivors.select(*cols)
        .unionAll(new_codes.select(*cols))
        .repartition(max(len(touched), 1), F.col("centroid_id"))
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(staging)
    )
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for c in touched:
        src = os.path.join(staging, f"centroid_id={c}")
        dst = os.path.join(path, f"centroid_id={c}")
        aside = os.path.join(path, f"_compact_old_centroid_id={c}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: rewritten replacement in
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)


def ivfpq_probe_persisted(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 2,
    m_sub: int = 8,
    sub_dim: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ANN search against a persisted residual IVF-PQ layout: centroids
    and codebook load from the side-cars (broadcast-sized), each
    query's n_probe lists resolve to a ``centroid_id IN (...)``
    PARTITION filter on the codes layout — unprobed lists are never
    read — and the rest is the shared residual-ADC pipeline
    (:func:`_residual_adc_search`).  Same output contract as
    :func:`ivf_pq_residual_topk`.  Refuses crashed-maintenance layouts
    (compaction residue / in-flight delete) loudly; an index whose
    every list was deleted probes to the typed empty result."""
    import os

    from mbai_gdb_spark.io import check_serving_safe

    check_serving_safe(path)
    if not any(n.startswith("centroid_id=") for n in os.listdir(path)):
        # Typed empty result: the QUERY id type comes from the queries
        # frame, but the CORPUS id type comes from the persisted layout
        # itself — the `_centroids` side-car's centroid_id column was
        # aliased from the corpus id at build time, so the empty and
        # non-empty schemas agree even when query and corpus id types
        # differ (the same drift the BM25 path fixed via _meta.id_type).
        qid_ddl = queries.schema[id_col].dataType.simpleString()
        cid_ddl = (
            spark.read.parquet(path + "/_centroids")
            .schema["centroid_id"]
            .dataType.simpleString()
        )
        return spark.createDataFrame(
            [],
            f"`{query_id_col}` {qid_ddl}, `{id_col}` {cid_ddl},"
            " adc_dist double, rank int",
        )
    centroids = spark.read.parquet(path + "/_centroids").select(
        F.col("centroid_id").alias(id_col), F.col(vec_col)
    )
    cb = spark.read.parquet(path + "/_codebook")
    codes_all = spark.read.parquet(path)

    # Resolve probe lists ONCE (bounded: n_queries × n_probe rows,
    # truncated so it feeds both the partition-filter id list and the
    # ADC search without recomputing the centroid scan).
    q = queries.select(
        F.col(id_col).alias(query_id_col), as_double(F.col(vec_col)).alias("__qv__")
    ).withColumn("__qn__", l2_norm(F.col("__qv__")))
    cents = F.broadcast(
        centroids.select(
            F.col(id_col).alias("centroid_id"),
            as_double(F.col(vec_col)).alias("__cv__"),
        ).withColumn("__cn__", l2_norm(F.col("__cv__")))
    )
    # r14: one COLLECT (bounded: n_queries × n_probe rows) replaces the
    # eager-checkpoint job + distinct+collect job; the rows feed the
    # partition-filter id list AND rebuild as the local probes frame
    # the ADC search joins (guide §7.3 — serving-path driver round
    # trips).
    probes_df = topk_per_key(
        q.crossJoin(cents).select(
            query_id_col,
            "centroid_id",
            F.col("__qv__"),
            (
                dot(F.col("__qv__"), F.col("__cv__"))
                / (F.col("__qn__") * F.col("__cn__"))
            ).alias("__csim__"),
        ),
        [query_id_col],
        [F.col("__csim__").desc(), F.col("centroid_id")],
        n_probe,
    ).select(query_id_col, "centroid_id", "__qv__")
    probe_rows = probes_df.collect()
    probes = spark.createDataFrame(probe_rows, probes_df.schema)
    probe_ids = sorted({r["centroid_id"] for r in probe_rows})
    pruned = codes_all.filter(F.col("centroid_id").isin(probe_ids))
    return _residual_adc_search(
        queries, centroids, cb, pruned, k, n_probe, m_sub, sub_dim,
        id_col, vec_col, query_id_col, probes=probes,
    )
