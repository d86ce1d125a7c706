"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Training-data-pipeline extensions beyond the reference's surface (its
only dedup is MERGE-by-unique-id, reference src/queries/game.py:86-94 —
re-expressed here as :func:`exact_dedup`).

Scale design:
- exact dedup: one hash-groupBy on the content key — embarrassingly
  parallel, AQE handles skewed duplicate clusters.
- n-gram Jaccard: inverted-index self-join on shingles (never an O(n²)
  document cross join); hot shingles should be frequency-capped at
  ingest (``max_shingle_freq``) — the standard df-cut that keeps the
  join linear in corpus size.
- MinHash: signatures are a map-only stage given integer token ids;
  LSH banding turns near-dup search into an equi-join on (band, bucket).
- Token ids here come from a global dictionary (dense_rank over distinct
  tokens) so results are engine-reproducible for the oracle gate.  The
  100 TB path swaps the dictionary for ``xxhash64(token)`` — same
  pipeline shape minus the dictionary join; both are exposed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from mbai_gdb_spark.ops.lineage import truncate as _ckpt

from mbai_gdb_spark.ops.text import tokens

MERSENNE31 = 2_147_483_647


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Exact dedup: keep the smallest id per identical content; report
    cluster size.  (= the reference's deterministic-id MERGE semantics.)"""
    return df.groupBy(*content_cols).agg(
        F.min(id_col).alias(f"{id_col}_kept"),
        F.count(F.lit(1)).alias("n_dupes"),
    ).select(f"{id_col}_kept", "n_dupes")


def shingle_set(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Distinct k-token shingles per document: (id, shingle)."""
    toks = tokens(text_col)
    with_toks = df.select(F.col(id_col), toks.alias("__toks__"))
    idx = F.sequence(F.lit(1), F.size("__toks__") - (k - 1))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("__toks__"), i + j) for j in range(k)]
        ),
    )
    return (
        with_toks.filter(F.size("__toks__") >= k)
        .select(F.col(id_col), F.explode(F.array_distinct(shingle)).alias("shingle"))
    )


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str,
    threshold: float,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by shingle-set Jaccard via inverted index.

    Output: (id_a, id_b, n_common, jaccard) with id_a < id_b and
    jaccard >= threshold.  The jaccard is an exact integer ratio.
    """
    sh = shingles
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df__"))
        sh = sh.join(
            freq.filter(F.col("__df__") <= max_shingle_freq).select("shingle"),
            "shingle",
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__n__"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    pairs = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("__n__").alias("__na__"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("__n__").alias("__nb__"))
    jac = (
        F.col("n_common").cast("double")
        / (F.col("__na__") + F.col("__nb__") - F.col("n_common"))
    )
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def _prefix_bucket(token_col: str) -> Column:
    """Order-preserving bucket from a token's first two chars: if
    a < b (binary collation) then bucket(a) <= bucket(b).  Pure function
    of the data — deterministic across jobs, unlike sampled
    repartitionByRange boundaries."""
    c1 = F.ascii(F.substring(F.col(token_col), 1, 1))
    c2 = F.least(F.ascii(F.substring(F.col(token_col), 2, 1)), F.lit(1023))
    return (c1.cast("long") * 1024 + c2).alias("__bkt__")


def token_dictionary(tokens_df: DataFrame, token_col: str = "token") -> DataFrame:
    """Deterministic global token ids == dense_rank over the sorted
    distinct vocabulary (binary/ASCII collation in both Spark and
    DuckDB) — WITHOUT a global single-partition sort.

    Recipe: distinct tokens → order-preserving prefix bucket (first two
    chars) → per-bucket rank (window partitioned by bucket) + bucket
    offset (tiny per-bucket counts, one row per occupied bucket,
    computed in a driver-side pass — the zipWithIndex recipe).
    Parallelism = #occupied buckets instead of 1; ids are identical to
    the old formulation, so the DuckDB oracles are unchanged.  At
    100 TB the stateless alternative is ``hashed_token_ids`` (map-only,
    no dictionary at all).
    """
    spark = tokens_df.sparkSession
    # localCheckpoint (not persist): the offsets pass below materializes
    # the deduped vocabulary once and the caller's main job reuses it —
    # and the checkpoint blocks are released when this frame is GC'd,
    # whereas an unmatched .persist() would pin the vocabulary in
    # executor storage for the session's lifetime.  Vocabulary-sized,
    # not corpus-sized.
    distinct = (
        tokens_df.select(token_col)
        .distinct()
        .withColumn("__bkt__", _prefix_bucket(token_col))
        .transform(_ckpt)
    )
    counts = sorted(
        (r["__bkt__"], r["n"])
        for r in distinct.groupBy("__bkt__").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = [], 0
    for bkt, n in counts:
        offsets.append((bkt, acc))
        acc += n
    off_df = spark.createDataFrame(offsets or [(0, 0)], "__bkt__ long, __off__ long")
    w = Window.partitionBy("__bkt__").orderBy(token_col)
    return (
        distinct.join(F.broadcast(off_df), "__bkt__")
        .withColumn("tok_id", (F.row_number().over(w) + F.col("__off__")).cast("long"))
        .select(token_col, "tok_id")
    )


def hashed_token_ids(tokens_df: DataFrame, token_col: str = "token") -> DataFrame:
    """Scale path: stateless 64-bit token ids (xxhash64) — map-only."""
    return tokens_df.withColumn(
        "tok_id", F.abs(F.xxhash64(F.col(token_col))) % F.lit(MERSENNE31)
    )


def char_poly_id(token_col: str | Column, mod: int = MERSENNE31, mult: int = 31) -> Column:
    """Stateless token id: polynomial rolling hash over the token's
    code points, ``h = (h*mult + codepoint) % mod``.

    THE 100 TB default for minhash/simhash/fingerprint ids: map-only
    (no vocabulary dictionary, no shuffle, no driver pass), and — unlike
    xxhash64 — bit-identically reproducible in plain SQL on any engine
    with ascii()/list_reduce, so the DuckDB oracles need no dictionary
    either.  Collisions (~|vocab|²/2³¹) are harmless for sketching."""
    col = F.col(token_col) if isinstance(token_col, str) else token_col
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * mult + F.ascii(c)) % F.lit(mod),
    )


def char_poly_token_ids(
    tokens_df: DataFrame, token_col: str = "token"
) -> DataFrame:
    """``char_poly_id`` attached as ``tok_id`` — drop-in replacement for
    :func:`token_dictionary` (same output shape, no dictionary join)."""
    return tokens_df.withColumn("tok_id", char_poly_id(token_col))


def minhash_signatures(
    doc_tokens: DataFrame,
    id_col: str = "doc_id",
    tok_id_col: str = "tok_id",
    n_hashes: int = 16,
    prime: int = MERSENNE31,
) -> DataFrame:
    """MinHash signatures over integer token-id sets.

    Hash family ``h_i(x) = ((2i+1)*x + 7919*i + 13) % prime`` —
    deterministic and reproducible in plain SQL.  Output long format
    (doc, hash_idx, minhash): one explode + one groupBy; signature width
    is a constant, so cost is n_hashes × |tokens| map-side.
    """
    hashes = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("hash_idx")
    exploded = doc_tokens.select(id_col, tok_id_col, hashes)
    hv = (
        (2 * F.col("hash_idx") + 1) * F.col(tok_id_col)
        + 7919 * F.col("hash_idx")
        + 13
    ) % F.lit(prime)
    return (
        exploded.withColumn("__hv__", hv)
        .groupBy(id_col, "hash_idx")
        .agg(F.min("__hv__").alias("minhash"))
    )


def pairs_from_buckets(
    buckets: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id, band, bucket) → distinct candidate pairs via an equi self-join
    on (band, bucket) — no cross join.

    ``max_bucket_size`` caps the quadratic hazard: a (band, bucket)
    holding b docs emits O(b²) pairs, so one hot bucket (e.g. a
    boilerplate cluster) can dominate the whole job.  Buckets larger
    than the cap are dropped from pair generation — the standard df-cut.
    They are NOT lost: :func:`hot_bucket_clusters` /
    :func:`hot_bucket_membership` surface them as linear-sized cluster
    rows, which is where curation output for mega-clusters should come
    from.
    """
    if max_bucket_size is not None:
        sizes = buckets.groupBy("band", "bucket").agg(
            F.count(F.lit(1)).alias("__bsz__")
        )
        buckets = buckets.join(
            sizes.filter(F.col("__bsz__") <= max_bucket_size).select("band", "bucket"),
            ["band", "bucket"],
            "left_semi",
        )
    a = buckets.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = buckets.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding over LONG-format signatures (doc, hash_idx, minhash):
    docs sharing any full band become a candidate pair.  See
    :func:`pairs_from_buckets` for the hot-bucket cap."""
    buckets = lsh_bucket_table(signatures, id_col, rows_per_band)
    return pairs_from_buckets(buckets, id_col, max_bucket_size)


def minhash_signature_array(
    tok_ids: Column, n_hashes: int = 16, prime: int = MERSENNE31
) -> Column:
    """MAP-ONLY MinHash: the full signature as an array<long> computed
    per row from an array of integer token ids — no explode, no groupBy.
    Same hash family as :func:`minhash_signatures`, so the two paths are
    value-identical; this one turns the signature stage from two
    shuffles (distinct + groupBy over an n_hashes× row blowup) into pure
    column algebra, which is the 100 TB default.  Duplicate ids in the
    array are harmless (min is idempotent).

    Shape: ONE ``aggregate`` fold over the id array carrying n_hashes
    running minima, updated via ``zip_with``.  The fold evaluates its
    input array exactly once per row — the naive
    ``transform(hashes, i -> array_min(transform(ids, ...)))`` nesting
    re-evaluates the (expensive, e.g. char-poly) id expression once PER
    HASH, a measured 4× slowdown at 16 permutations."""
    idx = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    return F.aggregate(
        tok_ids,
        F.array_repeat(F.lit(prime).cast("long"), n_hashes),
        lambda acc, x: F.zip_with(
            acc,
            idx,
            lambda m, i: F.least(
                m, ((2 * i + 1) * x + 7919 * i + 13) % F.lit(prime)
            ),
        ),
    )


def lsh_buckets_from_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "signature",
    rows_per_band: int = 4,
) -> DataFrame:
    """Array-signature → (id, band, bucket): one explode to #bands rows
    per doc (vs |tokens|×n_hashes in the long-format path)."""
    n_bands_expr = (F.size(F.col(sig_col)) / rows_per_band).cast("int")
    banded = df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_bands_expr - 1)).alias("band"),
        F.col(sig_col),
    )
    bucket = F.concat_ws(
        "_",
        F.transform(
            F.slice(
                F.col(sig_col), F.col("band") * rows_per_band + 1, rows_per_band
            ),
            lambda v: v.cast("string"),
        ),
    )
    return banded.select(id_col, "band", bucket.alias("bucket"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 40,
) -> DataFrame:
    """Near-duplicate CLUSTERS from candidate pairs: connected components
    over the pair graph, canonical = smallest id per component (the
    standard MinHash-dedup endgame — pairs alone over-remove when A~B
    and B~C but A≁C; the component is the dedup unit).

    Scale shape: min-label propagation, one equi-join + groupBy-min per
    iteration, lineage truncated via ops.lineage.truncate (ops.graph).
    Iterations needed = component diameter, which for near-dup clusters
    is small; vertices are only ids that appear in some pair, so the
    working set is the duplicate subset, not the corpus.

    Output: (doc_id, canonical_doc_id, cluster_size, is_canonical).
    """
    from pyspark.sql import Window as W

    from mbai_gdb_spark.ops.graph import connected_components

    # Materialize the candidate pairs once: they seed the vertex set, the
    # symmetric edge list, and every propagation join — without this the
    # whole upstream sketch pipeline would re-run per derivation.
    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).transform(_ckpt)
    vertices = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    comp = connected_components(vertices, edges, max_iter=max_iter)
    return (
        comp.select(
            F.col("id").alias("doc_id"), F.col("component").alias("canonical_doc_id")
        )
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(W.partitionBy("canonical_doc_id")),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_doc_id"))
    )


def simhash(
    doc_tokens: DataFrame,
    id_col: str = "doc_id",
    tok_id_col: str = "tok_id",
    n_bits: int = 16,
    prime: int = MERSENNE31,
) -> DataFrame:
    """SimHash fingerprints: bit j is the sign of the sum over tokens of
    ±1 according to bit j of the token hash.  Map + one groupBy; the
    per-bit expansion is a constant factor."""
    bits = F.explode(F.sequence(F.lit(0), F.lit(n_bits - 1))).alias("bit")
    hv = ((F.col(tok_id_col) * 2654435761 + 97) % F.lit(prime)).alias("__hv__")
    exploded = doc_tokens.select(id_col, hv).select(id_col, "__hv__", bits)
    contrib = F.when(
        F.floor(F.col("__hv__") / F.pow(F.lit(2.0), F.col("bit"))).cast("long") % 2 == 1,
        F.lit(1),
    ).otherwise(F.lit(-1))
    per_bit = exploded.withColumn("__c__", contrib).groupBy(id_col, "bit").agg(
        F.sum("__c__").alias("__s__")
    )
    bit_val = F.when(
        F.col("__s__") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("long")
    ).otherwise(F.lit(0))
    return per_bit.withColumn("__b__", bit_val).groupBy(id_col).agg(
        F.sum("__b__").alias("simhash")
    )


def dup_span_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document duplicated-span profile: for each document, the
    fraction of its distinct k-token shingles that also occur in at
    least ``min_df - 1`` OTHER documents — the corpus-level duplicated-
    content signal (boilerplate, mirrored passages) that per-document
    repetition metrics (:func:`mbai_gdb_spark.ops.text.repetition_profile`)
    cannot see, and the span-granular complement of whole-document
    near-dup (Jaccard/MinHash drop documents; this scores how much of a
    KEPT document is corpus-duplicated text).

    Output: (id, n_shingles, n_dup_shingles, dup_shingle_frac) for every
    input document; docs shorter than k tokens have zero shingles and a
    NULL fraction.

    Scale shape: shingle doc-frequency is one partial+final count on the
    shingle key; the profile join back to shingles reuses that same key
    (one row per (doc, shingle) — the inverted index is never expanded,
    so the join output is linear in corpus size); the per-doc re-agg
    shuffles on the id.  No df-cut is needed here because hot shingles
    contribute one row each, not a quadratic pair set."""
    sh = shingle_set(docs, id_col, text_col, k)
    dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df__"))
    per_doc = (
        sh.join(dfreq, "shingle")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(
                F.when(F.col("__df__") >= min_df, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_dup_shingles"),
        )
    )
    return docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
        F.coalesce("n_dup_shingles", F.lit(0)).cast("long").alias("n_dup_shingles"),
        (
            F.col("n_dup_shingles").cast("double") / F.col("n_shingles")
        ).alias("dup_shingle_frac"),
    )


# ---------------------------------------------------------------------------
# Hot-bucket cluster surfacing (the other half of the pair-cap tradeoff)
# ---------------------------------------------------------------------------


def hot_bucket_membership(
    buckets: DataFrame, id_col: str = "doc_id", max_bucket_size: int = 50
) -> DataFrame:
    """Docs living in OVERSIZED (band, bucket) groups — the ones
    :func:`pairs_from_buckets` excludes from the quadratic pair join.

    One row per (doc, hot band-bucket): (id, band, bucket, cluster_rep,
    member_count) with ``cluster_rep`` = the bucket's minimum id.  LINEAR
    in corpus size (a count-groupBy plus an equi-join back) — a
    boilerplate mega-cluster of b docs costs b rows here versus b² in
    the pair join, which is exactly why curation output should come from
    THIS frame for hot buckets while pairs cover the long tail."""
    sizes = buckets.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("member_count"),
        F.min(id_col).alias("cluster_rep"),
    )
    hot = sizes.filter(F.col("member_count") > max_bucket_size)
    return buckets.join(hot, ["band", "bucket"]).select(
        id_col, "band", "bucket", "cluster_rep", "member_count"
    )


def hot_bucket_clusters(
    buckets: DataFrame,
    id_col: str = "doc_id",
    max_bucket_size: int = 50,
    sample_size: int = 8,
) -> DataFrame:
    """One CLUSTER row per oversized (band, bucket): representative id,
    member count, and a bounded id sample — so mega-clusters are
    FLAGGED with evidence instead of silently vanishing from the
    near-dup report.  The sample is the ``sample_size`` smallest ids
    (row_number window, sort-based and bounded-memory per bucket); the
    arrays never exceed ``sample_size`` regardless of bucket size."""
    member = hot_bucket_membership(buckets, id_col, max_bucket_size)
    rn = F.row_number().over(
        Window.partitionBy("band", "bucket").orderBy(id_col)
    )
    return (
        member.withColumn("__rn__", rn)
        .filter(F.col("__rn__") <= sample_size)
        .groupBy("band", "bucket", "cluster_rep", "member_count")
        .agg(F.array_sort(F.collect_list(id_col)).alias("member_sample"))
    )


def typo_pairs(
    tokens_df: DataFrame,
    token_col: str = "token",
    count_col: str | None = None,
    max_token_len: int = 24,
) -> DataFrame:
    """Edit-distance-1 token pairs via the deletion-neighborhood join
    (SymSpell/FastSS): (tok_a, tok_b, dist) with tok_a < tok_b.

    Every token emits itself plus its 1-deletion variants; two tokens
    within edit distance 1 (insert / delete / substitute) necessarily
    share a variant, so an equi-join on the variant string finds ALL
    such pairs with an inverted-index shape — never the all-pairs
    levenshtein cross join that naive fuzzy matching does.  The exact
    levenshtein filter then removes the (few) distance-2 collisions
    (e.g. two different substitutions sharing a deletion).  Linear in
    tokens × token-length; ``max_token_len`` caps the variant fan-out.
    """
    t = tokens_df.select(F.col(token_col).alias("tok")).distinct().filter(
        (F.length("tok") > 0) & (F.length("tok") <= max_token_len)
    )
    variants = t.select(
        "tok",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("tok")),
                    F.transform(
                        F.sequence(F.lit(1), F.length("tok")),
                        lambda i: F.concat(
                            F.col("tok").substr(F.lit(1), i - 1),
                            F.col("tok").substr(i + 1, F.length("tok")),
                        ),
                    ),
                )
            )
        ).alias("variant"),
    )
    # Pin the join's parallelism (r14, guide §2.5): the variant frame is
    # only a few MB, so AQE's byte-blind partition coalescing collapsed
    # the self-join + pair distinct + levenshtein — the expensive part —
    # onto ONE task (measured 3.6 s single-task stage at sf0.1).  An
    # explicit repartition by the join key is exempt from coalescing,
    # both self-join sides reuse the one exchange, and the target is
    # defaultParallelism — scale-adaptive, not a local constant.
    variants = variants.repartition(
        variants.sparkSession.sparkContext.defaultParallelism, "variant"
    )
    a = variants.select(F.col("tok").alias("tok_a"), "variant")
    b = variants.select(F.col("tok").alias("tok_b"), "variant")
    pairs = (
        a.join(b, "variant")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .select("tok_a", "tok_b")
        .distinct()
        # r14: the bounded form — levenshtein(l, r, threshold) runs the
        # banded DP (O(len) per pair instead of O(len²)) and returns -1
        # past the bound.  tok_a < tok_b means the strings differ, so a
        # kept pair's distance is exactly 1 — same rows, same `dist`
        # values as the unbounded call the oracle mirrors.
        .withColumn("dist", F.levenshtein("tok_a", "tok_b", 1))
        .filter(F.col("dist").between(0, 1))
    )
    return pairs


# ---------------------------------------------------------------------------
# Incremental LSH index: persist band buckets once, probe new batches
# ---------------------------------------------------------------------------


def lsh_bucket_table(
    signatures: DataFrame, id_col: str = "doc_id", rows_per_band: int = 4
) -> DataFrame:
    """(id, band, bucket) banded-bucket rows — the unit the persisted
    index stores and a probe batch computes for itself."""
    banded = signatures.withColumn(
        "band", F.expr(f"hash_idx div {rows_per_band}")
    )
    return banded.groupBy(id_col, "band").agg(
        F.concat_ws(
            "_",
            F.transform(
                F.array_sort(F.collect_list(F.struct("hash_idx", "minhash"))),
                lambda s: s["minhash"].cast("string"),
            ),
        ).alias("bucket")
    )


def lsh_index_persist(
    signatures: DataFrame,
    path: str,
    id_col: str = "doc_id",
    rows_per_band: int = 4,
) -> None:
    """Materialize the LSH band buckets as a parquet index partitioned
    by band.  Computed ONCE per corpus; daily increments then probe it
    (:func:`lsh_probe_incremental`) without touching corpus text,
    tokens, or signatures again — the O(batch) ingestion path that
    replaces the O(corpus + batch) full recompute.  Partitioning by
    band lets a probe read only the bands it needs (all of them for
    MinHash banding, but partition-sized files keep the join's scan
    parallel and pruned under predicate variants)."""
    buckets = lsh_bucket_table(signatures, id_col, rows_per_band)
    buckets.write.mode("overwrite").partitionBy("band").parquet(path)


def lsh_probe_incremental(
    spark,
    new_signatures: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs of a NEW batch against the persisted
    corpus index plus within the batch itself: (id_a, id_b) distinct,
    id_a < id_b.

    Plan shape: the batch's bucket rows equi-join the index on
    (band, bucket) — batch-sized build side, corpus index only ever
    READ — plus a batch-internal self-join.  Cost scales with the
    batch, not the corpus.  The union of (old index) + (batch buckets)
    is exactly the full-batch bucket table, so probing is equivalent
    to re-running LSH over the union corpus (tested) — no recall loss
    from incrementality.
    """
    idx = spark.read.parquet(index_path).select(
        F.col(id_col).alias("__old__"), "band", "bucket"
    )
    new_b = lsh_bucket_table(new_signatures, id_col, rows_per_band)
    if max_bucket_size is not None:
        # Cap on the UNION bucket size (old + new members), mirroring
        # pairs_from_buckets' df-cut semantics on the union corpus.
        sizes = (
            idx.select("band", "bucket")
            .unionAll(new_b.select("band", "bucket"))
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__bsz__"))
            .filter(F.col("__bsz__") <= max_bucket_size)
            .select("band", "bucket")
        )
        idx = idx.join(sizes, ["band", "bucket"], "left_semi")
        new_b = new_b.join(sizes, ["band", "bucket"], "left_semi")
    cross = (
        new_b.join(idx, ["band", "bucket"])
        .select(
            F.least(F.col(id_col), F.col("__old__")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("__old__")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    a = new_b.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = new_b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    within = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return cross.unionAll(within).distinct()


# ---------------------------------------------------------------------------
# Bucketed LSH index lifecycle: build / O(delta) append / physical delete /
# partition-pruned probe — generation-managed via mbai_gdb_spark.indexgen
# ---------------------------------------------------------------------------


def lsh_partition_bucket(
    band_col: Column, bucket_col: Column, n_buckets: int
) -> Column:
    """Deterministic (band, bucket) → partition-bucket id: pmod of the
    char-polynomial rolling hash over ``band_bucket`` — the same
    engine-portable hashing convention the BM25 layout buckets terms
    with (ops.text._term_bucket).  Partitioning the persisted LSH index
    by this value (instead of by ``band``, the legacy
    :func:`lsh_index_persist` layout) is what makes BOTH maintenance
    and serving sublinear in the index: a document's rows live in at
    most n_bands partition directories, and a probe batch's candidate
    buckets name exactly the directories it must read."""
    key = F.concat_ws("_", band_col.cast("string"), bucket_col)
    return F.pmod(char_poly_id(key), F.lit(n_buckets)).cast("int")


def _write_lsh_meta(spark, path: str, **kw) -> None:
    """The one writer of the bucketed-LSH ``_meta`` side-car: layout
    parameters (n_bands pins the banding scheme; n_buckets the
    partitioning), the replay tag, and the id column's Spark DDL type
    (so an emptied index still probes to a correctly-typed result).
    Its presence marks a COMPLETE layout — every mutation removes it
    first and rewrites it last, the same crash-evidence protocol the
    BM25 layout uses (ops.text._write_bm25_meta)."""
    meta = spark.createDataFrame(
        [
            (
                int(kw["n_bands"]),
                int(kw["n_buckets"]),
                kw.get("last_tag"),
                kw.get("id_type"),
            )
        ],
        "n_bands int, n_buckets int, last_tag string, id_type string",
    )
    meta.coalesce(1).write.mode("overwrite").parquet(path + "/_meta")


def _lsh_meta_field(meta, name: str, default=None):
    return meta[name] if name in meta.__fields__ else default


def _lsh_validate_buckets(
    buckets: DataFrame, id_col: str, expect_bands: int | None
) -> tuple[int, int]:
    """Enforce the structural invariant the delete verification's
    completeness proof rests on: every document carries exactly ONE
    bucket row per band, and every document carries the SAME number of
    bands.  Returns (n_docs, n_bands); (0, 0) for an empty frame."""
    stats = (
        buckets.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.count_distinct(F.col("band")).alias("cb"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("c").alias("lo"),
            F.max("c").alias("hi"),
            F.min((F.col("c") == F.col("cb")).cast("int")).alias("one_per_band"),
        )
        .first()
    )
    n_docs = int(stats["n_docs"] or 0)
    if n_docs == 0:
        return 0, 0
    if stats["lo"] != stats["hi"] or int(stats["one_per_band"]) != 1:
        raise ValueError(
            "bucketed LSH: every document must carry exactly one bucket "
            "row per band and all documents the same band count — the "
            "frame is not a complete banding (mixed rows_per_band or "
            "duplicated ids?)"
        )
    n_bands = int(stats["hi"])
    if expect_bands is not None and n_bands != expect_bands:
        raise ValueError(
            f"bucketed LSH: delta carries {n_bands} bands but the index "
            f"was built with {expect_bands} — banding parameters are "
            "frozen at build time (rebuild to change them)"
        )
    return n_docs, n_bands


def lsh_index_persist_bucketed(
    buckets: DataFrame,
    path: str,
    id_col: str = "doc_id",
    n_buckets: int = 32,
) -> None:
    """Write the LSH banded-bucket index as a parquet layout PARTITIONED
    BY partition-bucket (``pbkt`` = hash(band, bucket) mod n_buckets) —
    the near-dup counterpart of the persisted BM25 layout
    (ops.text.bm25_index_persist), upgrading the legacy band-partitioned
    :func:`lsh_index_persist` to a SERVABLE index with a full lifecycle:

    - a probe batch reads only the partition directories its own
      candidate buckets hash to (partition pruning; at most
      |batch buckets| of n_buckets directories — the legacy layout's
      band partitioning prunes nothing, since every batch touches every
      band);
    - :func:`lsh_index_append_bucketed` is a pure O(delta) insert;
    - :func:`lsh_index_delete_bucketed` rewrites only the ≤ n_bands
      directories a deleted document's rows live in.

    Input is the (id, band, bucket) frame of
    :func:`lsh_buckets_from_signature` / :func:`lsh_bucket_table`.  The
    layout stores NO derived corpus statistics — bucket membership is a
    per-document fact — so appends never rewrite existing files and
    probe results after any mutation sequence are exactly those of a
    rebuild over the surviving corpus (property-tested).  Banding
    parameters are pinned in a ``_meta`` side-car; an empty corpus is
    refused (it would pin no banding scheme to validate deltas
    against)."""
    from mbai_gdb_spark.io import write_partitioned

    spark = buckets.sparkSession
    n_docs, n_bands = _lsh_validate_buckets(buckets, id_col, None)
    if n_docs == 0:
        raise ValueError(
            "lsh_index_persist_bucketed: empty corpus — an empty build "
            "pins no banding scheme; build from at least one document"
        )
    rows = buckets.select(F.col(id_col), "band", "bucket").withColumn(
        "pbkt", lsh_partition_bucket(F.col("band"), F.col("bucket"), n_buckets)
    )
    # sort_cols engages write_partitioned's repartition-by-partition-col
    # path: ONE file per pbkt directory.  Without it, every input
    # partition sprays a file into every directory it touches (up to
    # |input partitions| × n_buckets tiny files per build) — measured in
    # tools/lsh_maintenance_experiment.py as a probe wall that tracked
    # FILE COUNT, not data size.
    write_partitioned(rows, path, ["pbkt"], sort_cols=["band", "bucket"])
    _write_lsh_meta(
        spark,
        path,
        n_bands=n_bands,
        n_buckets=n_buckets,
        last_tag=None,
        id_type=buckets.schema[id_col].dataType.simpleString(),
    )


def lsh_index_append_bucketed(
    new_buckets: DataFrame,
    path: str,
    id_col: str = "doc_id",
    tag: str | None = None,
    full_guard: bool = False,
) -> None:
    """Incrementally merge a NEW batch's bucket rows into a persisted
    :func:`lsh_index_persist_bucketed` layout — O(delta): the merge is
    a pure INSERT of new part files into the ≤ |delta buckets|
    partition directories the batch hashes to; no existing file is
    rewritten (the layout stores no corpus statistics to refresh).
    Probes after the append are exactly those of a rebuild over the
    union corpus (property-tested).

    Appended ids must be NEW (append, not upsert).  The default
    duplicate guard scans only the touched directories — complete for
    exact re-adds (identical text rebands identically, so all of a
    re-added doc's rows live in touched directories); a doc re-added
    with DIFFERENT text rebands to OTHER directories, slips the touched
    scan, and silently breaks the one-row-per-(band, doc) invariant —
    the corruption only surfaces later when a delete/update's
    banding-exactness verification refuses (advice find).  Callers that
    cannot guarantee insert-only deltas pass ``full_guard=True`` to
    check the batch's ids against the WHOLE index (one full id-column
    scan — O(index) but column-pruned to the id column; the touched
    scan stays the O(delta) default for pipelines that own their
    insert-only contract, e.g. the streaming drain's monotone batches).

    ``tag`` gives replay idempotence for exactly-once pipelines, stored
    inside ``_meta`` atomically with the completeness marker (same
    contract as ops.text.bm25_index_append).  Crash evidence: ``_meta``
    is removed before the insert and rewritten after — a failure
    anywhere leaves a layout probes loudly refuse; under a
    generation-managed root (indexgen.lsh_gen_append) a crashed append
    is simply an unpublished generation."""
    import os
    import shutil

    from mbai_gdb_spark.io import check_serving_safe

    check_serving_safe(path)
    spark = new_buckets.sparkSession
    meta = spark.read.parquet(path + "/_meta").first()
    if tag is not None and _lsh_meta_field(meta, "last_tag") == tag:
        return  # replay: this exact merge is already reflected
    n_bands = int(meta["n_bands"])
    n_buckets = int(meta["n_buckets"])
    d_docs, _ = _lsh_validate_buckets(new_buckets, id_col, n_bands)
    if d_docs == 0:
        return  # empty delta: nothing to merge
    delta_rows = _ckpt(
        new_buckets.select(F.col(id_col), "band", "bucket").withColumn(
            "pbkt",
            lsh_partition_bucket(F.col("band"), F.col("bucket"), n_buckets),
        )
    )
    touched = sorted(
        {r["pbkt"] for r in delta_rows.select("pbkt").distinct().collect()}
    )
    # An index whose every row was deleted holds _meta but zero pbkt
    # dirs — nothing to guard against, and read.parquet would fail to
    # infer a schema (underscore side-cars are hidden from the scan).
    has_data = any(n.startswith("pbkt=") for n in os.listdir(path))
    if has_data:
        existing_ids = spark.read.parquet(path)
        if not full_guard:
            existing_ids = existing_ids.filter(F.col("pbkt").isin(touched))
        existing_ids = existing_ids.select(id_col)
        dup = existing_ids.join(
            delta_rows.select(id_col).distinct(), id_col, "leftsemi"
        ).limit(1)
        if dup.count() > 0:
            raise ValueError(
                "lsh_index_append_bucketed: delta contains ids already in "
                "the index — append is insert-only; delete + append (or the "
                "fused update) for changed documents"
            )
    shutil.rmtree(os.path.join(path, "_meta"), ignore_errors=True)
    # One new file per touched directory per append (not |input
    # partitions| × |touched| sprayed fragments — see the build's note);
    # the remaining one-file-per-append debt is gen_compact's job.
    (
        delta_rows.repartition(max(len(touched), 1), F.col("pbkt"))
        .write.mode("append")
        .partitionBy("pbkt")
        .parquet(path)
    )
    _write_lsh_meta(
        spark,
        path,
        n_bands=n_bands,
        n_buckets=n_buckets,
        last_tag=tag,
        id_type=_lsh_meta_field(meta, "id_type"),
    )


def lsh_index_delete_bucketed(
    del_buckets: DataFrame,
    path: str,
    id_col: str = "doc_id",
    tag: str | None = None,
) -> None:
    """Physically DELETE documents from a persisted
    :func:`lsh_index_persist_bucketed` layout — the takedown/dedup-
    verdict path, O(touched directories) instead of a rebuild.

    Delete-by-DOCUMENT: the caller passes the documents' recomputed
    bucket rows (same banding as indexed).  Those rows name exactly the
    ≤ |delta| × n_bands partition directories the documents live in, so
    identification needs no index scan — and the delete is VERIFIED
    before any mutation: within the touched directories, the stored
    rows of the deleted ids must equal the recomputed rows exactly
    (band-for-band, bucket-for-bucket).  Build and append enforce that
    every indexed document carries exactly ``n_bands`` rows, and the
    recomputed delta carries exactly ``n_bands`` rows per id, so a full
    match proves NO row of a deleted document survives outside the
    touched set — the delete is exact, and a document passed with
    different text than indexed (different buckets) refuses loudly
    instead of leaving orphan rows.

    Exactness contract (property-tested): probes after the delete are
    identical to an index built over the corpus without the deleted
    documents.  Crash story: same protocol as the BM25 delete —
    ``_meta`` removed first, a ``_delete_inflight`` sentinel across the
    directory swaps, ``_meta`` rewritten last; under a
    generation-managed root a crashed delete is an unpublished
    generation."""
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe

    check_serving_safe(path)
    spark = del_buckets.sparkSession
    meta = spark.read.parquet(path + "/_meta").first()
    if tag is not None and _lsh_meta_field(meta, "last_tag") == tag:
        return  # replay: this exact delete is already reflected
    n_bands = int(meta["n_bands"])
    n_buckets = int(meta["n_buckets"])
    d_docs, _ = _lsh_validate_buckets(del_buckets, id_col, n_bands)
    if d_docs == 0:
        return  # empty delta: nothing to delete
    delta_rows = _ckpt(
        del_buckets.select(F.col(id_col), "band", "bucket").withColumn(
            "pbkt",
            lsh_partition_bucket(F.col("band"), F.col("bucket"), n_buckets),
        )
    )
    touched = sorted(
        {r["pbkt"] for r in delta_rows.select("pbkt").distinct().collect()}
    )
    has_data = any(n.startswith("pbkt=") for n in os.listdir(path))
    if not has_data:
        raise ValueError(
            "lsh_index_delete_bucketed: index holds no rows — the "
            "delta's documents are not in it"
        )
    stored = (
        spark.read.parquet(path)
        .filter(F.col("pbkt").isin(touched))
        .join(
            F.broadcast(delta_rows.select(id_col).distinct()),
            id_col,
            "leftsemi",
        )
        .select(id_col, "band", F.col("bucket").alias("__sb__"))
    )
    mismatch = (
        stored.join(
            delta_rows.select(id_col, "band", F.col("bucket").alias("__db__")),
            [id_col, "band"],
            "full_outer",
        )
        .filter(
            F.col("__sb__").isNull()
            | F.col("__db__").isNull()
            | (F.col("__sb__") != F.col("__db__"))
        )
        .limit(1)
    )
    if mismatch.count() > 0:
        raise ValueError(
            "lsh_index_delete_bucketed: delta does not match the indexed "
            "documents exactly (band/bucket mismatch) — delete-by-"
            "document requires the documents' EXACT indexed banding; a "
            "doc absent from the index, or passed with different text, "
            "refuses loudly instead of leaving orphan rows"
        )
    # Materialize the filtered survivors BEFORE mutating anything.
    staging = os.path.join(path, "_delete_staging")
    keep = (
        spark.read.parquet(path)
        .filter(F.col("pbkt").isin(touched))
        .join(
            F.broadcast(delta_rows.select(id_col).distinct()),
            id_col,
            "left_anti",
        )
    )
    (
        keep.repartition(max(len(touched), 1), F.col("pbkt"))
        .write.mode("overwrite")
        .partitionBy("pbkt")
        .parquet(staging)
    )
    shutil.rmtree(os.path.join(path, "_meta"), ignore_errors=True)
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for b in touched:
        src = os.path.join(staging, f"pbkt={b}")
        dst = os.path.join(path, f"pbkt={b}")
        aside = os.path.join(path, f"_compact_old_pbkt={b}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: filtered replacement in
        # A directory whose every row belonged to deleted docs has no
        # staged dir: it simply goes away (probes tolerate missing dirs).
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)
    _write_lsh_meta(
        spark,
        path,
        n_bands=n_bands,
        n_buckets=n_buckets,
        last_tag=tag,
        id_type=_lsh_meta_field(meta, "id_type"),
    )


def lsh_probe_bucketed(
    spark,
    probe_buckets: DataFrame,
    path: str,
    id_col: str = "doc_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs of a NEW batch against a persisted
    :func:`lsh_index_persist_bucketed` layout, plus within the batch
    itself: (id_a, id_b) distinct, id_a < id_b — the serving-path
    sibling of :func:`lsh_probe_incremental`, but PARTITION-PRUNED: the
    batch's own bucket rows name the ≤ |batch buckets| directories that
    can possibly hold a collision, and only those are read (the pruned
    directory list is a bounded driver scalar ≤ n_buckets, folded into
    the scan as a partition filter — unprobed directories are never
    touched, the same physical standard the BM25 and IVF probes meet).

    ``max_bucket_size`` caps pair generation on the UNION bucket size
    (index + batch members), mirroring pairs_from_buckets' df-cut on
    the union corpus — so incrementality loses no precision against a
    full-corpus LSH run restricted to batch-touching pairs (tested).
    An index whose every row was deleted probes to the typed empty
    result (id types from ``_meta``)."""
    import os

    from mbai_gdb_spark.io import check_serving_safe

    check_serving_safe(path)
    meta = spark.read.parquet(path + "/_meta").first()
    n_bands = int(meta["n_bands"])
    n_buckets = int(meta["n_buckets"])
    _lsh_validate_buckets(probe_buckets, id_col, n_bands)
    batch = _ckpt(
        probe_buckets.select(F.col(id_col), "band", "bucket").withColumn(
            "pbkt",
            lsh_partition_bucket(F.col("band"), F.col("bucket"), n_buckets),
        )
    )
    id_ddl = _lsh_meta_field(meta, "id_type") or "bigint"
    if not any(n.startswith("pbkt=") for n in os.listdir(path)):
        idx = spark.createDataFrame(
            [], f"`__old__` {id_ddl}, band int, bucket string"
        )
    else:
        pbkts = sorted(
            {r["pbkt"] for r in batch.select("pbkt").distinct().collect()}
        )
        idx = (
            spark.read.parquet(path)
            .filter(F.col("pbkt").isin(pbkts))
            .select(F.col(id_col).alias("__old__"), "band", "bucket")
        )
    new_b = batch.select(id_col, "band", "bucket")
    if max_bucket_size is not None:
        sizes = (
            idx.select("band", "bucket")
            .unionAll(new_b.select("band", "bucket"))
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__bsz__"))
            .filter(F.col("__bsz__") <= max_bucket_size)
            .select("band", "bucket")
        )
        idx = idx.join(sizes, ["band", "bucket"], "left_semi")
        new_b = new_b.join(sizes, ["band", "bucket"], "left_semi")
    cross = (
        new_b.join(idx, ["band", "bucket"])
        .select(
            F.least(F.col(id_col), F.col("__old__")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("__old__")).alias("id_b"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    a = new_b.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = new_b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    within = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )
    return cross.unionAll(within).distinct()


def lsh_index_update_bucketed(
    old_buckets: DataFrame,
    new_buckets: DataFrame,
    path: str,
    id_col: str = "doc_id",
    tag: str | None = None,
) -> None:
    """FUSED in-place update of documents in a persisted
    :func:`lsh_index_persist_bucketed` layout: semantically delete(old
    banding) + append(new banding), executed as ONE mutation — each
    touched partition directory is rewritten exactly once with
    (survivors ∪ the new bucket rows), and ``_meta`` commits once.
    Under a generation-managed root (indexgen.lsh_gen_update) that is
    ONE published generation per update.

    Contract: ``old_buckets`` is the documents' EXACT indexed banding
    (verified stored-vs-recomputed before any mutation, the delete's
    proof), ``new_buckets`` the SAME id set rebanded from the new text
    (id-set equality enforced; membership changes go through append /
    delete).  Exactness (property-tested): probes after the update are
    identical to an index built over the corpus with the new texts, and
    to delete(old)+append(new)."""
    import os
    import shutil

    from mbai_gdb_spark.io import DELETE_SENTINEL, check_serving_safe

    check_serving_safe(path)
    spark = old_buckets.sparkSession
    meta = spark.read.parquet(path + "/_meta").first()
    if tag is not None and _lsh_meta_field(meta, "last_tag") == tag:
        return  # replay: this exact update is already reflected
    n_bands = int(meta["n_bands"])
    n_buckets = int(meta["n_buckets"])
    u_docs, _ = _lsh_validate_buckets(old_buckets, id_col, n_bands)
    if u_docs == 0:
        return  # empty update set: nothing to do
    _lsh_validate_buckets(new_buckets, id_col, n_bands)
    id_mismatch = (
        old_buckets.select(F.col(id_col).alias("__o__"))
        .distinct()
        .join(
            new_buckets.select(F.col(id_col).alias("__n__")).distinct(),
            F.col("__o__") == F.col("__n__"),
            "full_outer",
        )
        .filter(F.col("__o__").isNull() | F.col("__n__").isNull())
        .limit(1)
    )
    if id_mismatch.count() > 0:
        raise ValueError(
            "lsh_index_update_bucketed: old_buckets and new_buckets must "
            "carry the SAME id set (update, not upsert) — use append / "
            "delete for membership changes"
        )
    old_rows = _ckpt(
        old_buckets.select(F.col(id_col), "band", "bucket").withColumn(
            "pbkt",
            lsh_partition_bucket(F.col("band"), F.col("bucket"), n_buckets),
        )
    )
    new_rows = _ckpt(
        new_buckets.select(F.col(id_col), "band", "bucket").withColumn(
            "pbkt",
            lsh_partition_bucket(F.col("band"), F.col("bucket"), n_buckets),
        )
    )
    touched = sorted(
        {
            r["pbkt"]
            for r in old_rows.select("pbkt")
            .unionAll(new_rows.select("pbkt"))
            .distinct()
            .collect()
        }
    )
    has_data = any(n.startswith("pbkt=") for n in os.listdir(path))
    if not has_data:
        raise ValueError(
            "lsh_index_update_bucketed: index holds no rows — the "
            "update's documents are not in it"
        )
    stored = (
        spark.read.parquet(path)
        .filter(F.col("pbkt").isin(touched))
        .join(
            F.broadcast(old_rows.select(id_col).distinct()),
            id_col,
            "leftsemi",
        )
        .select(id_col, "band", F.col("bucket").alias("__sb__"))
    )
    mismatch = (
        stored.join(
            old_rows.select(id_col, "band", F.col("bucket").alias("__db__")),
            [id_col, "band"],
            "full_outer",
        )
        .filter(
            F.col("__sb__").isNull()
            | F.col("__db__").isNull()
            | (F.col("__sb__") != F.col("__db__"))
        )
        .limit(1)
    )
    if mismatch.count() > 0:
        raise ValueError(
            "lsh_index_update_bucketed: old_buckets does not match the "
            "indexed banding exactly — the update requires the EXACT "
            "indexed banding as its old side; refusing loudly instead "
            "of leaving orphan rows"
        )
    staging = os.path.join(path, "_delete_staging")
    survivors = (
        spark.read.parquet(path)
        .filter(F.col("pbkt").isin(touched))
        .join(
            F.broadcast(old_rows.select(id_col).distinct()),
            id_col,
            "left_anti",
        )
        .select(id_col, "band", "bucket", "pbkt")
    )
    (
        survivors.unionAll(new_rows.select(id_col, "band", "bucket", "pbkt"))
        .repartition(max(len(touched), 1), F.col("pbkt"))
        .write.mode("overwrite")
        .partitionBy("pbkt")
        .parquet(staging)
    )
    shutil.rmtree(os.path.join(path, "_meta"), ignore_errors=True)
    sentinel = os.path.join(path, DELETE_SENTINEL)
    with open(sentinel, "w"):
        pass
    for b in touched:
        src = os.path.join(staging, f"pbkt={b}")
        dst = os.path.join(path, f"pbkt={b}")
        aside = os.path.join(path, f"_compact_old_pbkt={b}")
        shutil.rmtree(aside, ignore_errors=True)
        if os.path.isdir(dst):
            os.replace(dst, aside)  # atomic: old bytes preserved, hidden
        if os.path.isdir(src):
            os.replace(src, dst)  # atomic: rewritten replacement in
        shutil.rmtree(aside, ignore_errors=True)
    shutil.rmtree(staging, ignore_errors=True)
    os.remove(sentinel)
    _write_lsh_meta(
        spark,
        path,
        n_bands=n_bands,
        n_buckets=n_buckets,
        last_tag=tag,
        id_type=_lsh_meta_field(meta, "id_type"),
    )
