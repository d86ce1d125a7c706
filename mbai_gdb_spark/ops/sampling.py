"""Deterministic hash-based sampling for data mixing.

Training-corpus construction samples sources at different rates (domain
mixing, language balancing, quality tiers).  ``df.sample()`` is
seed-dependent per partitioning and not reproducible across engines or
re-partitions; hashing a stable key instead gives a sample that is (a) a
pure filter — map-only, pushdown-friendly, no shuffle, (b) consistent
across runs, engines, and joins (the same key is always in or out — so
sampled tables stay joinable), and (c) exactly expressible in the DuckDB
oracle.

Thresholds are integers (``rate * mod`` rounded once, driver-side), so
membership is pure integer comparison — no float boundary ambiguity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mbai_gdb_spark.ops.sketch import lcg_hash


def hash_bucket(key: Column, mod: int = 10_000) -> Column:
    """Stable bucket in [0, mod) from a NUMERIC key (casts to long)."""
    return lcg_hash(key) % mod


_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _key_bucket(df: DataFrame, key_col: str, mod: int) -> Column:
    """Dtype-aware stable bucket: integer keys go straight through the
    LCG; string keys are first reduced by the cross-engine char-poly
    hash.  Anything else raises — lcg_hash's ``cast('long')`` on e.g. a
    string silently yields NULL, which would mislabel every row instead
    of failing loudly."""
    dt = df.schema[key_col].dataType
    if isinstance(dt, _NUMERIC):
        return hash_bucket(F.col(key_col), mod)
    if isinstance(dt, T.StringType):
        from mbai_gdb_spark.ops.dedup import char_poly_id

        return lcg_hash(char_poly_id(key_col)) % mod
    raise TypeError(
        f"hash sampling key {key_col!r} has unsupported type {dt}; "
        "use an integer or string key"
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    mod: int = 10_000,
) -> DataFrame:
    """Keep each row iff ``hash(key) % mod < rate(stratum) * mod``.

    Adds ``sample_weight`` = 1/rate (Horvitz-Thompson inverse-inclusion
    weight) so downstream aggregates can stay unbiased.  Strata with
    rate 0 are dropped entirely; rate 1 passes everything at weight 1.
    """
    thresholds = {s: int(round(r * mod)) for s, r in rates.items()}
    default_threshold = int(round(default_rate * mod))
    thr: Column = F.lit(default_threshold)
    for s, t in sorted(thresholds.items()):
        thr = F.when(F.col(stratum_col) == s, F.lit(t)).otherwise(thr)
    bucket = _key_bucket(df, key_col, mod)
    return (
        df.withColumn("__thr__", thr)
        .filter(bucket < F.col("__thr__"))
        .withColumn(
            "sample_weight", F.lit(float(mod)) / F.col("__thr__").cast("double")
        )
        .drop("__thr__")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    fractions: dict[str, float],
    mod: int = 10_000,
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split: the hash bucket of the stable
    key falls into consecutive integer ranges sized by ``fractions``
    (which must sum to 1).  Pure map-side labelling — the same key lands
    in the same split across runs, engines, and re-partitionings, so a
    corpus can be re-processed without test-set leakage.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    for name, frac in fractions.items():  # dict order = caller's order
        acc += frac
        bounds.append((name, int(round(acc * mod))))
    bounds[-1] = (bounds[-1][0], mod)  # close the last range exactly
    bucket = _key_bucket(df, key_col, mod)
    # Nested when-chain over ascending upper bounds: the innermost
    # (last) range is the fallback.
    expr: Column = F.lit(bounds[-1][0])
    for name, ub in reversed(bounds[:-1]):
        expr = F.when(bucket < ub, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture weights per group — the ``p^alpha``
    domain/language re-balancing rule for training-corpus construction
    (alpha=1 keeps natural proportions, alpha→0 approaches uniform).

    Output per group: (group, n_docs, raw_share, mix_weight,
    expected_docs) where mix_weight ∝ n_docs^alpha normalized to sum 1
    and expected_docs = mix_weight * total_docs is the per-group quota a
    sampler (e.g. :func:`stratified_hash_sample` thresholds) should draw.

    Scale shape: one partial+final count on the group key reduces the
    corpus to #groups rows; the normalizing constants fold over a SORTED
    collected array (deterministic summation order — the engine-
    reproducibility convention for float accumulation), which is fine
    precisely because the domain of ``group_col`` is small by definition.
    The corpus itself is touched once, map-side."""
    if alpha == 0.5:
        powed = lambda x: F.sqrt(x.cast("double"))  # noqa: E731 — sqrt is
        # bit-reproducible across engines; pow(x, 0.5) need not be
    else:
        powed = lambda x: F.pow(x.cast("double"), F.lit(alpha))  # noqa: E731
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    packed = counts.agg(
        F.sort_array(F.collect_list(F.struct(group_col, "n_docs"))).alias("__arr__")
    ).select(
        "__arr__",
        F.aggregate(
            F.transform("__arr__", lambda s: s["n_docs"]),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("__total__"),
        F.aggregate(
            F.transform("__arr__", lambda s: powed(s["n_docs"])),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__zsum__"),
    )
    s = F.col("__s__")
    return packed.select(
        F.explode("__arr__").alias("__s__"), "__total__", "__zsum__"
    ).select(
        s[group_col].alias(group_col),
        s["n_docs"].alias("n_docs"),
        (s["n_docs"].cast("double") / F.col("__total__")).alias("raw_share"),
        (powed(s["n_docs"]) / F.col("__zsum__")).alias("mix_weight"),
        (powed(s["n_docs"]) / F.col("__zsum__") * F.col("__total__")).alias(
            "expected_docs"
        ),
    )


def deterministic_shuffle(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Reproducible global shuffle + sharding for training-data export.

    Training runs need the corpus in a pseudo-random order that is (a)
    decoupled from ingestion order, (b) identical across re-runs,
    engines, and input partitionings, and (c) writable as S independent
    shard files.  ``df.orderBy(rand(seed))`` fails (b) — Spark's rand is
    partitioning-dependent — and a single global sort fails (c)'s
    parallelism.  Instead the stable key is LCG-hashed with the seed
    folded in; the hash IS the shuffle order:

        shard = hash % n_shards        (which shard file)
        pos   = rank of (hash, key) within the shard   (order inside it)

    Scale shape: one hash projection (map-only) + one shuffle on
    ``shard`` + a per-shard sort — each shard sorts its own N/S rows
    independently, so the global sort never exists.  Pick n_shards ≥
    cluster parallelism; consumers read shards in any order and rows
    within a shard in ``pos`` order.  Different ``seed`` → a completely
    different permutation (epoch re-shuffling without rewriting data:
    export positions per epoch, or just re-derive them).

    The whole construction is plain integer SQL, so an external oracle
    can re-derive the exact permutation — the reproducibility contract
    training pipelines audit against."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql import Window

    h = lcg_hash(F.col(key_col) + F.lit(int(seed)))
    out = df.withColumn("__h__", h).withColumn(
        shard_col, (F.col("__h__") % n_shards).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("__h__"), F.col(key_col))
    return out.withColumn(pos_col, F.row_number().over(w).cast("int")).drop("__h__")


def negative_samples(
    positives: DataFrame,
    corpus_ids: DataFrame,
    anchor_col: str,
    item_col: str,
    n_corpus: int,
    k: int = 4,
    seed: int = 0,
    mod: int = 2_147_483_647,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for every (anchor, positive item) row, ``k`` pseudo-random corpus
    items — (anchor, neg_item, neg_rank) — excluding accidental
    positives.

    Candidate ids come from an LCG over (anchor, positive, j, seed), so
    the draw is map-only, partitioning-independent, and re-derivable by
    any engine (no rand(), which is partitioning-dependent in Spark).
    Accidental hits (a drawn id that IS a positive of that anchor, or
    the anchor itself) are removed by a filter + left-anti join against
    the positive set — the standard
    correction; with k small and positives sparse the removal rate is
    ~|pos|/|corpus| and training treats the variable negative count as
    acceptable (re-drawing would need data-dependent iteration).

    Assumes corpus ids are dense 0..n_corpus-1 (the fixtures' layout;
    for sparse id spaces join ``corpus_ids`` by row-number first).
    ``corpus_ids`` is accepted for that generalization but unused in
    the dense fast path.
    """
    a = F.col(anchor_col).cast("long")
    p = F.col(item_col).cast("long")
    draws = positives.select(
        anchor_col,
        item_col,
        F.explode(
            F.array(
                *[
                    (
                        ((a * 1_000_003 + p) % mod * 48271 + 7919 * j + seed + 11)
                        % mod
                        % n_corpus
                    ).alias(f"d{j}")
                    for j in range(k)
                ]
            )
        ).alias("neg_item"),
    )
    pos_set = positives.select(
        F.col(anchor_col), F.col(item_col).alias("neg_item")
    ).distinct()
    from pyspark.sql import Window as W

    cleaned = draws.filter(F.col("neg_item") != a).join(
        pos_set, [anchor_col, "neg_item"], "left_anti"
    )
    w = W.partitionBy(anchor_col, item_col).orderBy("neg_item")
    return (
        cleaned.select(anchor_col, item_col, "neg_item")
        .distinct()
        .withColumn("neg_rank", F.row_number().over(w))
    )
