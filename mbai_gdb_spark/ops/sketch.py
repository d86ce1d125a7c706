"""Mergeable sketch operators: KMV (k-minimum-values) distinct counting.

Training-data pipelines need cardinality estimates (distinct users,
distinct n-grams, vocabulary growth) at sizes where exact COUNT(DISTINCT)
is a full shuffle of every distinct value.  Spark's built-in
``approx_count_distinct`` (HyperLogLog++) is the production default, but
its sketch bytes are engine-specific and can't be checked against another
engine.  KMV with a deterministic integer LCG hash gives the same
statistical idea (estimate = (k-1) * M / kth_smallest_hash) while being
bit-for-bit reproducible in plain SQL — so the oracle gate can hold the
sketch to exact equality, not a tolerance.

Scale shape: the k smallest hashes per group are computed in two
levels — a rank window per (group, hash-shard) whose external sort
keeps task memory bounded however many distinct values a shard holds,
then a k-bounded merge over ≤ k survivors per shard — so no global
per-group sort and no unbounded aggregation buffers anywhere.  Shards
partition the hash space, so per-shard distinct counts add up exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MERSENNE31 = 2_147_483_647


def lcg_hash(col: Column, mult: int = 2654435761, add: int = 97, mod: int = MERSENNE31) -> Column:
    """Deterministic integer hash ``((x % mod) * mult + add) % mod``.

    The pre-reduction keeps the product under 2^63 (ANSI-safe) and the
    whole expression is plain integer SQL on any engine.
    """
    return ((col.cast("long") % mod) * mult + add) % mod


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
    n_shards: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate via the k smallest hash values.

    Output: group cols + ``n_distinct_hashed`` (exact distinct count of
    hashes — equals the true distinct count up to LCG collisions, and is
    identical across engines) + ``kmv_estimate`` (double; equals the
    exact count when the group has fewer than ``k`` distinct values).
    """
    from pyspark.sql import Window as W
    from pyspark.sql import types as T

    dt = df.schema[value_col].dataType
    if isinstance(dt, T.StringType):
        # cast('long') on a string is NULL (not an error) — reduce string
        # values through the cross-engine char-poly hash first.
        from mbai_gdb_spark.ops.dedup import char_poly_id

        hv = lcg_hash(char_poly_id(value_col))
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        hv = lcg_hash(F.col(value_col))
    else:
        raise TypeError(
            f"kmv value column {value_col!r} has unsupported type {dt}; "
            "use an integer or string column"
        )
    hashes = df.select(*group_cols, hv.alias("__hv__")).distinct()
    sharded = hashes.withColumn("__shard__", F.col("__hv__") % n_shards)
    # Per-(group, shard) k-min via a rank window, NOT collect_list: the
    # window sort is external (spills), so task memory stays bounded no
    # matter how many distinct values a shard holds; only ≤ k rows per
    # (group, shard) survive into the merge.  The shard count per group
    # rides along in the same pass via a count window.
    shard_w = W.partitionBy(*group_cols, "__shard__")
    ranked = sharded.select(
        *group_cols,
        "__hv__",
        F.row_number().over(shard_w.orderBy("__hv__")).alias("__rn__"),
        F.count(F.lit(1)).over(shard_w).alias("__sn__"),
    ).filter(F.col("__rn__") <= k)
    merged = ranked.groupBy(*group_cols).agg(
        F.slice(F.sort_array(F.collect_list("__hv__")), 1, k).alias("__mins__"),
        F.sum(F.when(F.col("__rn__") == 1, F.col("__sn__"))).alias(
            "n_distinct_hashed"
        ),
    )
    kth = F.get("__mins__", k - 1)  # 0-based, null-safe (no ANSI OOB error)
    est = F.when(
        F.col("n_distinct_hashed") >= k,
        F.lit(float(k - 1) * float(MERSENNE31)) / kth,
    ).otherwise(F.col("n_distinct_hashed").cast("double"))
    return merged.select(
        *group_cols, "n_distinct_hashed", est.alias("kmv_estimate")
    )


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation
# ---------------------------------------------------------------------------


def cms_hash(col: Column, row: Column | int, width: int) -> Column:
    """Bucket of ``col`` in sketch row ``row``: the same SQL-expressible
    LCG family as the MinHash permutations, reduced mod width."""
    r = F.lit(row) if isinstance(row, int) else row
    inner = ((col.cast("long") % MERSENNE31) * (2 * r + 1) * 48271 + 7919 * r + 13) % MERSENNE31
    return inner % F.lit(width)


def count_min_sketch(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Build a (depth × width) count-min table over ``value_col``
    occurrences: one explode to depth rows per observation, one groupBy
    (row, bucket).  The table has at most depth*width rows regardless of
    input size — THE mergeable-frequency shape for 100 TB streams (union
    two sketches by summing matching cells).  Like KMV, the hash family
    is plain integer SQL, so an external engine can rebuild the exact
    same table."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("sk_row")
    return (
        df.select(F.col(value_col).alias("__v__"), rows)
        .select("sk_row", cms_hash(F.col("__v__"), F.col("sk_row"), width).alias("bucket"))
        .groupBy("sk_row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-frequency estimates: min over the depth rows of the queried
    cells (classic CMS guarantee: estimate ≥ true count, with the excess
    bounded by collisions).  The query side explodes to depth probes and
    equi-joins the sketch — the sketch side is tiny (≤ depth*width) and
    broadcasts."""
    rows = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("sk_row")
    probes = queries.select(
        F.col(value_col), rows
    ).withColumn("bucket", cms_hash(F.col(value_col), F.col("sk_row"), width))
    return (
        probes.join(F.broadcast(sketch), ["sk_row", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_count"))
    )


def decimal_hist_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable quantile sketch: a DDSketch-style log-histogram whose
    buckets are the DECIMAL mantissa of the (positive integer) value —
    bucket = (#digits, first two digits) — so the whole sketch is exact
    integer/string arithmetic any engine reproduces bit-for-bit (no
    float log2 whose rounding at bucket boundaries diverges across
    engines).  Relative error of the quantile estimate is bounded by
    the bucket width: ≤ 10% for values ≥ 10 (two-digit mantissa), and
    EXACT for values < 10 (each integer is its own bucket).

    Output per group: n_values plus one ``p{q}_est`` column per
    requested quantile — the UPPER bound of the first bucket whose
    cumulative count reaches ``ceil(q*n)`` (both engines evaluate the
    identical IEEE product, so the threshold is deterministic).

    Scale shape: one partial+final count on (group, bucket) reduces the
    data to ≤ ~9+90·digits buckets per group — the sketch a 1000-way
    partial aggregation merges by ADDING bucket counts, which is the
    mergeability contract (same reason KMV/CMS live here).  The window
    pass after it runs on sketch-sized data only.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    s = v.cast("string")
    digits = F.length(s)
    lead2 = F.when(digits == 1, v).otherwise(F.substring(s, 1, 2).cast("long"))
    bucket_hi = F.when(digits == 1, v).otherwise(
        (lead2 + 1) * F.pow(F.lit(10.0), (digits - 2).cast("double")).cast("long") - 1
    )
    counts = (
        df.where(v >= 1)
        .groupBy(*group_cols, bucket_hi.alias("__hi__"))
        .agg(F.count(F.lit(1)).alias("__c__"))
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("__hi__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("__cum__", F.sum("__c__").over(w)).withColumn(
        "__n__", F.sum("__c__").over(Window.partitionBy(*group_cols))
    )
    aggs = [F.max("__n__").alias("n_values")]
    for q in qs:
        thr = F.ceil(F.lit(q) * F.col("__n__")).cast("long")
        name = f"p{int(round(q * 100))}_est"
        aggs.append(
            F.min(F.when(F.col("__cum__") >= thr, F.col("__hi__"))).alias(name)
        )
    return cum.groupBy(*group_cols).agg(*aggs)


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int | None = None,
    depth: int = 4,
    width: int = 512,
    payload_cols: list[str] | None = None,
    threshold_fn=None,
) -> DataFrame:
    """EXACT counts of values occurring >= ``threshold`` times, without
    ever shuffling the long tail: (value, n_occurrences).

    The classic two-pass frequent-items shape:

    1. build the bounded count-min table (:func:`count_min_sketch` —
       map-side partials, <= depth*width rows however large the input)
       and collect it: the mergeable-sketch contract is precisely that
       the table fits anywhere, so this is a bounded driver collect
       (<= 2048 longs at the defaults), inlined back as a dense array
       literal;
    2. filter every input row MAP-SIDE by its CMS estimate — expressed
       as depth static InSet probes against the heavy-bucket sets of
       each sketch row (no join, no input-side shuffle) — dropping
       rows whose estimate is already < threshold.  CMS only
       overestimates, so no true heavy hitter is lost here; only the
       tail is.
    3. exact groupBy over the survivors (the data volume is now
       ~(#heavy values + CMS false positives) * threshold, not the raw
       input), then the exact HAVING filter.

    The output is therefore byte-identical to ``GROUP BY value HAVING
    COUNT(*) >= threshold`` — the sketch is purely a performance
    structure, which is why the oracle can be plain SQL.  At 100 TB
    the win is that step 3's shuffle carries only heavy keys: the
    zipfian tail (the overwhelming majority of distinct values) dies
    map-side in step 2.

    ``payload_cols``: extra columns carried alongside ``value_col``
    (e.g. the human-readable token when ``value_col`` is its hash);
    they must be functionally dependent on the value.

    Relative thresholds come free: each sketch row sums to the exact
    input count n, so ``threshold_fn`` (n -> threshold) derives e.g.
    "n // 40" from the already-collected sketch without a separate
    COUNT pass — the whole operator reads the input exactly twice.
    Pass exactly one of ``threshold`` / ``threshold_fn``.
    """
    if (threshold is None) == (threshold_fn is None):
        raise ValueError("pass exactly one of threshold / threshold_fn")
    payload_cols = payload_cols or []
    table = [0] * (depth * width)
    n = 0
    for r in count_min_sketch(df, value_col, depth, width).collect():
        table[r.sk_row * width + r.bucket] = r.cnt
        if r.sk_row == 0:
            n += r.cnt
    if threshold_fn is not None:
        threshold = threshold_fn(n)
    cur = df.select(F.col(value_col).alias("__v__"), *payload_cols)
    # min_j cnt_j >= t  <=>  for all j: bucket_j is a heavy bucket of
    # sketch row j.  The per-row heavy-bucket sets are tiny (~n/t plus
    # collisions), so the whole estimate-filter compiles to depth
    # static InSet probes — no per-row table materialization (an
    # element_at over a 2048-literal array re-built the array every
    # row: measured 4.8 us/row; InSet is ~0).
    est_ge_t = F.lit(True)
    for j in range(depth):
        heavy = [b for b in range(width) if table[j * width + b] >= threshold]
        est_ge_t = est_ge_t & cms_hash(F.col("__v__"), j, width).isin(heavy)
    return (
        cur.filter(est_ge_t)
        .groupBy("__v__", *payload_cols)
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= threshold)
        .select(F.col("__v__").alias(value_col), *payload_cols, "n_occurrences")
    )


# ---------------------------------------------------------------------------
# HyperLogLog: register-exact, cross-engine-reproducible
# ---------------------------------------------------------------------------


def _mul32(h: Column, c: int) -> Column:
    """``(h * c) mod 2^32`` without signed-64-bit overflow: split ``h``
    into 16-bit halves so every intermediate stays under 2^49."""
    lo = (h % 65536) * c
    hi = (F.floor(h / 65536).cast("long") * c % 65536) * 65536
    return (lo + hi) % 4294967296


def fmix32_col(x: Column) -> Column:
    """Murmur3 fmix32 finalizer, bit-exact, from overflow-safe integer
    primitives (``%``, ``//`` via floor-divide, ``xor``) that Spark and
    DuckDB evaluate identically — full avalanche, unlike the LCG, so
    leading-zero statistics (HLL's ``rho``) are unbiased even on
    structured inputs.  Input is pmod-reduced to [0, 2^32)."""
    h = F.pmod(x.cast("long"), F.lit(4294967296))
    h = h.bitwiseXOR(F.floor(h / 65536).cast("long"))
    h = _mul32(h, 0x85EBCA6B)
    h = h.bitwiseXOR(F.floor(h / 8192).cast("long"))
    h = _mul32(h, 0xC2B2AE35)
    return h.bitwiseXOR(F.floor(h / 65536).cast("long"))


def hll_alpha(m: int) -> float:
    """Flajolet et al. 2007 bias constant for m >= 64 registers."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """Per-group HyperLogLog distinct-count estimate with a register
    state that is BIT-IDENTICAL across engines.

    Spark's approx_count_distinct is HLL++ with engine-private sketch
    bytes; like :func:`kmv_distinct`, this variant trades its bias
    corrections for reproducibility.  Unlike KMV (which only needs the
    hash to be equidistributed — an LCG suffices), HLL reads the
    BIT-PATTERN of the hash, and an LCG's lattice structure on
    arithmetic-progression inputs biases the leading-zero ranks
    (measured +84% on a stride-7 id column).  The hash here is
    therefore a faithful murmur3 fmix32 finalizer (:func:`fmix32_col`)
    built from overflow-safe ``%``/``//``/``xor`` primitives both
    engines execute identically; the 32-bit hash splits into a
    register index (``h % m``) and a suffix whose leading-zero rank is
    ``bitlen(h // m)`` via the ``bin()`` string both Spark and DuckDB
    expose, so an external oracle recomputes every register exactly.

    Determinism of the float columns: each register term ``2^-M`` is an
    exact power of two with ``M <= bitbudget+1 <= 27`` and there are at
    most ``m`` terms, so the harmonic sum is exact in float64 in ANY
    addition order — safe to value-hash, no Kahan or fixed-point dance
    needed.  ``harmonic_scaled = Z * 2^(bitbudget+1)`` is emitted as
    the integer proof of that exactness.

    Scale shape: one partial-aggregating shuffle on (group, register)
    — at most ``m`` rows per group survive the map side — then an
    ``m``-bounded rollup per group.  Register states merge by MAX, so
    the sketch is also a valid streaming/mergeable accumulator.
    """
    return hll_finalize(
        hll_registers(df, group_cols, value_col, m), group_cols, m
    )


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    m: int = 64,
) -> DataFrame:
    """The mergeable HLL state: (group cols, __reg__, __m__ = max rho).
    Register states merge by MAX, so this works unchanged as a
    STREAMING aggregation (update mode) — see streaming.sketches —
    and sketches from different partitions/days union + re-max."""
    if m & (m - 1) or m < 64:
        raise ValueError("m must be a power of two >= 64")
    from pyspark.sql import types as T

    dt = df.schema[value_col].dataType
    if isinstance(dt, T.StringType):
        from mbai_gdb_spark.ops.dedup import char_poly_id

        hv = fmix32_col(char_poly_id(value_col))
    else:
        hv = fmix32_col(F.col(value_col))
    # hash range [0, 2^32); suffix h // m fits in bitbudget bits
    bitbudget = 32 - (m.bit_length() - 1)  # 32 - log2(m)
    suffix = F.floor(hv / m).cast("long")
    rho = F.when(suffix == 0, F.lit(bitbudget + 1)).otherwise(
        F.lit(bitbudget) - F.length(F.bin(suffix)) + 1
    )
    return (
        df.select(*group_cols, (hv % m).alias("__reg__"), rho.alias("__rho__"))
        .groupBy(*group_cols, "__reg__")
        .agg(F.max("__rho__").alias("__m__"))
    )


def hll_finalize(
    regs: DataFrame, group_cols: list[str], m: int = 64
) -> DataFrame:
    """Collapse an HLL register table to per-group estimates (see
    :func:`hll_distinct` for the exactness argument)."""
    bitbudget = 32 - (m.bit_length() - 1)
    z_set = F.sum(F.pow(F.lit(2.0), -F.col("__m__")))
    n_set = F.count(F.lit(1))
    z = z_set + (F.lit(m) - n_set).cast("double")
    alpha = hll_alpha(m)
    return regs.groupBy(*group_cols).agg(
        n_set.alias("n_registers_set"),
        (z * F.lit(float(1 << (bitbudget + 1)))).cast("long").alias(
            "harmonic_scaled"
        ),
        (F.lit(alpha * m * m) / z).alias("hll_estimate"),
    )
