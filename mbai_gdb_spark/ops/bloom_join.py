"""Bloom-pruned joins: cut the probe-side shuffle before it happens.

At 100 TB the dominant cost of a selective fact⋈dim join is shuffling
fact rows that will never match.  Spark already attacks this two ways
— DPP for partition columns, and (3.3+, ON by default here) the
runtime Bloom filter the optimizer injects into shuffle joins when the
creation side is ≤ ``runtime.bloomFilter.creationSideThreshold`` and
the probe SCAN is ≥ 10 GB.  This module covers what those can't:

* **anti joins** — a runtime filter cannot help ``left_anti`` (rows
  failing the filter must be KEPT, not dropped); the
  :func:`bloom_pruned_join` rewrite routes definite misses AROUND the
  join entirely, which no optimizer rule does;
* **sub-threshold probes** — in-memory/intermediate frames and scans
  below the 10 GB application threshold never get the injected filter;
* **explicit control** — deterministic hash family shared with the
  decontamination module, reproducible in plain SQL for oracles.

Honest cost model (measured, tools/bloomjoin_scale_experiment.py): if
the plain join is a BroadcastHashJoin, the probe never shuffles and
ANY extra predicate is overhead — don't use this there.  The
:func:`bloom_membership_vectorized` path additionally pays one Arrow
round-trip of the probe; at local[32] that exceeds an in-memory
shuffle, so it pays off only where the shuffle crosses a network and
probes come from disk.  Mechanics of the exact rewrite:

1. build a packed Bloom bitmap of the build side's keys (one
   hash-groupBy with a map-side ``bit_or`` partial —
   :func:`ops.decontam.bloom_bitmap`'s layout and LCG hash family);
2. collect it to the driver (``m_bits/32`` longs — a bounded artifact
   like a PQ codebook, 16 KB at the default 2^17 bits) and inline it as
   an ARRAY LITERAL, so the probe-side membership test is pure
   whole-stage-codegen column algebra: ``k`` element_at lookups + AND —
   no shuffle, no UDF, no extra join;
3. probe rows that fail the Bloom are DEFINITE non-matches (no false
   negatives).  For inner/semi joins they are dropped before the
   shuffle; for ANTI joins they bypass the join entirely and are
   unioned with the exact anti-join of the survivors — both rewrites
   return exactly the unpruned result, because false positives merely
   pass through to the exact join that follows.

Sizing: FPR ≈ (1 - e^{-k·n/m})^k — at the 2^17-bit default, 1k build
keys and k=4 give ~1e-6; scale ``m_bits`` with the build side (it only
costs driver memory and plan bytes, 32 KB per 2^18 bits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mbai_gdb_spark.ops.decontam import (
    MERSENNE31,
    WORD_BITS,
    _bloom_pos,
    bloom_bitmap,
)

_INTEGRAL = ("byte", "short", "int", "long", "integer", "bigint", "smallint", "tinyint")


def _require_integral(df: DataFrame, col: str) -> None:
    t = df.schema[col].dataType.simpleString()
    if t not in _INTEGRAL:
        raise ValueError(
            f"bloom join keys must be integral; {col!r} is {t} — hash string "
            "keys to long (e.g. xxhash64) before calling"
        )


def _norm_key(key: Column) -> Column:
    """Non-negative canonical key: Spark's ``%`` keeps the dividend's
    sign, which would send negative keys to negative bit positions
    (element_at crash / wrong word) and diverge from numpy's
    Python-style ``%`` in the vectorized path — ``pmod`` aligns both."""
    return F.pmod(key.cast("long"), F.lit(MERSENNE31))


def bloom_membership(
    keys: DataFrame,
    key_col: str,
    probe_key: Column,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> Column:
    """Boolean column: ``probe_key`` is PROBABLY in ``keys[key_col]``
    (false positives possible, false negatives impossible); NULL for a
    NULL probe key (a NULL key matches nothing in an equi-join, so
    callers filtering on this drop it — same as the plain join).  The
    bitmap is collected once (bounded: ``m_bits/32`` longs) and
    inlined as an array literal, so evaluating the predicate is
    map-only.  Keys must be integral (hash strings first); negative
    keys are handled via pmod normalization on BOTH sides."""
    _require_integral(keys, key_col)
    rows = bloom_bitmap(
        # NULL build keys never equi-match — drop them (keeping them
        # would NULL-poison the bitmap rows and crash the collect)
        keys.filter(F.col(key_col).isNotNull()).select(
            _norm_key(F.col(key_col)).alias("sh_id")
        ),
        m_bits=m_bits,
        k=k,
    ).collect()
    words = [0] * (m_bits // WORD_BITS)
    for r in rows:
        words[int(r.word_idx)] = int(r.word)
    # ONE string literal, constant-folded by the optimizer into a
    # single array Literal node.  (r14: `F.lit(words)` built the array
    # as ``m_bits/32`` individual Literal children — expensive twice:
    # one py4j round-trip per element at construction, and every
    # analyzer/optimizer pass then re-walks a 4096-child CreateArray
    # PER REFERENCE (k=4 references here) — measured ~0.5 s of driver
    # plan-compile time per reference at the 2^17-bit default; guide
    # §7.3 "driver is doing something single-threaded".  A folded
    # Literal is one node however wide the bitmap.)
    import json as _json

    words_col = F.from_json(F.lit(_json.dumps(words)), "array<bigint>")
    cond = F.lit(True)
    for j in range(k):
        pos = _bloom_pos(_norm_key(probe_key), j, m_bits)
        word = F.element_at(words_col, (F.floor(pos / WORD_BITS) + 1).cast("int"))
        # shiftleft == the old pow(2.0, r).cast(long) bit-exactly for
        # r in [0, 31] (float64 powers of two are exact); integer
        # shift beats a float pow per probe row (guide §2.3).
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % WORD_BITS).cast("int")
        )
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str | None = None,
    how: str = "inner",
    m_bits: int = 1 << 17,
    k: int = 4,
    join_hint: str | None = None,
) -> DataFrame:
    """Join with the probe side Bloom-pruned map-side first; the result
    is EXACTLY the unpruned join's.

    ``how='inner'`` / ``'left_semi'``: Bloom-fail rows cannot match →
    dropped before the probe shuffle; survivors go through the exact
    join, which removes the false positives.

    ``how='left_anti'``: Bloom-fail rows are guaranteed IN the result →
    emitted without touching the join; only the (few) Bloom-pass rows
    pay the exact anti-join.  For a selective build side this turns the
    anti-join's full-probe shuffle into a shuffle of ~FPR·|probe| rows.

    ``join_hint`` (e.g. ``'merge'``, ``'shuffle_hash'``) is applied to
    the build side of the exact join.  The module cost model (header)
    says the prune only pays when the exact join is NOT a broadcast
    hash join — on a small-fixture certification run Catalyst would
    happily broadcast the dim and hide the operator's real regime, so
    tests/demos pass ``'merge'`` to pin the sort-merge shape the prune
    exists for.  The hint changes the physical strategy only; results
    are identical.
    """
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError("how must be inner, left_semi or left_anti")
    bk = build_key or probe_key
    _require_integral(probe, probe_key)
    member = bloom_membership(
        build.select(bk), bk, F.col(probe_key), m_bits=m_bits, k=k
    )
    if join_hint is not None:
        build = build.hint(join_hint)
    # NULL keys: member is NULL.  A NULL key equi-matches nothing, so
    # it is a DEFINITE miss — kept by anti joins (plain left_anti keeps
    # null-key rows), dropped by inner/semi (plain joins drop them).
    passes = F.coalesce(member, F.lit(False))
    if how == "left_anti":
        definite_miss = probe.filter(~passes)
        maybe = probe.filter(passes)
        join_cond = maybe[probe_key] == build[bk]
        survivors = maybe.join(build, join_cond, "left_anti")
        return definite_miss.unionByName(survivors)
    pruned = probe.filter(passes)
    if how == "left_semi":
        return pruned.join(build, pruned[probe_key] == build[bk], "left_semi")
    return pruned.join(build, pruned[probe_key] == build[bk], "inner")


def bloom_membership_vectorized(
    keys: DataFrame,
    key_col: str,
    probe: DataFrame,
    probe_key: str,
    m_bits: int = 1 << 24,
    k: int = 4,
    flag_col: str = "__bloom_pass__",
) -> DataFrame:
    """``probe`` plus a boolean ``flag_col``: probably-in-``keys``.

    The BIG-build-side engine: the bitmap ships as a SparkContext
    broadcast of a numpy uint32 array (2 MB per 2^24 bits — far past
    what a codegen literal tolerates) and each Arrow batch tests all
    its rows with vectorized bit math — the same LCG hash family as
    :func:`bloom_membership`, so the two paths agree bit-for-bit.
    Use when the build side is too large to broadcast-join (the
    sort-merge regime), which is exactly when pruning the probe
    shuffle pays.
    """
    import numpy as np
    import pandas as pd

    from mbai_gdb_spark.ops.decontam import _BLOOM_ADD, _BLOOM_MULT, _BLOOM_STRIDE, MERSENNE31

    _require_integral(keys, key_col)
    _require_integral(probe, probe_key)
    rows = bloom_bitmap(
        keys.filter(F.col(key_col).isNotNull()).select(
            _norm_key(F.col(key_col)).alias("sh_id")
        ),
        m_bits=m_bits,
        k=k,
    ).collect()
    words = np.zeros(m_bits // WORD_BITS, dtype=np.uint32)
    for r in rows:
        words[int(r.word_idx)] = np.uint32(r.word)
    bcast = probe.sparkSession.sparkContext.broadcast(words)

    from pyspark.sql import types as T

    cols = probe.columns
    out_schema = T.StructType(
        list(probe.schema.fields) + [T.StructField(flag_col, T.BooleanType())]
    )

    def test(batches):
        w = bcast.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            raw = pdf[probe_key]
            nulls = raw.isna().to_numpy()
            key = raw.fillna(0).to_numpy(dtype=np.int64) % MERSENNE31
            ok = np.ones(len(key), dtype=bool)
            for j in range(k):
                h1 = (key + j * _BLOOM_STRIDE) % MERSENNE31
                h2 = (h1 * _BLOOM_MULT + _BLOOM_ADD) % MERSENNE31
                pos = h2 % m_bits
                ok &= (w[pos // WORD_BITS] >> (pos % WORD_BITS)) & 1 == 1
            ok &= ~nulls  # NULL key matches nothing → definite miss
            pdf = pdf.copy()
            pdf[flag_col] = ok
            yield pdf

    return probe.mapInPandas(test, out_schema).select(*cols, flag_col)
