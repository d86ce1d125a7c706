"""Data-layout operators: Z-order (Morton) multi-dimensional clustering.

At 100 TB the cheapest query is the one that never reads the file:
parquet min/max footer stats prune files only when the file's value
RANGE on the filtered column is narrow.  Sorting by one column makes
that column's ranges tight and every other column's ranges global;
interleaving the bits of two columns (the Z-/Morton curve) makes BOTH
columns' per-file ranges shrink like sqrt of the file fraction — the
layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is integer arithmetic (``//``, ``%``, exact small
powers of two) expressible identically in Spark and ANSI SQL, so the
z-values themselves are oracle-checkable; the write path is plain
``repartitionByRange`` + ``sortWithinPartitions`` — Spark's own range
exchange does the global ordering, no driver-side sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: result bit ``2i`` is bit ``i`` of ``x``, bit
    ``2i+1`` is bit ``i`` of ``y``.  ``bits <= 31`` keeps every
    intermediate exact in a long.

    The interleave is UNROLLED into ``2*bits`` literal shift/mask
    terms — pure whole-stage-codegen integer ops, no array and no HOF
    lambda (the original sequence-fold with per-element pow() measured
    ~10× slower at sf0.1); map-only, no shuffle, no UDF.  The SQL
    oracle keeps its list-fold form; values are identical.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    xm = F.pmod(x.cast("long"), F.lit(1 << bits))
    ym = F.pmod(y.cast("long"), F.lit(1 << bits))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xm, i) % 2, 2 * i).cast("long")
            + F.shiftleft(F.shiftright(ym, i) % 2, 2 * i + 1).cast("long")
        )
    return z


def zorder_profile(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    bucket_shift: int = 26,
) -> DataFrame:
    """Per-Z-bucket locality profile: fixed-width buckets of the Morton
    value (``z >> bucket_shift`` — map-only, no global window) with
    row count and the min/max of BOTH source dimensions.  Reading the
    output shows the data-skipping effect directly: each bucket bounds
    x AND y, which a single-column sort cannot do.

    The bucket is an INTEGER shift, not a double division: z carries up
    to ``2*bits`` significant bits (62 at bits=31), past the 53-bit
    double mantissa, so ``floor(z / 2^shift)`` would mis-bucket the
    upper half of the supported bits range; ``shiftright`` is exact for
    the whole of it (z is non-negative by construction).
    """
    z = z_value(F.col(x_col), F.col(y_col), bits)
    return (
        df.select(
            F.col(x_col).alias("x"),
            F.col(y_col).alias("y"),
            F.shiftright(z, bucket_shift).cast("long").alias("z_bucket"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of
    ``(x_col, y_col)``: a range exchange on the Morton value (Spark
    samples quantile boundaries — balanced files even under skew) and
    a within-partition sort, so every output file covers one contiguous
    Z-range and its parquet footer min/max is tight on BOTH columns."""
    z = z_value(F.col(x_col), F.col(y_col), bits).alias("__z__")
    (
        df.withColumn("__z__", z)
        .repartitionByRange(n_files, "__z__")
        .sortWithinPartitions("__z__")
        .drop("__z__")
        .write.mode("overwrite")
        .parquet(path)
    )
