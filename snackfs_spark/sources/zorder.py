"""Z-order (Morton-curve) layout for multi-column data skipping.

Parquet scans prune row groups by min/max statistics. Sorting by ONE
column makes its stats tight but leaves every other column's ranges
wide — a filter on the second column skips nothing. Interleaving the
bits of both key columns (the Morton curve) and sorting by THAT key
keeps each row group confined to a small rectangle of the key space, so
range filters on EITHER column prune.

This is the same layout lever Delta's OPTIMIZE ZORDER BY pulls; here it
is a plain column expression (JVM-side bit arithmetic, whole-stage
codegen) plus an ordered write — nothing engine-specific. At 100 TB the
sort is a one-time ingest cost (a range-partitioned global sort); every
subsequent selective scan pays less IO.

Reference analog: the reference co-locates a file's blocks by key design
(path-keyed rows, ThriftStore.scala); z-order is the multi-dimensional
generalization an analytics engine needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_BITS = 16  # bits interleaved per column -> 32-bit morton key


def zorder_key(a: str | Column, b: str | Column, bits: int = Z_BITS) -> Column:
    """Morton interleave of the low `bits` bits of two non-negative
    integer columns: result bit 2i is a's bit i, bit 2i+1 is b's bit i.
    Pure bitwise arithmetic — codegen'd, no UDF."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    one = F.lit(1).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(ca, i).bitwiseAND(one), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftrightunsigned(cb, i).bitwiseAND(one), 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 16
) -> None:
    """Write `df` as parquet laid out along the Morton curve of
    (col_a, col_b): a range-repartition + local sort on the z-key, so
    each output file (and its row groups) covers a compact rectangle of
    the 2-D key space. repartitionByRange is the scalable global sort —
    samples the key distribution, no single-task sort.

    Both columns are first scaled to the full `Z_BITS` range from their
    observed min/max (one tiny agg, broadcast back). Without this, the
    wider-ranged column's high bits dominate the curve's top bits and
    file boundaries split on that dimension alone — the narrow column
    gets no between-file locality, which is the whole point. Scaling
    makes the top z bits alternate dimensions, so every halving of the
    file count halves BOTH dimensions' extent per file (this is what
    table formats' OPTIMIZE ZORDER does with range ids)."""
    span = F.lit((1 << Z_BITS) - 1).cast("long")
    stats = df.agg(
        F.min(col_a).alias("a_min"),
        F.max(col_a).alias("a_max"),
        F.min(col_b).alias("b_min"),
        F.max(col_b).alias("b_max"),
    )

    def scaled(c: str, lo: str, hi: str) -> Column:
        rng = F.greatest(F.col(hi) - F.col(lo), F.lit(1)).cast("double")
        return (
            ((F.col(c) - F.col(lo)).cast("double") * span / rng)
            .cast("long")
        )

    z = zorder_key(scaled(col_a, "a_min", "a_max"), scaled(col_b, "b_min", "b_max"))
    (
        df.join(F.broadcast(stats))
        .withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z", "a_min", "a_max", "b_min", "b_max")
        .write.mode("overwrite")
        .parquet(path)
    )
