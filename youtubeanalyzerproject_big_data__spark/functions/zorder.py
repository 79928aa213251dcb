"""Z-order (Morton) clustering keys -- multi-dimensional data layout.

Sorting a table by ONE column makes parquet min/max pruning effective for
that column only; interleaving the bits of several columns' quantized
values gives a single sort key whose contiguous ranges are small
hyper-rectangles in ALL of them, so one layout serves range predicates on
any participating column (the Delta/Iceberg OPTIMIZE ZORDER recipe).

Everything is built-in bit arithmetic (shiftleft/shiftright/AND) inside
whole-stage codegen: computing keys for 100 TB is a map-side scan, and the
layout write is one range repartition + in-partition sort -- the shuffle
you pay once so every later scan prunes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) cells: floor of the linear
    rescale, clamped at the top edge (x == hi lands in the last cell).
    lo/hi are model-sized scalars (one agg) inlined as literals."""
    cells = 1 << bits
    span = hi - lo
    if span <= 0:  # degenerate constant column -> single cell
        return F.lit(0).cast("long")
    scaled = F.floor((col.cast("double") - F.lit(float(lo))) / F.lit(float(span)) * F.lit(float(cells)))
    return F.least(scaled, F.lit(cells - 1)).cast("long")


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton interleave: bit b of column c lands at position
    b * n_cols + c.  Pure shiftleft/shiftright/AND expression tree."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for c_idx, c in enumerate(cols):
        for b in range(bits):
            key = key + F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + c_idx)
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-order key over ``cols`` using each column's observed min/max
    (one aggregate, collected driver-side -- model-sized)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"_lo_{c}"), F.max(F.col(c).cast("double")).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    qs = [quantize(F.col(c), row[f"_lo_{c}"], row[f"_hi_{c}"], bits) for c in cols]
    return interleave_bits(qs, bits)


def write_zordered(df: DataFrame, cols: list[str], path: str, n_files: int = 32, bits: int = 8) -> None:
    """Materialize a z-ordered layout: range-repartition on the key (so
    files hold contiguous key ranges -> tight per-file min/max on every
    participating column), sort within partitions, drop the key, write."""
    keyed = df.withColumn("_zkey", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
