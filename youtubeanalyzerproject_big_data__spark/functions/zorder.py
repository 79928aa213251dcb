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


def hilbert_key_2d(df: DataFrame, qx: Column, qy: Column, bits: int = 8, out_name: str = "hkey") -> DataFrame:
    """Hilbert-curve key for two quantized columns (cells in [0, 2^bits)):
    the locality-preserving successor to the Morton key -- consecutive
    Hilbert keys are ALWAYS grid neighbors (no Z-shape jumps), so range
    reads touch fewer files than a z-ordered layout on the same data
    (Databricks liquid clustering / Iceberg hilbert ordering use exactly
    this).

    Unrolled top-down fold of the classic xy2d walk (one quadrant-rotation
    step per level; reflections/swaps masked to the live low bits so every
    intermediate stays in [0, s)) -- pure shiftright/AND/XOR/CASE integer
    arithmetic inside whole-stage codegen, engine-exact, and mirrored
    step-for-step by :func:`hilbert_sql_2d` for the oracle.

    Takes and returns a DATAFRAME (adds ``out_name``, drops scratch):
    each level materializes named columns, keeping the expression tree
    LINEAR in ``bits`` -- a pure column-expression fold re-inlines x/y at
    every level and grows the tree exponentially (a driver OOM at
    bits=8, observed).  CollapseProject leaves the per-level projections
    alone because the intermediates are referenced repeatedly.
    """
    cur = df.withColumn("_hx", qx.cast("long")).withColumn("_hy", qy.cast("long")).withColumn(
        "_hd", F.lit(0).cast("long")
    )
    for level in reversed(range(bits)):
        s = 1 << level
        x, y = F.col("_hx"), F.col("_hy")
        rx = F.shiftright(x, level).bitwiseAND(F.lit(1))
        ry = F.shiftright(y, level).bitwiseAND(F.lit(1))
        xl = x.bitwiseAND(F.lit(s - 1))
        yl = y.bitwiseAND(F.lit(s - 1))
        flip = (ry == 0) & (rx == 1)
        xr = F.when(flip, F.lit(s - 1) - xl).otherwise(xl)
        yr = F.when(flip, F.lit(s - 1) - yl).otherwise(yl)
        cur = cur.withColumns(
            {
                "_hd": F.col("_hd") + (F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry)).cast("long"),
                "_hx": F.when(ry == 0, yr).otherwise(xr),
                "_hy": F.when(ry == 0, xr).otherwise(yr),
            }
        )
    return cur.withColumn(out_name, F.col("_hd")).drop("_hx", "_hy", "_hd")


def hilbert_sql_2d(base_sql: str, id_cols: str, bits: int = 8, out_name: str = "hkey") -> str:
    """DuckDB twin of :func:`hilbert_key_2d`: wraps ``base_sql`` (which
    must expose ``id_cols``, ``qx`` and ``qy``) in one derived table per
    level, replaying the identical fold.  (DuckDB's ``^`` is POWER, hence
    ``xor()``.)"""
    sql = f"SELECT {id_cols}, qx AS hx, qy AS hy, CAST(0 AS BIGINT) AS hd FROM ({base_sql})"
    for level in reversed(range(bits)):
        s = 1 << level
        rx = f"((hx >> {level}) & 1)"
        ry = f"((hy >> {level}) & 1)"
        xl = f"(hx & {s - 1})"
        yl = f"(hy & {s - 1})"
        flip = f"({ry} = 0 AND {rx} = 1)"
        xr = f"(CASE WHEN {flip} THEN {s - 1} - {xl} ELSE {xl} END)"
        yr = f"(CASE WHEN {flip} THEN {s - 1} - {yl} ELSE {yl} END)"
        sql = (
            f"SELECT {id_cols}, "
            f"CASE WHEN {ry} = 0 THEN {yr} ELSE {xr} END AS hx, "
            f"CASE WHEN {ry} = 0 THEN {xr} ELSE {yr} END AS hy, "
            f"hd + {s * s} * xor(3 * {rx}, {ry}) AS hd "
            f"FROM ({sql})"
        )
    return f"SELECT {id_cols}, CAST(hd AS BIGINT) AS {out_name} FROM ({sql})"
