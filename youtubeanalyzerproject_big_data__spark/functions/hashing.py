"""Portable deterministic hashing (Spark <-> DuckDB <-> anything with md5).

Spark's native ``hash``/``xxhash64`` are engine-specific, so operators whose
outputs must be reproducible across engines (MinHash, SimHash, document
fingerprints) derive integers from md5 hex digests instead:

    h_seed(s) = int(md5(seed || ':' || s)[0:8], 16)   -- 32-bit, non-negative

md5 is universally available and the 8-hex-digit prefix fits a signed 64-bit
integer, so the same family is expressible in the DuckDB oracle as
``CAST('0x' || substring(md5(seed || ':' || s), 1, 8) AS BIGINT)``.

These run as Catalyst expressions (md5 + conv are JVM built-ins) -- no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_int32(col: Column, seed: int | str = 0) -> Column:
    """Deterministic 32-bit non-negative hash of a string column."""
    tagged = F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(tagged), 1, 8), 16, 10).cast("long")


def md5_int32_sql(expr: str, seed: int | str = 0) -> str:
    """The DuckDB twin of :func:`md5_int32` (oracle-side)."""
    return f"CAST(concat('0x', substring(md5(concat('{seed}:', {expr})), 1, 8)) AS BIGINT)"


def md5_int32_lanes(col: Column, seed: int | str, lanes: int = 4) -> list[Column]:
    """Up to four independent 32-bit hashes from ONE md5 digest.

    A 128-bit digest carries four 8-hex-digit lanes; hash families that need
    K values (MinHash) pay ceil(K/4) md5 evaluations instead of K.  The
    shared digest is computed once per row by Catalyst subexpression
    elimination.  Lane j of seed s == ``md5_int32_lane_sql(expr, s, j)``.
    """
    digest = F.md5(F.concat(F.lit(f"{seed}:"), col))
    return [F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long") for j in range(lanes)]


def md5_int32_lane_sql(expr: str, seed: int | str, lane: int) -> str:
    """The DuckDB twin of lane ``lane`` of :func:`md5_int32_lanes`."""
    return f"CAST(concat('0x', substring(md5(concat('{seed}:', {expr})), {1 + 8 * lane}, 8)) AS BIGINT)"
