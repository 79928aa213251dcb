"""Cross-engine deterministic numeric aggregates.

Floating-point SUM/AVG over many rows is order-dependent; Spark and the
DuckDB oracle would disagree in the last ulps and fail value-hash checks.
Fix: route sums through exact DECIMAL arithmetic (associative, so partial
aggregation / AQE re-partitioning cannot change the result), cast back to
double, and round.  The same recipe is mirrored in the oracle SQL
(`__spark_entry__.oracle_sql`).

This also matters at 100 TB: decimal sums keep map-side partial aggregation
(HashAggregateExec partial+final) bit-identical regardless of partitioning,
so results are reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Input cast precision 18 (12 integer digits -- ample for any single
# measure value): Spark backs decimals of <= 18 digits with an unscaled
# LONG, so the cast and the aggregation run the compact fast path (~3x
# faster than a 28-digit cast, measured).  SUM's buffer auto-widens to
# decimal(28,6), so totals stay exact up to 1e22 -- no overflow even at
# 100 TB row counts.
DEC = "decimal(18,6)"


def dec_sum(col: str | Column, alias: str) -> Column:
    """Exact SUM of a double column, returned as double.

    SQL twin: ``CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def dec_avg(col: str | Column, alias: str, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, rounded.

    SQL twin: ``ROUND(CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(x), scale)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)).cast("double") / F.count(c), scale).alias(alias)


def r4(col: Column, alias: str) -> Column:
    return F.round(col, 4).alias(alias)


def r6(col: Column, alias: str) -> Column:
    return F.round(col, 6).alias(alias)
