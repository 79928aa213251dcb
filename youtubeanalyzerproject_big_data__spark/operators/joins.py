"""Joins J1-J6 (SURVEY.md par.2.3).

Patterns preserved from the reference:
  * degree-preserving left join + fillna(0)  (YoutubeNetworkAgg_Final.py:122-139)
  * dimension enrichment joins               (run_alsrecs_job.py:138-139)
  * the N+1 driver-side find_one loop (PageRank_Spark_v5.py:148-156) is
    REPLACED by a broadcast-hash join -- same output, distributed mechanics.

Broadcast discipline: every dimension side here is wrapped in
``F.broadcast`` when small, so the big fact side never shuffles for the
join.  AQE can also promote at runtime, but being explicit keeps the 100 TB
plan deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def left_join_fill_zero(base: DataFrame, counts: DataFrame, key: str, fill_cols: list[str]) -> DataFrame:
    """J1/J2: keep zero-degree entities through a left join + fillna(0)."""
    return base.join(counts, key, "left").fillna({c: 0 for c in fill_cols})


def enrich_broadcast(fact: DataFrame, dim: DataFrame, key: str, how: str = "left") -> DataFrame:
    """J3/J4/J6: broadcast-hash enrichment join against a small dimension."""
    return fact.join(F.broadcast(dim), key, how)


def semi_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """EXISTS semi-join (not in the reference; completes the join family)."""
    return left.join(right, key, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    """NOT EXISTS anti-join."""
    return left.join(right, key, "left_anti")
