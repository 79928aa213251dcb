"""Filters / predicates F1-F8 incl. the dynamic predicate builder
(SURVEY.md par.2.2).

The reference's only "query planner" is an AND-fold of optional Column
predicates (YoutubeNetworkAgg_Final.py:247-273, guiV5.py:236-253); range
queries F4/F5 come from QueryScripts_Final.py:15-26,36-44.  Expressed
declaratively these all reach the parquet scan as PushedFilters (verified in
tests/test_plans.py), so at 100 TB they skip row groups instead of reading
them.
"""

from __future__ import annotations

from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Supported ops for the dynamic builder: name -> Column factory.
_OPS = {
    "eq": lambda c, v: F.col(c) == v,
    "ne": lambda c, v: F.col(c) != v,
    "ge": lambda c, v: F.col(c) >= v,
    "le": lambda c, v: F.col(c) <= v,
    "gt": lambda c, v: F.col(c) > v,
    "lt": lambda c, v: F.col(c) < v,
    "between": lambda c, v: F.col(c).between(v[0], v[1]),
    "isin": lambda c, v: F.col(c).isin(list(v)),
    "not_null": lambda c, v: F.col(c).isNotNull(),
}


def build_predicate(conds: list[tuple[str, str, Any]]) -> Column | None:
    """F6: AND-fold optional conditions; empty list -> no filter (None).

    ``conds`` entries are (column, op, value) with op in _OPS.  Mirrors the
    reference's ``reduce(lambda a,b: a & b, conds)`` fold
    (YoutubeNetworkAgg_Final.py:262-266).
    """
    cols = [_OPS[op](c, v) for c, op, v in conds]
    if not cols:
        return None
    return reduce(lambda a, b: a & b, cols)


def dynamic_search(df: DataFrame, conds: list[tuple[str, str, Any]]) -> DataFrame:
    """F6 applied: filtered DataFrame (no-op on empty conds)."""
    pred = build_predicate(conds)
    return df if pred is None else df.where(pred)


def dynamic_search_count(df: DataFrame, conds: list[tuple[str, str, Any]]) -> DataFrame:
    """The reference surfaces match-counts next to results
    (YoutubeNetworkAgg_Final.py:275-276)."""
    return dynamic_search(df, conds).agg(F.count(F.lit(1)).alias("num_matches"))


def range_query(df: DataFrame, col: str, lo: Any, hi: Any, extra: Column | None = None) -> DataFrame:
    """F4/F5: conjunctive range predicate (category+length / views ranges)."""
    pred = F.col(col).between(lo, hi)
    if extra is not None:
        pred = pred & extra
    return df.where(pred)
