"""Mergeable frequency sketches: Misra-Gries heavy hitters.

Spark ships sketch aggregates for distinct counts (HLL++) and quantiles
(GK), but not for heavy hitters; this module adds the classic Misra-Gries
summary as a PARTITION-LOCAL sketch whose candidates merge by key -- the
shape every distributed sketch takes (map-side summary, tiny shuffle,
associative merge), and the reason it scales: the shuffle carries at most
``k`` rows per partition no matter how many billions of rows each partition
scanned.

Guarantees (the textbook ones, preserved by the batch-decrement variant
used here):

- no overestimate: est(x) <= true(x);
- bounded underestimate: true(x) - est(x) <= N/k globally (each
  partition's total decrement is <= N_p/k, and errors add across
  partitions);
- completeness: any x with true(x) > N/k survives in at least one
  partition's summary, hence reaches the merged candidate set.

The summary CONTENT depends on partitioning/arrival order (like any MG
sketch), so queries gate on the guarantees -- which hold under every
partitioning -- not on sketch internals (the a12/a13 pattern).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """Merged heavy-hitter candidates: (key, est) with est summed over the
    per-partition Misra-Gries summaries.

    The kernel is Arrow-batched and VECTORIZED: each batch collapses to
    value_counts first (one C pass), counters update dict-at-a-time, and
    the decrement step subtracts the (k+1)-th largest counter from all --
    one batched decrement instead of Misra-Gries' per-row loop, with the
    same error budget (every unit decremented is charged to k+1 distinct
    arrivals, so total decrement <= N_p/k).
    """

    # NULL keys must count too: the gate's exact groupBy keeps the NULL
    # group, so the sketch dropping NaN (value_counts default) would make a
    # heavy NULL key fail completeness spuriously.  NaN is unusable as a
    # dict key (NaN != NaN), so nulls ride a private sentinel and turn back
    # into None on output.
    _NULL = "\x00__mg_null__"

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            vc = pdf["_k"].value_counts(dropna=False)
            for key, c in vc.items():
                key = _NULL if pd.isna(key) else key
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > k:
                s = pd.Series(counters)
                cut = int(s.nlargest(k + 1).iloc[-1])
                s = s - cut
                counters = {key: int(c) for key, c in s.items() if c > 0}
        yield pd.DataFrame(
            {
                "_k": [None if key == _NULL else key for key in counters],
                "est": [int(v) for v in counters.values()],
            }
        )

    keyed = df.select(F.col(key_col).cast("string").alias("_k"))
    summaries = keyed.mapInPandas(summarize, "_k string, est long")
    return (
        summaries.groupBy("_k")
        .agg(F.sum("est").cast("long").alias("est"))
        .select(F.col("_k").alias(key_col), "est")
    )


def heavy_hitters_gate(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """One-row contract: the MG candidate set must contain every key whose
    exact frequency exceeds N/k, never overestimate, and underestimate by
    at most N/k.  Exact counts come from one hash aggregate (the ground
    truth the sketch replaces at scale -- here they gate it)."""
    exact = df.groupBy(F.col(key_col).cast("string").alias(key_col)).agg(F.count(F.lit(1)).cast("long").alias("exact"))
    cand = misra_gries_candidates(df, key_col, k=k)
    n_total = df.count()
    threshold = n_total / k  # the MG guarantee line
    joined = exact.join(cand, key_col, "left")
    heavy = joined.where(F.col("exact") > threshold)
    return (
        heavy.agg(
            F.count(F.lit(1)).cast("long").alias("n_heavy"),
            F.count("est").cast("long").alias("n_heavy_found"),
            # min() over an EMPTY heavy set returns NULL; the contract output
            # must be NULL-free (repo invariant) and an empty heavy set is
            # vacuously green, so coalesce to 1.
            F.coalesce(
                F.min((F.col("est").isNotNull()) & (F.col("est") <= F.col("exact"))).cast("int"),
                F.lit(1),
            ).alias("no_overestimate"),
            F.coalesce(
                F.min(F.col("exact") - F.coalesce("est", F.lit(0)) <= threshold).cast("int"),
                F.lit(1),
            ).alias("underestimate_ok"),
        )
        .select(
            "n_heavy",
            "n_heavy_found",
            (F.col("n_heavy") == F.col("n_heavy_found")).cast("int").alias("all_heavy_found"),
            "no_overestimate",
            "underestimate_ok",
        )
    )
