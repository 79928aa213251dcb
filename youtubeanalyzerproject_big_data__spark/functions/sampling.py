"""Deterministic hash-based sampling.

``df.sample`` is seed-stable only for a fixed partitioning of a fixed
dataset -- repartition the input (or re-run on a grown table) and the
sampled SET changes.  Training-data pipelines want the opposite: a row's
membership should depend only on the row itself, so samples are
reproducible across runs, engines, partitionings, and incremental loads
(a row once in the 10% sample stays in it forever).

The fix is hashing a stable key: keep a row iff
``md5_int32(key) % denominator < numerator``.  The same predicate is
expressible in the DuckDB oracle (functions/hashing.md5_int32_sql), making
sampled pipelines value-checkable end to end -- something no RNG-based
sample can offer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from youtubeanalyzerproject_big_data__spark.functions.hashing import md5_int32


def hash_sample_predicate(key: Column, numerator: int, denominator: int = 1000, seed: int | str = 0) -> Column:
    """Membership predicate: deterministic ~numerator/denominator sample."""
    return F.pmod(md5_int32(key.cast("string"), seed=seed), F.lit(denominator)) < numerator


def hash_sample(df: DataFrame, key_col: str, fraction: float, seed: int | str = 0) -> DataFrame:
    """Deterministic sample of ~``fraction`` of rows, keyed on ``key_col``.

    Membership is a pure function of the key -- stable under repartition,
    re-run, engine change, and table growth.
    """
    denominator = 1_000_000
    numerator = int(round(fraction * denominator))
    return df.where(hash_sample_predicate(F.col(key_col), numerator, denominator, seed))


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str, fractions: dict, seed: int | str = 0) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample 'en' to 10%,
    keep 'yo' at 100%) -- the language-rebalancing step of corpus curation.
    Strata missing from ``fractions`` are dropped (explicit is safer than a
    silent keep-all default)."""
    denominator = 1_000_000
    h = F.pmod(md5_int32(F.col(key_col).cast("string"), seed=seed), F.lit(denominator))
    pred = F.lit(False)
    for stratum, fraction in sorted(fractions.items()):
        pred = pred | ((F.col(stratum_col) == stratum) & (h < int(round(fraction * denominator))))
    return df.where(pred)
