"""Regular-grid time-series repair over an irregular event stream.

Feature pipelines and monitoring consume FIXED-step series (one row per
key per hour), but event streams are bursty: hours with no events simply
do not exist in a groupBy output.  ``gap_fill`` materializes the missing
buckets (the per-key time spine) and carries the last observed categorical
state forward -- the standard as-of semantics for features between
observations.

Scale shape (100 TB events):
  * One shuffle: the (key, bucket) pre-aggregate.  Everything after runs
    on bucket-cardinality rows (keys x active-hours), orders of magnitude
    smaller than the event corpus.
  * The spine is GENERATED per key with sequence()+explode from that key's
    (min, max) bucket -- never a cross join against a global calendar
    table, so sparse keys don't pay for the global time range.
  * The forward fill is one per-key window (running last-non-null); state
    per reducer is a single key's spine, bounded by the time range.

Determinism: bucket boundaries are date_trunc (exact), counts are ints,
and the carried state is the MAX event type within the bucket (a total
order, no arrival-order dependence); leading rows can't be NULL because
each key's spine starts at its first ACTIVE bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    unit: str = "hour",
) -> DataFrame:
    """Fill a per-key bucketed event series to a dense regular grid.

    Returns one row per (key, bucket) for every bucket between the key's
    first and last active bucket inclusive: ``n_events`` (0 on gaps),
    ``is_gap``, and ``carried_type`` -- the bucket's max ``type_col``
    carried forward across gaps (as-of state between observations).
    """
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    active = events.groupBy(F.col(key_col), bucket).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.max(type_col).alias("_type"),
    )
    spine = (
        active.groupBy(key_col)
        .agg(F.min("bucket").alias("_b0"), F.max("bucket").alias("_b1"))
        .select(
            key_col,
            F.explode(F.sequence("_b0", "_b1", F.expr(f"interval 1 {unit}"))).alias("bucket"),
        )
    )
    filled = spine.join(active, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        F.col(key_col),
        F.col("bucket"),
        F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("n_events"),
        F.col("_n").isNull().alias("is_gap"),
        F.last("_type", ignorenulls=True).over(w).alias("carried_type"),
    )
