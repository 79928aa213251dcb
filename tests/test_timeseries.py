from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from youtubeanalyzerproject_big_data__spark.operators.timeseries import gap_fill


def _events(spark):
    rows = [
        (1, 7, dt.datetime(2024, 1, 1, 0, 10), "a"),
        (2, 7, dt.datetime(2024, 1, 1, 0, 50), "b"),
        (3, 7, dt.datetime(2024, 1, 1, 3, 5), "c"),   # hours 1-2 are gaps
        (4, 8, dt.datetime(2024, 1, 1, 5, 0), "z"),   # single-bucket key: no gaps
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")


def test_gap_fill_materializes_missing_buckets(spark):
    out = gap_fill(_events(spark), "user_id", "ts", "event_type").orderBy("user_id", "bucket").collect()
    u7 = [r for r in out if r["user_id"] == 7]
    assert [r["bucket"].hour for r in u7] == [0, 1, 2, 3]
    assert [r["n_events"] for r in u7] == [2, 0, 0, 1]
    assert [r["is_gap"] for r in u7] == [False, True, True, False]
    # carried state: hour 0's max type 'b' carries across the gap, then 'c'
    assert [r["carried_type"] for r in u7] == ["b", "b", "b", "c"]
    u8 = [r for r in out if r["user_id"] == 8]
    assert len(u8) == 1 and u8[0]["n_events"] == 1 and not u8[0]["is_gap"]


def test_gap_fill_no_nulls_and_spine_is_per_key(spark):
    out = gap_fill(_events(spark), "user_id", "ts", "event_type")
    # leading bucket is active by construction -> carried_type never NULL
    assert out.where(F.col("carried_type").isNull()).count() == 0
    # key 8's spine must NOT extend over key 7's range (per-key spine,
    # not a global calendar cross join)
    assert out.where(F.col("user_id") == 8).count() == 1
