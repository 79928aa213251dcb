"""Round-2 additions: binned interval join, pivot/unpivot, label centroids.

Each test pins the semantics on a hand-computable fixture; the driver-gate
oracles (e5/p1/p2/em1) pin the large-scale values.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from youtubeanalyzerproject_big_data__spark.operators import aggregates as agg
from youtubeanalyzerproject_big_data__spark.operators.joins import interval_join_binned
from youtubeanalyzerproject_big_data__spark.operators.similarity import label_centroids

UTC = dt.timezone.utc


def _ts(s: int, us: int = 0):
    return dt.datetime(2024, 1, 1, 0, 0, 0, tzinfo=UTC) + dt.timedelta(seconds=s, microseconds=us)


def test_interval_join_window_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts(0)), (2, 10, _ts(1000)), (3, 20, _ts(0))],
        "lid long, user long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _ts(0)),       # == left ts: inclusive start -> match of lid 1
            (10, _ts(299, 999999)),  # inside window
            (10, _ts(300)),     # == start + window: EXCLUSIVE end -> no match
            (10, _ts(1100)),    # matches lid 2 only
            (30, _ts(5)),       # wrong key
        ],
        "user long, rts timestamp",
    )
    out = interval_join_binned(
        left, right.withColumnRenamed("user", "ruser"), "user", "ruser", "lts", "rts", window_us=300_000_000
    )
    got = sorted((r["lid"], r["rts"].second) for r in out.collect())
    assert got == [(1, 0), (1, 59), (2, 20)]  # seconds wrap: 299->59, 1100->20
    # window boundary row (ts=300s) and wrong-key row excluded; lid 3 has no matches


def test_interval_join_crosses_bin_boundary(spark):
    # window straddles a bin edge: left at t=250s with 300s window must still
    # see a right row at t=400s (bin 1) -- the explode-to-2-bins path.
    left = spark.createDataFrame([(1, 7, _ts(250))], "lid long, user long, lts timestamp")
    right = spark.createDataFrame([(7, _ts(400))], "ruser long, rts timestamp")
    out = interval_join_binned(left, right, "user", "ruser", "lts", "rts", window_us=300_000_000)
    assert out.count() == 1


def test_pivot_stats_explicit_values_and_zero_fill(spark):
    df = spark.createDataFrame(
        [("A", "x", 1.0), ("A", "x", 2.0), ("B", "y", 5.0)],
        "k string, p string, v double",
    )
    out = {r["k"]: r for r in agg.pivot_stats(df, "k", "p", ["x", "y"], "v").collect()}
    assert out["A"]["sum_v_x"] == 3.0 and out["A"]["sum_v_y"] == 0.0  # empty cell -> 0 sentinel
    assert out["B"]["sum_v_x"] == 0.0 and out["B"]["sum_v_y"] == 5.0


def test_unpivot_roundtrips_measures(spark):
    df = spark.createDataFrame([("A", 1.0, 2.0)], "k string, m1 double, m2 double")
    out = agg.unpivot_measures(df, ["k"], ["m1", "m2"]).collect()
    assert {(r["k"], r["measure"], r["value"]) for r in out} == {("A", "m1", 1.0), ("A", "m2", 2.0)}


def test_label_centroids_partition_invariant(spark):
    rows = [(i % 3, [float(i), float(-i) / 7.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    one = label_centroids(df.coalesce(1), "label", "embedding").collect()
    many = label_centroids(df.repartition(8), "label", "embedding").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]  # bit-identical across partitionings
    # label 0 holds i in {0,3,...,27}: mean of pos 0 = 13.5
    r0 = next(r for r in one if r["label"] == 0 and r["pos"] == 0)
    assert abs(r0["centroid"] - 13.5) < 1e-6
