"""Salted two-phase aggregation equals the direct aggregate."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_salted_count_matches_direct(spark):
    from youtubeanalyzerproject_big_data__spark.functions.skew import salted_count

    df = spark.range(0, 10000).select((F.col("id") % 7).alias("k"))  # key 0..6, skewless
    skewed = df.union(spark.range(0, 50000).select(F.lit(99).alias("k")))  # one hot key
    direct = {r["k"]: r["c"] for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_count(skewed, "k", num_salts=8).collect()}
    assert salted == direct
    assert salted[99] == 50000


def test_salted_collect_set_matches_direct(spark):
    from youtubeanalyzerproject_big_data__spark.functions.skew import salted_collect_set

    df = spark.range(0, 5000).select((F.col("id") % 3).alias("k"), (F.col("id") % 97).alias("v"))
    direct = {r["k"]: set(r["s"]) for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()}
    salted = {r["k"]: set(r["vals"]) for r in salted_collect_set(df, "k", "v", num_salts=8).collect()}
    assert salted == direct
