"""CDC merge semantics: row-level overwrite, insert, tombstone delete."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_upsert_row_semantics(spark):
    from youtubeanalyzerproject_big_data__spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double"
    )
    updates = spark.createDataFrame(
        [
            (2, "B", None, False),  # update: full-row overwrite, NULL wins too
            (3, None, None, True),  # tombstone: key 3 vanishes
            (9, "z", 90.0, False),  # insert
        ],
        "k long, s string, v double, _del boolean",
    )
    out = {r["k"]: r for r in merge_upsert(base, updates, ["k"], delete_col="_del").collect()}
    assert set(out) == {1, 2, 9}
    assert out[1]["s"] == "a" and out[1]["v"] == 10.0  # untouched
    assert out[2]["s"] == "B" and out[2]["v"] is None  # row-level: update's NULL kept
    assert out[9]["s"] == "z" and out[9]["v"] == 90.0


def test_merge_upsert_plan_is_anti_join_union(spark):
    """The base side must plan a broadcast anti-join on the keys -- never a
    full-outer shuffle of the base."""
    from youtubeanalyzerproject_big_data__spark.operators.merge import merge_upsert
    from youtubeanalyzerproject_big_data__spark.plans.inspect import executed_plan

    base = spark.range(1000).select(F.col("id").alias("k"), F.lit("x").alias("s"))
    updates = spark.range(10).select(F.col("id").alias("k"), F.lit("y").alias("s"))
    df = merge_upsert(base, updates, ["k"])
    assert df.count() == 1000
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "FullOuter" not in plan


def test_funnel_requires_strict_order(spark):
    from youtubeanalyzerproject_big_data__spark.streaming.events import funnel_steps

    rows = [
        # user 1: full ordered funnel
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:01:00", "click"),
        (1, "2024-01-01 10:02:00", "purchase"),
        # user 2: click BEFORE view -> stops at view
        (2, "2024-01-01 09:00:00", "click"),
        (2, "2024-01-01 10:00:00", "view"),
        # user 3: view+click only; purchase before click doesn't count
        (3, "2024-01-01 08:00:00", "purchase"),
        (3, "2024-01-01 09:00:00", "view"),
        (3, "2024-01-01 09:30:00", "click"),
        # user 4: never viewed
        (4, "2024-01-01 09:00:00", "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, event_type string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
    )
    out = {r["step"]: r["n_users"] for r in funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_merge_upsert_empty_updates_is_identity(spark):
    from youtubeanalyzerproject_big_data__spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    updates = spark.createDataFrame([], "k long, s string, _del boolean")
    out = sorted(map(tuple, merge_upsert(base, updates, ["k"], delete_col="_del").collect()))
    assert out == [(1, "a"), (2, "b")]


def test_funnel_missing_step_yields_zero_row(spark):
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.streaming.events import funnel_steps

    rows = [(1, "2024-01-01 10:00:00", "view")]
    df = spark.createDataFrame(rows, "user_id long, ts_s string, event_type string").select(
        "user_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
    )
    out = {r["step"]: r["n_users"] for r in funnel_steps(df, ["view", "click", "purchase"]).collect()}
    assert out == {"view": 1, "click": 0, "purchase": 0}


def test_scd2_history_collapses_and_versions(spark):
    import datetime as dt

    from youtubeanalyzerproject_big_data__spark.operators.merge import SCD2_OPEN_END_US, scd2_history

    rows = [
        (1, "a", dt.datetime(2024, 1, 1, 0, 0, 0), 1),
        (2, "a", dt.datetime(2024, 1, 1, 0, 1, 0), 1),  # no change -> collapsed
        (3, "b", dt.datetime(2024, 1, 1, 0, 2, 0), 1),
        (4, "a", dt.datetime(2024, 1, 1, 0, 3, 0), 1),  # back to a: NEW version, not merged
        (5, "x", dt.datetime(2024, 1, 1, 0, 0, 30), 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, ts timestamp, user_id long")
    out = scd2_history(df, "user_id", "event_type", "ts", "event_id").orderBy("user_id", "version").collect()
    u1 = [r for r in out if r["user_id"] == 1]
    assert [r["state"] for r in u1] == ["a", "b", "a"]
    assert [r["version"] for r in u1] == [1, 2, 3]
    # intervals chain: each valid_to == next valid_from, last row open
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert u1[2]["valid_to_us"] == SCD2_OPEN_END_US and u1[2]["is_current"]
    assert not u1[0]["is_current"] and not u1[1]["is_current"]
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["is_current"] and u2[0]["version"] == 1


def test_scd2_equal_timestamps_break_by_tiebreak(spark):
    import datetime as dt

    from youtubeanalyzerproject_big_data__spark.operators.merge import scd2_history

    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(2, "late", t, 7), (1, "early", t, 7)], "event_id long, event_type string, ts timestamp, user_id long"
    )
    out = scd2_history(df, "user_id", "event_type", "ts", "event_id").orderBy("version").collect()
    assert [r["state"] for r in out] == ["early", "late"]  # event_id orders equal timestamps


def test_agg_state_merge_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.merge import agg_state, merge_agg_state

    df = spark.range(1000).select(
        (F.col("id") % 3).cast("string").alias("k"), (F.col("id") * 0.37 + 1).alias("v")
    )
    base = df.where(F.col("id") % 7 != 0)
    batch = df.where(F.col("id") % 7 == 0)
    merged = {
        r["k"]: r
        for r in merge_agg_state(agg_state(base, ["k"], "v"), agg_state(batch, ["k"], "v"), ["k"]).collect()
    }
    full = {r["k"]: r for r in agg_state(df, ["k"], "v").collect()}
    assert set(merged) == set(full)
    for k, f in full.items():
        m = merged[k]
        assert (m["n_rows"], m["sum_micro"], m["min_v"], m["max_v"]) == (
            f["n_rows"], f["sum_micro"], f["min_v"], f["max_v"],
        )


def test_agg_state_merge_is_order_free(spark):
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.merge import agg_state, merge_agg_state

    df = spark.range(200).select((F.col("id") % 2).cast("string").alias("k"), (F.col("id") * 1.5).alias("v"))
    a = df.where(F.col("id") < 50)
    b = df.where((F.col("id") >= 50) & (F.col("id") < 130))
    c = df.where(F.col("id") >= 130)
    sa, sb, sc = (agg_state(x, ["k"], "v") for x in (a, b, c))
    left = merge_agg_state(merge_agg_state(sa, sb, ["k"]).drop("avg_v"), sc, ["k"]).collect()
    right = merge_agg_state(sa, merge_agg_state(sb, sc, ["k"]).drop("avg_v"), ["k"]).collect()
    key = lambda rows: sorted((r["k"], r["n_rows"], r["sum_micro"], r["min_v"], r["max_v"], r["avg_v"]) for r in rows)
    assert key(left) == key(right)


def test_snapshot_diff_classifies_all_statuses(spark):
    from youtubeanalyzerproject_big_data__spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, None)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        # 1 unchanged, 2 changed (both cols), 3 deleted, 4 unchanged (all-null
        # compare cols must still count as present), 5 inserted
        [(1, "a", 10.0), (2, "B", 25.0), (4, None, None), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    out = {r["status"]: r for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()}
    assert out["unchanged"]["n_keys"] == 2
    assert out["deleted"]["n_keys"] == 1 and out["inserted"]["n_keys"] == 1
    assert out["changed"]["n_keys"] == 1
    assert out["changed"]["changed_s"] == 1 and out["changed"]["changed_v"] == 1
    assert out["unchanged"]["changed_s"] == 0


def test_topk_state_merge_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.merge import merge_topk_state, topk_state

    import random

    rng = random.Random(3)
    rows = [(i, ["a", "b"][i % 2], float(rng.randrange(1000))) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    full = topk_state(df, ["g"], "v", "id", k=5).collect()
    merged = merge_topk_state(
        topk_state(df.where("id % 3 != 0"), ["g"], "v", "id", k=5),
        topk_state(df.where("id % 3 = 0"), ["g"], "v", "id", k=5),
        ["g"], "v", "id", k=5,
    ).collect()
    key = lambda r: (r["g"], r["rank"], r["id"], r["v"])  # noqa: E731
    assert sorted(map(key, merged)) == sorted(map(key, full))


def test_refresh_partitions_replaces_only_touched(spark):
    """u6: a batch touching one partition leaves other state rows
    byte-identical (passthrough) and replaces the touched partition with
    the full recompute -- equal to rebuilding the whole view."""
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.merge import agg_state, refresh_partitions

    full = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0), ("b", 14, 4.0)],
        "day string, event_id long, value double",
    )
    old = full.where(F.col("event_id") % 10 != 4)  # drops the late 'b' row
    batch = full.where(F.col("event_id") % 10 == 4)
    state = agg_state(old, ["day"], "value")
    out = refresh_partitions(state, full, batch, "day", lambda src: agg_state(src, ["day"], "value"))
    expect = agg_state(full, ["day"], "value")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, expect.collect()))


def test_kmv_merge_equals_full_state(spark):
    """i3: merging k-truncated states equals the state of the union --
    KMV's exact-mergeability property on real DataFrames."""
    from pyspark.sql import functions as F

    from youtubeanalyzerproject_big_data__spark.operators.merge import kmv_state, merge_kmv_state

    df = spark.range(500).select((F.col("id") % 3).alias("g"), ((F.col("id") * 2654435761) % (2**32)).alias("h"))
    a, b = df.where(F.col("id") % 2 == 0), df.where(F.col("id") % 2 == 1)
    merged = merge_kmv_state(kmv_state(a, ["g"], "h", k=16), kmv_state(b, ["g"], "h", k=16), ["g"], k=16)
    full = kmv_state(df, ["g"], "h", k=16)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_pit_lookup_matches_interval_and_sentinels(spark):
    import datetime as dt

    from youtubeanalyzerproject_big_data__spark.operators.merge import pit_lookup, scd2_history

    feed = spark.createDataFrame(
        [
            (1, "bronze", dt.datetime(2024, 1, 1), 7),
            (2, "silver", dt.datetime(2024, 2, 1), 7),
            (3, "gold", dt.datetime(2024, 3, 1), 7),
        ],
        "event_id long, event_type string, ts timestamp, user_id long",
    )
    hist = scd2_history(feed, "user_id", "event_type", "ts", "event_id")
    facts = spark.createDataFrame(
        [
            (10, 7, dt.datetime(2023, 12, 1)),  # before first version -> sentinel
            (11, 7, dt.datetime(2024, 1, 15)),  # inside bronze
            (12, 7, dt.datetime(2024, 2, 1)),   # exactly at silver's valid_from -> silver
            (13, 7, dt.datetime(2024, 9, 9)),   # open interval -> gold
            (14, 99, dt.datetime(2024, 1, 15)), # no history key -> sentinel
        ],
        "fid long, k long, fts timestamp",
    )
    from pyspark.sql import functions as F

    out = pit_lookup(facts, hist, "k", F.unix_micros(F.col("fts")), "user_id").orderBy("fid")
    rows = {r["fid"]: (r["state"], r["version"]) for r in out.collect()}
    assert rows == {
        10: ("__none__", -1),
        11: ("bronze", 1),
        12: ("silver", 2),
        13: ("gold", 3),
        14: ("__none__", -1),
    }
    # intervals partition the timeline: the lookup can never duplicate facts
    assert out.count() == facts.count()
