"""F4-F6 dynamic predicates and O1-O4 top-K (SURVEY.md par.2.2, par.2.5)."""

from __future__ import annotations

from youtubeanalyzerproject_big_data__spark.operators import filters, topk


def test_dynamic_search_empty_conds_is_noop(videos):
    assert filters.dynamic_search(videos, []).count() == videos.count()


def test_dynamic_search_and_fold(videos):
    out = filters.dynamic_search(
        videos, [("category", "eq", "Music"), ("length", "ge", 100), ("views", "le", 30000)]
    )
    assert {r["video_id"] for r in out.collect()} == {"v01", "v02", "v06"}


def test_dynamic_search_count(videos):
    row = filters.dynamic_search_count(videos, [("category", "eq", "Comedy")]).collect()[0]
    assert row["num_matches"] == 1


def test_range_query_between_is_inclusive(videos):
    out = filters.range_query(videos, "length", 100, 300)
    assert {r["video_id"] for r in out.collect()} == {"v01", "v02", "v04", "v06"}


def test_top_k_matches_python_sort(videos):
    rows = videos.collect()
    expected = [r["video_id"] for r in sorted(rows, key=lambda r: (-r["views"], r["video_id"]))[:3]]
    got = [r["video_id"] for r in topk.top_k(videos, "views", 3, tiebreak="video_id").collect()]
    assert got == expected


def test_top_k_per_group(videos):
    out = topk.top_k_per_group(videos, "category", "views", 1, tiebreak="video_id").collect()
    best = {r["category"]: r["video_id"] for r in out}
    assert best["Music"] == "v06"  # 25000 views beats 1500 and 500
    assert all(r["rank_in_group"] == 1 for r in out)


def test_asof_join_backward_semantics(spark):
    """Backward as-of: latest right row at-or-before each left ts, per key."""
    import datetime as dt

    from youtubeanalyzerproject_big_data__spark.operators.joins import asof_join_backward

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    left = spark.createDataFrame(
        [(1, "u1", t(10), 1.0), (2, "u1", t(30), 2.0), (3, "u2", t(5), 3.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [(100, "u1", t(10), 9.0), (101, "u1", t(20), 8.0), (102, "u2", t(6), 7.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    out = {
        r["event_id"]: (r["event_id_asof"], r["value_asof"])
        for r in asof_join_backward(left, right, "user_id", "ts", ["event_id", "value"], "event_id").collect()
    }
    assert out[1] == (100, 9.0)  # equal ts counts (<=), right sorts first
    assert out[2] == (101, 8.0)  # latest of the two prior views
    assert out[3] == (None, None)  # u2's only view is AFTER the purchase
