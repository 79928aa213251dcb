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


def test_seasonal_backtest_hand_computed(spark):
    """e17: two days of hourly counts for one type; day-2 hours score
    against day-1.  Hours without a day-earlier counterpart drop (inner
    alignment)."""
    import datetime as dt

    from youtubeanalyzerproject_big_data__spark.operators.timeseries import seasonal_naive_backtest

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # day 1: hour 0 -> 2 events, hour 1 -> 1 event
    rows += [(base, "a"), (base + dt.timedelta(minutes=5), "a")]
    rows += [(base + dt.timedelta(hours=1), "a")]
    # day 2: hour 0 -> 3 events (err 1), hour 1 -> 1 event (err 0),
    #        hour 2 -> 5 events (no day-1 counterpart: dropped)
    d2 = base + dt.timedelta(hours=24)
    rows += [(d2 + dt.timedelta(minutes=m), "a") for m in (0, 1, 2)]
    rows += [(d2 + dt.timedelta(hours=1), "a")]
    rows += [(d2 + dt.timedelta(hours=2, minutes=m), "a") for m in range(5)]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    out = seasonal_naive_backtest(df, "ts", "event_type", period_hours=24).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_hours"], r["total_actual"], r["total_abs_err"]) == (2, 4, 1)
    assert r["wape_ppm"] == (1_000_000 * 1) // 4

def test_acf_matches_bruteforce(spark):
    """e18: acf_ppm equals a pure-Python replay over the dense hourly
    series (zeros included), including the negative-numerator truncation
    and the driver-side big-int ratio."""
    import datetime as dt

    from youtubeanalyzerproject_big_data__spark.operators.timeseries import acf_ppm

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    # 3 days, alternating-ish counts with one silent hour (a real zero)
    counts = {}
    for h in range(72):
        if h == 5:
            continue  # gap hour -> x = 0
        counts[h] = (h % 7) + (3 if h % 24 == 2 else 0)
    rows = [
        (base + dt.timedelta(hours=h, minutes=i), "a")
        for h, c in counts.items()
        for i in range(c)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, event_type string")
    lags = (1, 2, 24)
    out = {r["lag"]: r for r in acf_ppm(df, "ts", lags=lags).collect()}

    active = [h for h, c in counts.items() if c > 0]
    h0, h1 = min(active), max(active)  # spine spans OBSERVED hours only
    xs = [counts.get(h, 0) for h in range(h0, h1 + 1)]
    n, s = len(xs), sum(xs)
    dev = [n * x - s for x in xs]
    den = max(sum(d * d for d in dev), 1)
    for L in lags:
        num = sum(dev[t] * dev[t + L] for t in range(n - L))
        ppm = -((1_000_000 * -num) // den) if num < 0 else (1_000_000 * num) // den
        r = out[L]
        assert (r["n_pairs"], r["n_hours"], r["acf_ppm"]) == (n - L, n, ppm)
