"""Dominant-period detection (operators/periodogram.py)."""

import datetime as dtm

import numpy as np

from afspark.operators.periodogram import dominant_period, dominant_period_local


def t(s):
    return dtm.datetime(2024, 1, 1) + dtm.timedelta(seconds=s)


def test_local_finds_planted_daily_period():
    n = 240  # 10 days of hourly buckets
    e = np.arange(n, dtype=np.int64) * 3600
    v = 100 + 50 * np.sin(2 * np.pi * np.arange(n) / 24)
    got = dominant_period_local(e, v, 3600)
    assert got is not None
    n_grid, k_peak, period_s, ratio = got
    assert n_grid == 240 and k_peak == 10 and period_s == 86400
    assert ratio > 990_000  # pure tone: nearly all power in the peak


def test_local_gap_fill_is_neutral():
    n = 240
    e = np.arange(n, dtype=np.int64) * 3600
    v = 100 + 50 * np.sin(2 * np.pi * np.arange(n) / 24)
    keep = np.ones(n, dtype=bool)
    keep[np.arange(7, n, 17)] = False  # knock out ~6% of buckets
    got = dominant_period_local(e[keep], v[keep], 3600)
    assert got is not None and got[2] == 86400  # still the daily peak


def test_local_flat_and_short_undefined():
    e = np.arange(10, dtype=np.int64) * 3600
    assert dominant_period_local(e, np.full(10, 7.0), 3600) is None
    assert dominant_period_local(e[:3], np.array([1.0, 2.0, 3.0]), 3600) is None


def test_spark_matches_local_and_drops_flat(spark):
    n = 96
    rng = np.random.default_rng(13)
    series = {
        "daily": 100 + 50 * np.sin(2 * np.pi * np.arange(n) / 24),
        "noise": rng.normal(0, 1, n).round(2),
    }
    rows = [
        (sid, t(i * 3600), float(v))
        for sid, xs in series.items()
        for i, v in enumerate(xs)
    ]
    rows += [("flat", t(i * 3600), 5.0) for i in range(n)]
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    ).repartition(5)
    out = {r.series_id: r for r in dominant_period(tier, 3600).collect()}
    assert set(out) == {"daily", "noise"}  # flat emits no row
    for sid in out:
        e = np.arange(n, dtype=np.int64) * 3600 + 1704067200
        want = dominant_period_local(e, series[sid], 3600)
        r = out[sid]
        assert (r.n_grid, r.k_peak, r.period_s, r.ratio_micros) == want
    assert out["daily"].period_s == 86400
