"""Counter rate (reset handling) + rolling z-score goldens."""

import datetime as dtm

import numpy as np
import pytest
from pyspark.sql import functions as F

from afspark.operators.tsanalytics import (
    counter_increase,
    rate_per_bucket,
    rolling_zscore,
)


def t(s):
    return dtm.datetime(2024, 1, 1, 0, 0, 0) + dtm.timedelta(seconds=s)


def test_counter_increase_reset_semantics(spark):
    """[5, 7, 3, 10]: inc = [null, 2, 3 (reset -> raw value), 7]."""
    pts = spark.createDataFrame(
        [("s", t(0), 5.0), ("s", t(10), 7.0), ("s", t(20), 3.0), ("s", t(30), 10.0)],
        "series_id string, ts timestamp, value double",
    )
    rows = sorted(counter_increase(pts).collect(), key=lambda r: r.ts)
    assert [r.increase for r in rows] == [None, 2.0, 3.0, 7.0]


def test_rate_per_bucket_sums_and_rate(spark):
    pts = spark.createDataFrame(
        [("s", t(0), 5.0), ("s", t(10), 7.0), ("s", t(3600), 9.0), ("s", t(3610), 1.0)],
        "series_id string, ts timestamp, value double",
    )
    out = {r.bucket_ts.minute * 60 + r.bucket_ts.hour * 3600: r
           for r in rate_per_bucket(pts, 3600).collect()}
    b0, b1 = out[0], out[3600]
    assert (b0.n_samples, b0.increase_sum) == (2, 2.0)       # null + 2
    assert (b1.n_samples, b1.increase_sum) == (2, 3.0)       # 2 (7->9) + reset 1
    assert b1.rate_per_sec == pytest.approx(3.0 / 3600)


def test_rolling_zscore_flags_planted_spike(spark):
    """Alternating 10/12 baseline, then a 100 spike: only the spike is
    anomalous, and z matches the numpy formula exactly."""
    vals = [10.0, 12.0] * 12 + [100.0]
    rows = [("s", t(60 * i), v) for i, v in enumerate(vals)]
    tier = spark.createDataFrame(rows, "series_id string, bucket_ts timestamp, avg double")
    out = sorted(
        rolling_zscore(tier, n_window=24, value_col="avg").collect(),
        key=lambda r: r.bucket_ts,
    )
    flags = [r.is_anomaly for r in out]
    assert flags[-1] is True and not any(flags[:-1])
    base = np.array(vals[-25:-1])
    n = len(base)
    s, ss = base.sum(), (base * base).sum()
    var = (ss - s * s / n) / (n - 1)
    expected = (100.0 - s / n) / np.sqrt(var)
    assert out[-1].zscore == expected  # bit-exact: same formula, same operands
    # first two rows: baseline of 0/1 points -> null z, not anomalous
    assert out[0].zscore is None and out[1].zscore is None


def test_rolling_zscore_zero_variance_guard(spark):
    rows = [("s", t(60 * i), 5.0) for i in range(10)]
    tier = spark.createDataFrame(rows, "series_id string, bucket_ts timestamp, avg double")
    out = rolling_zscore(tier, n_window=24, value_col="avg").collect()
    assert all(r.zscore is None for r in out)
    assert not any(r.is_anomaly for r in out)


def test_ewma_parallel_equals_sequential(spark):
    """Two-level chunked EWMA == the sequential recurrence, across several
    chunk sizes (so real cross-chunk carries are exercised)."""
    from afspark.operators.tsanalytics import ewma

    rng = np.random.default_rng(7)
    n = 5000
    rows = [
        (s, t(7 * i), float(v))
        for s in ("a", "b")
        for i, v in enumerate(rng.normal(size=n))
    ]
    pts = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    alpha = 0.05

    def seq_twin(vals):
        y, out = 0.0, []
        for x in vals:
            y = (1 - alpha) * y + alpha * x
            out.append(y)
        return np.array(out)

    expect = {}
    by_series = {"a": [], "b": []}
    for s, tt, v in rows:
        by_series[s].append((tt, v))
    for s, sv in by_series.items():
        sv.sort()
        expect[s] = seq_twin([v for _, v in sv])

    for chunk_seconds in (3600, 86_400, 10 * 86_400):
        out = ewma(pts, alpha, chunk_seconds=chunk_seconds)
        got = {}
        for r in out.collect():
            got.setdefault(r.series_id, []).append((r.ts, r.ewma))
        for s in ("a", "b"):
            got_vals = np.array([v for _, v in sorted(got[s])])
            np.testing.assert_allclose(got_vals, expect[s], rtol=1e-12, atol=1e-13)


def test_topk_per_bucket_deterministic_ties(spark):
    """Counts and deterministic tie-break (alphabetical at equal n)."""
    from afspark.operators.tsanalytics import topk_per_bucket

    rows = (
        [("x",)] * 3 + [("b",)] * 2 + [("a",)] * 2 + [("z",)] * 1
    )
    pts = spark.createDataFrame(
        [(t(i), r[0]) for i, r in enumerate(rows)], "ts timestamp, event_type string"
    )
    out = sorted((r.rk, r.event_type, r.n) for r in topk_per_bucket(pts, 3600, k=3).collect())
    assert out == [(1, "x", 3), (2, "a", 2), (3, "b", 2)]


def test_counter_increase_chunked_equals_single_window(spark):
    """The two-level chunk decomposition must reproduce the single
    per-series window bit-for-bit, including resets that land exactly on
    a chunk boundary and duplicate timestamps straddling one."""
    rng = np.random.default_rng(5)
    rows = []
    for sid in ("a", "b"):
        ts = 0
        v = 0.0
        for _ in range(200):
            ts += int(rng.integers(1, 8))
            if rng.random() < 0.1:
                v = float(rng.integers(0, 3))      # reset
            else:
                v += float(rng.integers(0, 5))
            rows.append((sid, t(ts), v))
            if rng.random() < 0.15:
                rows.append((sid, t(ts), v + 1.0))  # duplicate timestamp
    # boundary-exact rows: ts at an exact multiple of the chunk size
    rows += [("a", t(40), 100.0), ("a", t(80), 2.0)]
    # legitimate NULL values, mid-chunk AND as a chunk's last row: the
    # row after a null-valued row must get increase=null in BOTH paths
    # (a bare coalesce(_lp, _carry) would wrongly substitute the carry)
    rows += [("a", t(121), None), ("a", t(122), 6.0),
             ("a", t(159), None), ("a", t(161), 9.0)]
    pts = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")

    key = lambda r: (  # noqa: E731
        r.series_id, r.ts, r.value is not None, r.value or 0.0
    )
    chunked = sorted(counter_increase(pts, chunk_seconds=40).collect(), key=key)
    single = sorted(counter_increase(pts, chunk_seconds=None).collect(), key=key)
    assert [r.increase for r in chunked] == [r.increase for r in single]
    assert [tuple(r) for r in chunked] == [tuple(r) for r in single]


def test_counter_increase_plan_is_chunked(spark):
    """Scale shape: the data-sized window partitions by (series, chunk) —
    never by series alone — so one hot series cannot serialize into a
    single sort task.  The only series-keyed window runs over the tiny
    one-row-per-chunk carry aggregate."""
    pts = spark.createDataFrame(
        [("s", t(i * 7), float(i)) for i in range(50)],
        "series_id string, ts timestamp, value double",
    )
    out = counter_increase(pts, chunk_seconds=60)
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = [ln for ln in plan.splitlines() if "windowspecdefinition" in ln]
    assert specs, plan
    data_windows = [s for s in specs if "_chunk" in s]
    assert data_windows, f"no (series, chunk) window found:\n{plan}"
    # the carry window (series-only partition) consumes _last, the
    # one-row-per-chunk aggregate — every other window must be chunked
    for s in specs:
        if "_chunk" not in s.split("windowspecdefinition", 1)[1].split(",")[1]:
            assert "_last" in s, f"series-only window over raw rows:\n{s}"


def test_counter_resets_flag(spark):
    """[5, 7, 3, 10]: is_reset = [null, 0, 1, 0]; bucket sums skip heads."""
    pts = spark.createDataFrame(
        [("s", t(0), 5.0), ("s", t(10), 7.0), ("s", t(20), 3.0), ("s", t(30), 10.0)],
        "series_id string, ts timestamp, value double",
    )
    rows = sorted(counter_increase(pts).collect(), key=lambda r: r.ts)
    assert [r.is_reset for r in rows] == [None, 0, 1, 0]
    b = rate_per_bucket(pts, 3600).collect()[0]
    assert b.reset_count == 1


def test_instant_delta_last_two_and_reset(spark):
    """Bucket [5@0, 7@10, 3@20]: last two are 3 and 7 -> reset -> idelta=3,
    gap 10s, irate 0.3; a single-sample bucket emits nulls."""
    from afspark.operators.tsanalytics import instant_delta_per_bucket

    pts = spark.createDataFrame(
        [
            ("s", t(0), 5.0),
            ("s", t(10), 7.0),
            ("s", t(20), 3.0),
            ("s", t(4000), 9.0),
        ],
        "series_id string, ts timestamp, value double",
    )
    out = {
        int(r["bucket_ts"].timestamp()) % 86400: r
        for r in instant_delta_per_bucket(pts, 3600).collect()
    }
    b0, b1 = out[0], out[3600]
    assert (b0.idelta, b0.gap_s) == (3.0, 10)
    assert abs(b0.irate - 0.3) < 1e-12
    assert (b1.idelta, b1.gap_s, b1.irate) == (None, None, None)


def test_instant_delta_monotone_counter(spark):
    """No reset: idelta is the plain last-two delta."""
    from afspark.operators.tsanalytics import instant_delta_per_bucket

    pts = spark.createDataFrame(
        [("s", t(0), 5.0), ("s", t(100), 8.0), ("s", t(200), 13.0)],
        "series_id string, ts timestamp, value double",
    )
    r = instant_delta_per_bucket(pts, 3600).collect()[0]
    assert (r.idelta, r.gap_s, r.irate) == (5.0, 100, 0.05)


def test_deriv_exact_line(spark):
    """Points ON a line recover its slope exactly; predict extrapolates
    from the bucket start."""
    from afspark.operators.tsanalytics import deriv_per_bucket

    pts = spark.createDataFrame(
        [("s", t(0), 1.0), ("s", t(10), 3.0), ("s", t(20), 5.0)],
        "series_id string, ts timestamp, value double",
    )
    r = deriv_per_bucket(pts, 3600, horizon_seconds=100).collect()[0]
    assert r.n == 3
    assert r.slope_per_sec == 0.2
    assert r.predict == 1.0 + 0.2 * 100


def test_deriv_degenerate_buckets(spark):
    """<2 samples or zero time spread -> null slope (det == 0 guard)."""
    from afspark.operators.tsanalytics import deriv_per_bucket

    pts = spark.createDataFrame(
        [("a", t(0), 1.0), ("b", t(5), 1.0), ("b", t(5), 9.0)],
        "series_id string, ts timestamp, value double",
    )
    rows = {r.series_id: r for r in deriv_per_bucket(pts, 3600).collect()}
    assert rows["a"].slope_per_sec is None
    assert rows["b"].slope_per_sec is None  # both samples at t=5 -> det=0


def test_seasonal_zscore_same_phase_baseline(spark):
    """The 10:00 bucket is judged against prior 10:00 buckets only: a
    spike vs a [10, 12, 14] same-hour history is anomalous, while an
    identical value at a different hour with flat history stays null."""
    from afspark.operators.rollup import rollup_points
    from afspark.operators.tsanalytics import seasonal_zscore

    day = 86400
    rows = []
    # hour 10 on days 0..2: values 10, 12, 14; day 3: spike 100
    for d, v in [(0, 10.0), (1, 12.0), (2, 14.0), (3, 100.0)]:
        rows.append(("s", t(d * day + 10 * 3600), v))
    # hour 5, flat history: variance 0 -> z must stay null
    for d in range(4):
        rows.append(("s", t(d * day + 5 * 3600), 7.0))
    pts = spark.createDataFrame(
        rows, "series_id string, ts timestamp, value double"
    )
    tier = rollup_points(pts, 3600)
    out = seasonal_zscore(tier, 3600, season_buckets=24, n_periods=3)
    got = {
        (r["bucket_ts"].day - 1, r["bucket_ts"].hour): r for r in out.collect()
    }
    spike = got[(3, 10)]
    # baseline mean 12, sample std 2 -> z = (100-12)/2 = 44
    assert spike.baseline_n == 3
    assert abs(spike.zscore - 44.0) < 1e-9
    assert spike.is_anomaly
    flat = got[(3, 5)]
    assert flat.zscore is None and not flat.is_anomaly
    # first occurrence of a phase has no baseline at all
    assert got[(0, 10)].baseline_n == 0


def test_holt_chunked_equals_sequential(spark):
    """The 2x2-matrix-carry decomposition matches the single-task
    sequential recurrence to reassociation round-off."""
    import numpy as np

    from afspark.operators.tsanalytics import holt_linear

    rng = np.random.default_rng(11)
    rows = [
        (sid, t(i * 700 + int(rng.integers(0, 600))), float(round(v, 2)))
        for sid in ["a", "b"]
        for i, v in enumerate(rng.normal(50, 10, 300))
    ]
    pts = spark.createDataFrame(
        rows, "series_id string, ts timestamp, value double"
    )
    key = lambda r: (r.series_id, r.ts, r.value)  # noqa: E731
    c = sorted(holt_linear(pts, 0.3, 0.1, chunk_seconds=86400).collect(), key=key)
    s = sorted(holt_linear(pts, 0.3, 0.1, chunk_seconds=None).collect(), key=key)
    for rc, rs in zip(c, s):
        assert rc.level == pytest.approx(rs.level, rel=1e-9)
        assert rc.trend == pytest.approx(rs.trend, rel=1e-9, abs=1e-9)


def test_holt_matches_classic_recurrence(spark):
    """Matrix form == the textbook (l, b) update, and on a pure linear
    ramp the trend converges to the slope."""
    from afspark.operators.tsanalytics import holt_linear

    n, slope = 200, 3.0
    pts = spark.createDataFrame(
        [("s", t(i * 60), 5.0 + slope * i) for i in range(n)],
        "series_id string, ts timestamp, value double",
    )
    out = sorted(
        holt_linear(pts, 0.5, 0.3, chunk_seconds=3600).collect(),
        key=lambda r: r.ts,
    )
    # classic twin
    l = b = 0.0
    for i in range(n):
        lp = l
        x = 5.0 + slope * i
        l = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (l - lp) + 0.7 * b
    assert out[-1].level == pytest.approx(l, rel=1e-9)
    assert out[-1].trend == pytest.approx(b, rel=1e-9)
    # zero-init Holt on a ramp converges to the per-step slope
    assert out[-1].trend == pytest.approx(slope, rel=1e-6)
    assert out[-1].level == pytest.approx(5.0 + slope * (n - 1), rel=1e-3)


def test_cross_correlation_planted_signals(spark):
    """b mirrors a exactly (corr 1 at lag 0); c is a shifted copy of a
    (corr 1 at lag 1, weaker at lag 0); anti-correlated d hits -1."""
    from afspark.operators.tsanalytics import lagged_cross_correlation

    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(100, 20, 48)
    rows = []
    for i, v in enumerate(base):
        rows.append(("a", t(i * 3600), float(round(v, 2))))
        rows.append(("b", t(i * 3600), float(round(2 * v + 7, 2))))   # affine copy
        rows.append(("d", t(i * 3600), float(round(-v, 2))))          # anti
        if i + 1 < len(base):
            rows.append(("c", t((i + 1) * 3600), float(round(v, 2))))  # a shifted +1h
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    )
    out = {
        (r.a_series_id, r.b_series_id, r.lag): r
        for r in lagged_cross_correlation(
            tier, 3600, lags=[0, 1], min_overlap=12, value_col="sum"
        ).collect()
    }
    assert out[("a", "b", 0)].corr == pytest.approx(1.0)
    assert out[("a", "d", 0)].corr == pytest.approx(-1.0)
    assert out[("a", "c", 1)].corr == pytest.approx(1.0)
    # the shifted pair at lag 0 correlates only by chance
    assert abs(out[("a", "c", 0)].corr) < 0.5
    # overlap bookkeeping: lag-1 pairs lose one bucket
    assert out[("a", "b", 1)].n == 47


def test_cross_correlation_zero_variance_guard(spark):
    from afspark.operators.tsanalytics import lagged_cross_correlation

    rows = [("a", t(i * 3600), 5.0) for i in range(20)] + [
        ("b", t(i * 3600), float(i)) for i in range(20)
    ]
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    )
    out = lagged_cross_correlation(
        tier, 3600, lags=[0], min_overlap=5, value_col="sum"
    ).collect()
    assert len(out) == 1 and out[0].corr is None  # flat series -> null


def _cross_corr_block_fixture(spark, n_domains=3, n_series=4, n_buckets=24):
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for d in range(n_domains):
        for s in range(n_series):
            for i in range(n_buckets):
                rows.append(
                    (f"d{d}", f"s{s}", t(i * 3600), float(rng.integers(1, 100)))
                )
    return spark.createDataFrame(
        rows, "domain string, series_id string, bucket_ts timestamp, sum double"
    )


def test_cross_correlation_block_keys_bound_fanout(spark):
    """block_keys folds the domain into the join key: no cross-domain
    pairs, per-bucket fan-out bounded by the block size, and the
    physical join keys carry the block column (shuffle partitions on
    it, not on the bucket alone)."""
    from afspark.operators.tsanalytics import lagged_cross_correlation

    tier = _cross_corr_block_fixture(spark)
    out = lagged_cross_correlation(
        tier,
        3600,
        lags=[0],
        min_overlap=5,
        keys=["domain", "series_id"],
        block_keys=["domain"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "a_domain" in plan.split("Join")[1][:400]  # block key in join keys
    rows = out.collect()
    assert rows, "blocked cross-corr produced no pairs"
    assert all(r.a_domain == r.b_domain for r in rows)
    # per-block ordered pairs of 4 series = C(4,2) = 6, times 3 domains
    assert len(rows) == 18
    # unblocked run on the same tier pairs across domains too
    un = lagged_cross_correlation(
        tier, 3600, lags=[0], min_overlap=5, keys=["domain", "series_id"]
    ).collect()
    assert len(un) == 66  # C(12,2)


def test_cross_correlation_fanout_guard_fails_fast(spark):
    from afspark.operators.tsanalytics import lagged_cross_correlation

    tier = _cross_corr_block_fixture(spark)
    # 12 series x 24 buckets -> estimate 24*144 = 3456 pairs > 100.
    # The guard is lazy (construction stays job-free); it fires when the
    # job runs, from the raise_error broadcast that gates the pair join.
    over = lagged_cross_correlation(
        tier,
        3600,
        lags=[0],
        keys=["domain", "series_id"],
        max_pair_estimate=100,
    )
    with pytest.raises(Exception, match="max_pair_estimate"):
        over.collect()
    # blocking brings the estimate under the same cap: 24*3*16 = 1152...
    # still over 100, but candidate_top_k=1 per domain -> 24*3*1 = 72 <= 100
    out = lagged_cross_correlation(
        tier,
        3600,
        lags=[0],
        min_overlap=5,
        keys=["domain", "series_id"],
        block_keys=["domain"],
        candidate_top_k=1,
        max_pair_estimate=100,
    ).collect()
    assert out == []  # one series per block -> no pairs, but no blowup


def test_cross_correlation_candidate_top_k(spark):
    """top-k-by-variance candidate select keeps the k liveliest series
    (deterministic tiebreak) and pairs only those."""
    from afspark.operators.tsanalytics import lagged_cross_correlation

    rows = []
    amp = {"a": 100.0, "b": 50.0, "c": 1.0, "d": 0.0}
    for s, a in amp.items():
        for i in range(24):
            rows.append((s, t(i * 3600), a * (i % 2) + 5.0))
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    )
    out = lagged_cross_correlation(
        tier, 3600, lags=[0], min_overlap=5, candidate_top_k=2
    ).collect()
    assert {(r.a_series_id, r.b_series_id) for r in out} == {("a", "b")}
    assert out[0].corr == pytest.approx(1.0)  # same square wave


def test_cross_correlation_block_keys_must_be_subset(spark):
    from afspark.operators.tsanalytics import lagged_cross_correlation

    tier = _cross_corr_block_fixture(spark)
    with pytest.raises(ValueError, match="subset"):
        lagged_cross_correlation(
            tier, 3600, keys=["series_id"], block_keys=["domain"]
        )


def test_alert_firing_hysteresis_and_gap_reset(spark):
    """for:3 alerting: fires on the 3rd consecutive exceeding bucket,
    clears on a dip, and a MISSING bucket resets the pending run."""
    from afspark.operators.tsanalytics import alert_firing

    # hours: 0,1,2 exceed (fires at 2); 3 dips; 4,5 exceed (pending only);
    # 7,8,9 exceed but hour 6 is MISSING so the gap after 5 resets: fires at 9
    vals = {0: 9.0, 1: 9.0, 2: 9.0, 3: 1.0, 4: 9.0, 5: 9.0, 7: 9.0, 8: 9.0, 9: 9.0}
    tier = spark.createDataFrame(
        [("s", t(h * 3600), v) for h, v in vals.items()],
        "series_id string, bucket_ts timestamp, sum double",
    )
    out = {
        r.bucket_ts.hour: r
        for r in alert_firing(tier, 3600, threshold=5.0, for_buckets=3).collect()
    }
    assert [out[h].firing for h in (0, 1, 2)] == [False, False, True]
    assert out[3].firing is False and out[3].pending_n == 0
    assert [out[h].pending_n for h in (4, 5)] == [1, 2]
    assert not out[5].firing
    # gap at hour 6: hours 7-9 are a fresh island even though 5 exceeded
    assert [out[h].pending_n for h in (7, 8, 9)] == [1, 2, 3]
    assert [out[h].firing for h in (7, 8, 9)] == [False, False, True]


def test_cusum_closed_form_equals_recurrence(spark):
    """The (cumsum − running min) closed form == the sequential
    max(0, s+d) recurrence exactly, and a planted mean shift alarms on
    the high side only."""
    from afspark.operators.tsanalytics import cusum_detect

    vals = [10.0, 11.0, 9.0, 10.0, 30.0, 31.0, 29.0, 30.0, 10.0, 9.0]
    tier = spark.createDataFrame(
        [("s", t(i * 3600), v) for i, v in enumerate(vals)],
        "series_id string, bucket_ts timestamp, sum double",
    )
    target, slack, h = 10.0, 1.0, 30.0
    out = sorted(
        cusum_detect(tier, target, slack, h).collect(), key=lambda r: r.bucket_ts
    )
    s_hi = s_lo = 0.0
    for r, x in zip(out, vals):
        s_hi = max(0.0, s_hi + (x - target - slack))
        s_lo = max(0.0, s_lo - (x - target) - slack)
        assert r.cusum_hi == s_hi and r.cusum_lo == s_lo
    # alarm from the 2nd shifted bucket; the statistic DECAYS slowly after
    # the shift ends (that is CUSUM's memory), so the tail stays alarmed
    assert [r.alarm for r in out] == [False] * 5 + [True] * 5
    assert all(r.cusum_lo == 0.0 for r in out[:9])


def test_cusum_downward_shift_alarms_low_side(spark):
    from afspark.operators.tsanalytics import cusum_detect

    vals = [10.0] * 4 + [0.0] * 5
    tier = spark.createDataFrame(
        [("s", t(i * 3600), v) for i, v in enumerate(vals)],
        "series_id string, bucket_ts timestamp, sum double",
    )
    out = sorted(
        cusum_detect(tier, 10.0, 1.0, 25.0).collect(), key=lambda r: r.bucket_ts
    )
    assert out[-1].cusum_lo == 45.0 - 0.0  # 5 * (10 - 1) after the drop
    assert not any(r.alarm for r in out[:6])
    assert out[-1].alarm


def test_time_weighted_avg_locf_segments(spark):
    """Hand-computed LOCF integral; the bucket's last point contributes
    no duration, and buckets are independent (no cross-bucket segment)."""
    from afspark.operators.tsanalytics import time_weighted_avg

    day = 86400
    pts = spark.createDataFrame(
        [
            # bucket 0: v=10 holds 10s, v=20 holds 20s, v=7 dangles
            ("s", 1, t(0), 10.0),
            ("s", 2, t(10), 20.0),
            ("s", 3, t(30), 7.0),
            # bucket 1: single point -> zero duration
            ("s", 4, t(day + 100), 99.0),
            # other series independent
            ("u", 1, t(5), 4.0),
            ("u", 2, t(15), 6.0),
        ],
        "series_id string, seq long, ts timestamp, value double",
    )
    rows = {
        (r.series_id, r.bucket_epoch): r
        for r in time_weighted_avg(pts, day).collect()
    }
    base = rows[("s", 1704067200 // day * day)]  # 2024-01-01 bucket
    assert base.n_points == 3
    assert base.twa_num == 10 * 10 + 20 * 20  # = 500
    assert base.dur_s == 30
    nxt = rows[("s", (1704067200 + day) // day * day)]
    assert nxt.n_points == 1 and nxt.twa_num == 0 and nxt.dur_s == 0
    other = rows[("u", 1704067200 // day * day)]
    assert other.twa_num == 4 * 10 and other.dur_s == 10


def test_time_weighted_avg_same_second_tie(spark):
    """Same-epoch-second samples: seq breaks the tie; the earlier one
    holds for 0s so only the later value carries forward."""
    from afspark.operators.tsanalytics import time_weighted_avg

    pts = spark.createDataFrame(
        [("s", 1, t(0), 100.0), ("s", 2, t(0), 3.0), ("s", 3, t(10), 0.0)],
        "series_id string, seq long, ts timestamp, value double",
    )
    r = time_weighted_avg(pts, 86400).collect()[0]
    assert r.twa_num == 3 * 10 and r.dur_s == 10


def test_state_durations_threshold(spark):
    """value>5 is 'high'; durations follow the LOCF segments."""
    from afspark.operators.tsanalytics import state_durations

    pts = spark.createDataFrame(
        [
            ("s", 1, t(0), 10.0),   # high, holds 10s
            ("s", 2, t(10), 2.0),   # low, holds 5s
            ("s", 3, t(15), 8.0),   # high, holds 15s
            ("s", 4, t(30), 1.0),   # low, dangles (0s)
        ],
        "series_id string, seq long, ts timestamp, value double",
    )
    got = {
        r.state: (r.n_segments, r.dur_s)
        for r in state_durations(pts, 86400, threshold=5.0).collect()
    }
    assert got["high"] == (2, 25)
    assert got["low"] == (2, 5)


def test_time_weighted_avg_interpolated_spans_gap_buckets(spark):
    """A segment spanning empty buckets covers them; duplicate-ts
    zero-length segments are dropped before the bucket explode."""
    import datetime as dtm

    from afspark.operators.tsanalytics import time_weighted_avg_interpolated

    t0 = dtm.datetime(2024, 1, 1)
    rows = [
        # v=10 holds 30s, then a duplicate-ts pair (zero-length segment),
        # then v=20 holds across 2.5 empty minutes into minute 3
        ("s", 1, t0, 10.0),
        ("s", 2, t0 + dtm.timedelta(seconds=30), 20.0),
        ("s", 3, t0 + dtm.timedelta(seconds=30), 99.0),  # tie: seq 2's segment is zero-length; seq 3 carries
        ("s", 4, t0 + dtm.timedelta(seconds=210), 5.0),
        ("s", 5, t0 + dtm.timedelta(seconds=240), 7.0),  # last: extrapolates nothing
    ]
    pts = spark.createDataFrame(
        rows, "series_id string, seq long, ts timestamp, value double"
    )
    out = {
        r.bucket_epoch: r
        for r in time_weighted_avg_interpolated(pts, 60).collect()
    }
    e0 = int(t0.timestamp())
    # minute 0: 10*30 + (20 or 99)*30 — the tie row's segment is
    # zero-length so value 99 contributes nothing; 20 holds from :30
    b0 = out[e0]
    assert b0.dur_s == 60
    assert b0.twa_num in (10 * 30 + 20 * 30, 10 * 30 + 99 * 30)
    # the LOCF carrier across the gap: which of 20/99 holds is the tie's
    # seq order — seq 3 (99.0) is the later row, so 99 carries
    assert b0.twa_num == 10 * 30 + 99 * 30
    # minutes 1 and 2: fully inside the 99-segment (empty buckets covered)
    assert (out[e0 + 60].twa_num, out[e0 + 60].dur_s) == (99 * 60, 60)
    assert (out[e0 + 120].twa_num, out[e0 + 120].dur_s) == (99 * 60, 60)
    # minute 3: 99 holds 30s then 5 holds 30s; last sample (7) adds 0
    assert (out[e0 + 180].twa_num, out[e0 + 180].dur_s) == (99 * 30 + 5 * 30, 60)
    assert e0 + 240 not in out


def test_uptime_rollup_timeout_and_overlap(spark):
    """Overlapping heartbeats attribute each live second once; a gap
    longer than the timeout is downtime; the last beat covers its full
    timeout window across a bucket boundary."""
    import datetime as dtm

    from afspark.operators.tsanalytics import uptime_rollup

    t0 = dtm.datetime(2024, 1, 1)
    beats = [0, 30, 60, 300]  # dense overlap, then a long gap
    rows = [("s", i + 1, t0 + dtm.timedelta(seconds=b)) for i, b in enumerate(beats)]
    # last beat 30s before a minute boundary: timeout spills into next bucket
    rows.append(("s", 5, t0 + dtm.timedelta(seconds=570)))
    pts = spark.createDataFrame(rows, "series_id string, seq long, ts timestamp")
    out = {
        r.bucket_epoch: r for r in uptime_rollup(pts, 600, 120).collect()
    }
    e0 = int(t0.timestamp())
    # coverage: [0,30)+[30,60)+[60,180) = 180s, [300,420) = 120s,
    # [570,600) = 30s in bucket 0 -> 330; [600,690) = 90 in bucket 1
    assert (out[e0].up_s, out[e0].n_beats) == (330, 5)
    assert (out[e0 + 600].up_s, out[e0 + 600].n_beats) == (90, 1)


def test_burn_rate_multiwindow_gating(spark):
    """Long window alone must not fire (blip suppression); both windows
    above threshold fires; short window resets promptly post-incident."""
    import datetime as dtm

    from afspark.operators.tsanalytics import burn_rate_alerts

    t0 = dtm.datetime(2024, 1, 1)
    rows = []
    # buckets 0..5: 10 requests each; errors: burst of 8 in buckets 2,3
    # then clean. budget=0.25, burn 2.0 -> thr 0.5
    errs = {2: 8, 3: 8}
    for b in range(6):
        ne = errs.get(b, 0)
        for i in range(10):
            rows.append(
                ("s", t0 + dtm.timedelta(seconds=b * 60 + i), 1 if i < ne else 0)
            )
    ev = spark.createDataFrame(rows, "series_id string, ts timestamp, is_error int")
    out = {
        int((r.bucket_epoch - int(t0.timestamp()))) // 60: r
        for r in burn_rate_alerts(
            ev, 60, slo_target=0.75, long_buckets=4, short_buckets=1,
            burn_factor=2.0, threshold_ratio=(1, 2),
        ).collect()
    }
    # bucket 2: long ratio 8/30 < .5? (buckets 0..2: 8 err/30) -> no?
    # short = 8/10 > .5 but long 8/30 < .5 -> suppressed
    assert not out[2].firing
    # bucket 3: long = 16/40 < .5 -> still suppressed? 0.4 < 0.5 yes
    assert not out[3].firing
    # craft sanity: verify window sums themselves
    assert (out[3].err_long, out[3].tot_long) == (16, 40)
    assert (out[3].err_short, out[3].tot_short) == (8, 10)
    # a sustained burn: all buckets erroring
    rows2 = [
        ("s", t0 + dtm.timedelta(seconds=b * 60 + i), 1 if i < 7 else 0)
        for b in range(4)
        for i in range(10)
    ]
    ev2 = spark.createDataFrame(rows2, "series_id string, ts timestamp, is_error int")
    out2 = sorted(
        burn_rate_alerts(
            ev2, 60, slo_target=0.75, long_buckets=4, short_buckets=1,
            burn_factor=2.0, threshold_ratio=(1, 2),
        ).collect(),
        key=lambda r: r.bucket_epoch,
    )
    assert all(r.firing for r in out2)
    # exact boundary: err == thr*tot must NOT fire (strict >), the case
    # float thresholds flap on
    rows3 = [
        ("s", t0 + dtm.timedelta(seconds=i), 1 if i < 5 else 0)
        for i in range(10)
    ]
    ev3 = spark.createDataFrame(rows3, "series_id string, ts timestamp, is_error int")
    r3 = burn_rate_alerts(
        ev3, 60, slo_target=0.75, long_buckets=1, short_buckets=1,
        burn_factor=2.0, threshold_ratio=(1, 2),
    ).collect()[0]
    assert (r3.err_long, r3.tot_long) == (5, 10)
    assert not r3.firing


def test_seasonal_holt_indices_and_chunk_equivalence(spark):
    from afspark.operators.tsanalytics import seasonal_holt

    # 6 days, 4 phases of 6h; value = series base + planted phase offset
    base = {"u1": 100.0, "u2": 40.0}
    offs = [10.0, -5.0, 0.0, -5.0]  # mean 0 per series
    rows = []
    for sid, b in base.items():
        for d in range(6):
            for p in range(4):
                t = dtm.datetime(2024, 1, 1 + d, 6 * p, 30)
                rows.append((sid, t, b + offs[p] + 0.01 * d))
    pts = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")

    sm, idx = seasonal_holt(pts, 0.3, 0.1, 86400, 4, chunk_seconds=86400)
    got_idx = {(r.series_id, r._phase): r.seasonal_index for r in idx.collect()}
    # planted offsets recovered exactly (trend part is phase-constant:
    # every phase sees the same 0.01*d drift, so it cancels in the index)
    for sid in base:
        for p in range(4):
            assert got_idx[(sid, p)] == pytest.approx(offs[p], abs=1e-12)

    seq_sm, _ = seasonal_holt(pts, 0.3, 0.1, 86400, 4, chunk_seconds=None)
    a = {(r.series_id, r.ts): (r.level, r.trend) for r in sm.collect()}
    b = {(r.series_id, r.ts): (r.level, r.trend) for r in seq_sm.collect()}
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == pytest.approx(b[k][0], rel=1e-9, abs=1e-9)
        assert a[k][1] == pytest.approx(b[k][1], rel=1e-9, abs=1e-9)


def test_seasonal_holt_rejects_bad_phase_split(spark):
    from afspark.operators.tsanalytics import seasonal_holt

    pts = spark.createDataFrame(
        [("a", dtm.datetime(2024, 1, 1), 1.0)],
        "series_id string, ts timestamp, value double",
    )
    with pytest.raises(ValueError):
        seasonal_holt(pts, 0.3, 0.1, period_seconds=86400, n_phases=7)


def test_changes_per_bucket_reset_to_zero_counts_as_change(spark):
    from afspark.operators.tsanalytics import changes_per_bucket

    t0 = dtm.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        ("a", t0 + dtm.timedelta(seconds=10), 5.0),   # head: no pair
        ("a", t0 + dtm.timedelta(seconds=20), 5.0),   # unchanged
        ("a", t0 + dtm.timedelta(seconds=30), 0.0),   # reset, increase==0.0 -> CHANGED
        ("a", t0 + dtm.timedelta(seconds=40), 3.0),   # up -> changed
        ("a", t0 + dtm.timedelta(seconds=3700), 3.0), # 2nd bucket, unchanged pair
    ]
    pts = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    got = {
        (r.series_id, r.bucket_ts.minute + 60 * r.bucket_ts.hour): (
            r.n_changes, r.n_samples)
        for r in changes_per_bucket(pts, 3600).collect()
    }
    assert got[("a", 0)] == (2, 4)
    assert got[("a", 60)] == (0, 1)
    # chunked == single-window
    seq = {
        (r.series_id, r.bucket_ts): (r.n_changes, r.n_samples)
        for r in changes_per_bucket(pts, 3600, chunk_seconds=None).collect()
    }
    chk = {
        (r.series_id, r.bucket_ts): (r.n_changes, r.n_samples)
        for r in changes_per_bucket(pts, 3600, chunk_seconds=15).collect()
    }
    assert seq == chk


def test_rolling_percentile_range_frame_respects_gaps(spark):
    from afspark.operators.tsanalytics import rolling_percentile

    t0 = dtm.datetime(2024, 1, 1)
    rows = [
        ("a", t0 + dtm.timedelta(hours=0), 10.0),
        ("a", t0 + dtm.timedelta(hours=1), 20.0),
        ("a", t0 + dtm.timedelta(hours=2), 40.0),
        ("a", t0 + dtm.timedelta(hours=30), 7.0),  # > 24h after the rest
    ]
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, value double"
    )
    out = {r.bucket_ts.hour + 24 * (r.bucket_ts.day - 1): r
           for r in rolling_percentile(tier, 0.95, 24, 3600).collect()}
    assert out[0].rolling_p == pytest.approx(10.0)
    assert out[1].rolling_p == pytest.approx(
        np.percentile([10.0, 20.0], 95, method="linear"))
    assert out[2].rolling_p == pytest.approx(
        np.percentile([10.0, 20.0, 40.0], 95, method="linear"))
    # gap: the stale buckets fell OUT of the 24-bucket range frame
    assert out[30].rolling_p == pytest.approx(7.0)
    assert out[30].n_window == 1


def test_holt_winters_chunked_equals_sequential(spark):
    """The (m+2)-dim matrix-carry decomposition matches the single-task
    sequential Holt-Winters recurrence to reassociation round-off."""
    from afspark.operators.tsanalytics import holt_winters_fit

    rng = np.random.default_rng(7)
    rows = [
        (sid, t(i * 700 + int(rng.integers(0, 600))), float(round(v, 2)))
        for sid in ["a", "b"]
        for i, v in enumerate(rng.normal(50, 10, 400))
    ]
    pts = spark.createDataFrame(
        rows, "series_id string, ts timestamp, value double"
    )
    c = {r.series_id: r
         for r in holt_winters_fit(pts, 0.3, 0.1, 0.2, 86400, 24,
                                   chunk_seconds=86400).collect()}
    s = {r.series_id: r
         for r in holt_winters_fit(pts, 0.3, 0.1, 0.2, 86400, 24,
                                   chunk_seconds=None).collect()}
    assert set(c) == {"a", "b"}
    for sid in c:
        rc, rs = c[sid], s[sid]
        assert (rc.n, rc.last_es) == (rs.n, rs.last_es)
        assert rc.level == pytest.approx(rs.level, rel=1e-9)
        assert rc.trend == pytest.approx(rs.trend, rel=1e-9, abs=1e-9)
        assert len(rc.seasonals) == 24
        for x, y in zip(rc.seasonals, rs.seasonals):
            assert x == pytest.approx(y, rel=1e-9, abs=1e-9)


def test_holt_winters_matches_classic_recurrence(spark):
    """Matrix form == the textbook phase-indexed additive HW update
    (s_t = g*(y - l_prev - b_prev) + (1-g)*s_phase), and on a pure
    seasonal signal the seasonal slots recover the offset ORDERING."""
    from afspark.operators.tsanalytics import holt_winters_fit

    period, m, pw = 240, 4, 60
    season = [0.0, 10.0, -5.0, 2.0]
    base = int(t(0).replace(tzinfo=dtm.timezone.utc).timestamp())
    n = 400
    es_list = [base + i * 60 for i in range(n)]
    xs = [100.0 + season[(es % period) // pw] for es in es_list]
    pts = spark.createDataFrame(
        [("s", t(i * 60), xs[i]) for i in range(n)],
        "series_id string, ts timestamp, value double",
    )
    row = holt_winters_fit(
        pts, 0.3, 0.05, 0.3, period, m, chunk_seconds=3600
    ).collect()[0]
    a, be, g = 0.3, 0.05, 0.3
    l = b = 0.0
    sv = [0.0] * m
    for es, y in zip(es_list, xs):
        j = (es % period) // pw
        lp, bp = l, b
        l = a * (y - sv[j]) + (1 - a) * (lp + bp)
        b = be * (l - lp) + (1 - be) * bp
        sv[j] = g * (y - lp - bp) + (1 - g) * sv[j]
    assert row.n == n and row.last_es == es_list[-1]
    assert row.level == pytest.approx(l, rel=1e-9)
    assert row.trend == pytest.approx(b, rel=1e-9, abs=1e-12)
    for x, y in zip(row.seasonals, sv):
        assert x == pytest.approx(y, rel=1e-9, abs=1e-12)
    # after 100 full cycles the learned slots are ordered like the truth
    got = list(row.seasonals)
    assert sorted(range(m), key=lambda i: got[i]) == sorted(
        range(m), key=lambda i: season[i]
    )


def test_acf_periodic_and_gap_pairing(spark):
    """A period-2 alternating series has ACF -1 at lag 1 and +1 at lag 2;
    join pairing keeps (t, t+1) pairs across a missing middle bucket."""
    from afspark.operators.tsanalytics import autocorrelation

    rows = [
        ("p", t(i * 3600), 10.0 if i % 2 == 0 else -10.0) for i in range(24)
    ]
    # series "g": linear ramp with bucket 10 missing — lag-1 pairs lose
    # (9,10) and (10,11) but (11,12)... survive; lag-2 loses (8,10),(10,12)
    rows += [("g", t(i * 3600), float(i)) for i in range(24) if i != 10]
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    )
    out = {
        (r.series_id, r.lag): r
        for r in autocorrelation(
            tier, 3600, lags=[1, 2], min_overlap=5, value_col="sum"
        ).collect()
    }
    assert out[("p", 1)].acf == pytest.approx(-1.0)
    assert out[("p", 2)].acf == pytest.approx(1.0)
    assert out[("p", 1)].n == 23 and out[("p", 2)].n == 22
    # ramp: perfectly autocorrelated at every lag, gap or not
    assert out[("g", 1)].acf == pytest.approx(1.0)
    assert out[("g", 1)].n == 21  # 23 adjacent pairs minus the two at the gap
    assert out[("g", 2)].n == 20  # 22 lag-2 pairs minus (8,10) and (10,12)


def test_acf_matches_numpy_pearson(spark):
    """ACF at lag L equals numpy's Pearson corr of (x[:-L], x[L:]) on a
    dense series."""
    from afspark.operators.tsanalytics import autocorrelation

    import numpy as np

    rng = np.random.default_rng(11)
    x = np.round(rng.normal(50, 12, 60), 2)
    tier = spark.createDataFrame(
        [("s", t(i * 3600), float(v)) for i, v in enumerate(x)],
        "series_id string, bucket_ts timestamp, sum double",
    )
    out = {
        r.lag: r.acf
        for r in autocorrelation(
            tier, 3600, lags=[1, 3], min_overlap=5, value_col="sum"
        ).collect()
    }
    for lag in (1, 3):
        want = np.corrcoef(x[:-lag], x[lag:])[0, 1]
        assert out[lag] == pytest.approx(float(want), abs=1e-9)


class TestFanoBurstiness:
    def test_hand_golden(self, spark):
        import datetime as dt

        # series A: counts per hour = [3, 0, 1] over a 3-bucket span
        base = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = []
        for off_h, k in [(0, 3), (2, 1)]:
            for i in range(k):
                rows.append(("A", base + dt.timedelta(hours=off_h, minutes=i)))
        df = spark.createDataFrame(rows, "series_id string, ts timestamp")
        from afspark.operators.tsanalytics import fano_burstiness

        out = fano_burstiness(df, 3600).collect()[0]
        # n=[3,0,1]: nb=3, mean=4/3, E[n^2]=10/3, var=10/3-16/9=14/9
        assert out["n_events"] == 4
        assert out["n_buckets"] == 3
        mean, var = 4 / 3, 14 / 9
        assert abs(out["mean_rate"] - mean) < 1e-12
        assert abs(out["fano"] - var / mean) < 1e-12
        sig = var**0.5
        assert abs(out["burstiness"] - (sig - mean) / (sig + mean)) < 1e-12

    def test_poisson_uniform_is_low(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # exactly one event per hour -> var=0 -> fano=0, B=-1
        rows = [("U", base + dt.timedelta(hours=h)) for h in range(48)]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp")
        from afspark.operators.tsanalytics import fano_burstiness

        out = fano_burstiness(df, 3600).collect()[0]
        assert out["fano"] == 0.0
        assert out["burstiness"] == -1.0


class TestTheilSen:
    def test_hand_golden_outlier_resistance(self, spark):
        import datetime as dt
        import numpy as np

        base = dt.datetime(2024, 1, 1)
        # bucket means: hours 0..5 follow v = 10 + 2*h, hour 3 is a wild
        # outlier (1000).  OLS slope would be dragged; Theil-Sen stays 2/h.
        vals = {0: 10, 1: 12, 2: 14, 3: 1000, 4: 18, 5: 20}
        rows = [
            ("A", base + dt.timedelta(hours=h, minutes=1), float(v))
            for h, v in vals.items()
        ]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        from afspark.operators.tsanalytics import theil_sen_trend

        out = theil_sen_trend(df, 3600, 86400).collect()[0]
        assert out["n_buckets"] == 6
        assert out["n_pairs"] == 15
        # numpy twin: median of pairwise slopes between bucket means
        be = np.array(sorted(vals)) * 3600.0
        m = np.array([float(vals[h]) for h in sorted(vals)])
        slopes = [
            (m[j] - m[i]) / (be[j] - be[i])
            for i in range(6) for j in range(i + 1, 6)
        ]
        want_slope = float(np.median(slopes))
        assert abs(out["slope"] - want_slope) < 1e-12
        resid = m - want_slope * be
        assert abs(out["intercept"] - float(np.median(resid))) < 1e-9
        # robustness: the clean trend is 2 per hour
        assert abs(out["slope"] - 2.0 / 3600.0) < 1e-9

    def test_single_bucket_group_emits_nothing(self, spark):
        import datetime as dt

        df = spark.createDataFrame(
            [("A", dt.datetime(2024, 1, 1, 0, 5), 1.0)],
            "series_id string, ts timestamp, value double",
        )
        from afspark.operators.tsanalytics import theil_sen_trend

        assert theil_sen_trend(df, 3600, 86400).count() == 0


class TestPettitt:
    def test_planted_shift_found(self, spark):
        import datetime as dt
        import numpy as np

        base = dt.datetime(2024, 1, 1)
        # level shift at hour 30 of 60: N(10) -> N(30)
        rng = np.random.default_rng(11)
        vals = np.concatenate(
            [rng.normal(10, 1, 30), rng.normal(30, 1, 30)]
        )
        rows = [
            ("A", base + dt.timedelta(hours=h), float(round(v, 2)))
            for h, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        from afspark.operators.tsanalytics import pettitt_changepoint

        out = pettitt_changepoint(df, 3600).collect()[0]
        # U_t maximal exactly at the boundary: K = 30*30 (all pairs
        # across the split agree in sign)
        assert out["k_stat"] == 900
        cp_hour = (out["cp_epoch"] - int(base.timestamp())) // 3600
        assert cp_hour == 29  # last bucket BEFORE the shift
        assert out["p_approx"] < 1e-6

    def test_brute_force_parity(self, spark):
        import datetime as dt
        import numpy as np

        base = dt.datetime(2024, 1, 1)
        rng = np.random.default_rng(5)
        vals = rng.integers(0, 20, size=25)  # plenty of rank ties
        rows = [
            ("B", base + dt.timedelta(hours=h), float(v))
            for h, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        from afspark.operators.tsanalytics import pettitt_changepoint

        out = pettitt_changepoint(df, 3600).collect()[0]
        x = vals.astype(np.int64)
        B = len(x)
        U = [
            sum(
                int(np.sign(int(x[j]) - int(x[i])))
                for i in range(t + 1)
                for j in range(t + 1, B)
            )
            for t in range(B - 1)
        ]
        K = max(abs(u) for u in U)
        first_t = min(t for t, u in enumerate(U) if abs(u) == K)
        assert out["k_stat"] == K
        assert (out["cp_epoch"] - int(base.timestamp())) // 3600 == first_t
        assert out["u_at_cp"] == U[first_t]


class TestSeasonalityStrength:
    def test_pure_seasonal_is_one(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # value depends ONLY on hour-of-day -> eta2 == 1
        rows = [
            ("A", base + dt.timedelta(days=d, hours=h), float(h * 10))
            for d in range(5) for h in range(24)
        ]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        from afspark.operators.tsanalytics import seasonality_strength

        out = seasonality_strength(df).collect()[0]
        assert out["n"] == 120 and out["n_phases"] == 24
        assert abs(out["eta2"] - 1.0) < 1e-9
        assert out["fstat"] is None  # ssw == 0 exactly

    def test_scipy_style_anova_parity(self, spark):
        import datetime as dt
        import numpy as np

        base = dt.datetime(2024, 1, 1)
        rng = np.random.default_rng(9)
        rows, groups = [], {}
        for d in range(10):
            for h in range(6):
                # cents-scale integers: the operator's per-phase unit
                # rounding (<=0.5/phase) is then negligible vs the SS
                v = float((int(rng.integers(0, 50)) + 5 * h) * 100)
                rows.append(("B", base + dt.timedelta(days=d, hours=h), v))
                groups.setdefault(h, []).append(v)
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        from afspark.operators.tsanalytics import seasonality_strength

        out = seasonality_strength(df).collect()[0]
        allv = np.array(sum(groups.values(), []))
        grand = allv.mean()
        ssb = sum(len(g) * (np.mean(g) - grand) ** 2
                  for g in groups.values())
        sst = ((allv - grand) ** 2).sum()
        ssw = sst - ssb
        k, n = len(groups), len(allv)
        assert abs(out["eta2"] - ssb / sst) < 1e-6
        want_f = (ssb / (k - 1)) / (ssw / (n - k))
        assert abs(out["fstat"] - want_f) / want_f < 1e-4


class TestMadAnomalies:
    def test_planted_outlier_only(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        vals = [10.0, 11.0, 9.0, 10.0, 11.0, 9.0, 10.0, 100.0]
        rows = [
            ("A", base + dt.timedelta(hours=h), v)
            for h, v in enumerate(vals)
        ]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        from afspark.operators.tsanalytics import mad_anomalies

        out = sorted(
            mad_anomalies(df, 3600).collect(),
            key=lambda r: r["bucket_epoch"],
        )
        flags = [r["is_anomaly"] for r in out]
        assert flags == [False] * 7 + [True]
        # med=10, MAD=median(|x-10|)=[0,1,1,0,1,1,0,90]->median 1
        r = out[-1]
        assert r["med"] == 10.0 and r["mad"] == 1.0
        assert abs(r["z"] - 0.6745 * 90) < 1e-9

    def test_constant_series_never_flags(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [("C", base + dt.timedelta(hours=h), 5.0) for h in range(10)]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        from afspark.operators.tsanalytics import mad_anomalies

        out = mad_anomalies(df, 3600).collect()
        assert all(r["z"] is None for r in out)
        assert not any(r["is_anomaly"] for r in out)


class TestCompleteness:
    def test_hand_golden(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # present hours: 0,1,2, 6, 10 -> span 11, gaps of 3 and 3
        hours = [0, 1, 2, 6, 10]
        rows = [("A", base + dt.timedelta(hours=h, minutes=m))
                for h in hours for m in (0, 30)]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp")
        from afspark.operators.tsanalytics import completeness

        out = completeness(df, 3600).collect()[0]
        assert out["n_present"] == 5
        assert out["n_span"] == 11
        assert abs(out["completeness"] - 5 / 11) < 1e-12
        assert out["max_gap_buckets"] == 3

    def test_dense_series(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [("D", base + dt.timedelta(hours=h)) for h in range(24)]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp")
        from afspark.operators.tsanalytics import completeness

        out = completeness(df, 3600).collect()[0]
        assert out["completeness"] == 1.0
        assert out["max_gap_buckets"] == 0


class TestIncreaseExtrapolated:
    """increase_extrapolated_per_bucket vs a direct numpy port of
    Prometheus' promql extrapolatedRate (the upstream semantics)."""

    @staticmethod
    def _prom_increase(ts_us, vals, range_start_us, range_end_us):
        import numpy as np

        sel = (ts_us >= range_start_us) & (ts_us < range_end_us)
        t, v = np.asarray(ts_us)[sel], np.asarray(vals)[sel]
        order = np.lexsort((v, t))
        t, v = t[order], v[order]
        if len(t) < 2 or t[-1] == t[0]:
            return None
        deltas = np.diff(v)
        raw = float(np.where(deltas < 0, v[1:], deltas).sum())
        sampled = float(t[-1] - t[0])
        avg = sampled / (len(t) - 1)
        d_start = float(t[0] - range_start_us)
        d_end = float(range_end_us - t[-1])
        if raw > 0 and v[0] >= 0:
            d_zero = sampled * (v[0] / raw)
            if d_zero < d_start:
                d_start = d_zero
        if d_start >= avg * 1.1:
            d_start = avg / 2.0
        if d_end >= avg * 1.1:
            d_end = avg / 2.0
        return raw * ((sampled + d_start + d_end) / sampled)

    def test_matches_prometheus_reference(self, spark):
        import datetime as dt

        import numpy as np

        from afspark.operators.tsanalytics import increase_extrapolated_per_bucket

        rng = np.random.default_rng(7)
        base = dt.datetime(2024, 1, 1)
        rows, per_series = [], {}
        for sid in ("A", "B", "C"):
            # irregular sampling with occasional counter resets
            t_us, counter, cur = [], [], rng.integers(0, 50)
            t = 0.0
            while t < 3 * 3600e6:
                t += float(rng.uniform(30e6, 900e6))
                if t >= 3 * 3600e6:
                    break
                cur = (
                    float(rng.integers(0, 20))
                    if rng.random() < 0.07
                    else cur + float(rng.integers(0, 500))
                )
                t_us.append(int(t))
                counter.append(cur)
            per_series[sid] = (np.array(t_us), np.array(counter, dtype=float))
            rows += [
                (sid, base + dt.timedelta(microseconds=u), float(c))
                for u, c in zip(t_us, counter)
            ]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
        got = {
            (r["series_id"], int(r["bucket_ts"].timestamp())): r["increase"]
            for r in increase_extrapolated_per_bucket(df, 3600).collect()
        }
        base_es = int(base.replace(tzinfo=dt.timezone.utc).timestamp())
        n_checked = 0
        for sid, (t_us, vals) in per_series.items():
            for h in range(3):
                lo, hi = h * 3600 * 10**6, (h + 1) * 3600 * 10**6
                want = self._prom_increase(t_us, vals, lo, hi)
                key = (sid, base_es + h * 3600)
                if want is None:
                    assert key not in got
                else:
                    assert abs(got[key] - want) < 1e-9 * max(1.0, abs(want))
                    n_checked += 1
        assert n_checked >= 6  # the fixture really exercised the math

    def test_full_coverage_extrapolates_to_edges(self, spark):
        """Samples at 0s,60s,...,3540s: d_end (60s) < 1.1*avg (66s) so the
        window extrapolates the raw increase by exactly one sample gap at
        each boundary: increase = raw * 3600/3540."""
        import datetime as dt

        from afspark.operators.tsanalytics import increase_extrapolated_per_bucket

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("S", base + dt.timedelta(seconds=60 * i), float(10 * i))
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
        r = increase_extrapolated_per_bucket(df, 3600).collect()[0]
        assert r["raw_increase"] == 590.0
        assert abs(r["increase"] - 590.0 * 3600 / 3540) < 1e-9


class TestClassicalDecompose:
    def test_linear_plus_seasonal_has_zero_remainder(self, spark):
        """x_t = a*t + s_{t%p} with sum(s)=0: the offset-centered p-MA
        gives trend = a*(t - 0.5), the detrended value is constant per
        phase, so seasonal absorbs it exactly and remainder == 0."""
        import datetime as dt

        from afspark.operators.tsanalytics import classical_decompose

        p, a = 6, 5.0
        s = [3.0, -1.0, 4.0, -2.0, 0.0, -4.0]  # sums to 0
        base = dt.datetime(2024, 1, 1)
        rows = [
            ("S", base + dt.timedelta(hours=t), a * t + s[t % p])
            for t in range(48)
        ]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
        out = classical_decompose(df, 3600, p).collect()
        assert len(out) == 48 - (p - 1)  # full windows only
        t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
        for r in out:
            t = int(r["bucket_ts"].timestamp()) // 3600 - t0
            assert abs(r["trend"] - (a * (t - 0.5))) < 1e-9
            assert abs(r["remainder"]) < 1e-9
            assert abs(r["value"] - (r["trend"] + r["seasonal"] + r["remainder"])) < 1e-9

    def test_calendar_gap_disqualifies_windows(self, spark):
        """Removing one bucket must drop every window whose RANGE frame
        covers it — the frame is indexed by calendar bucket, not rows."""
        import datetime as dt

        from afspark.operators.tsanalytics import classical_decompose

        p = 4
        base = dt.datetime(2024, 1, 1)
        hole = 10
        rows = [
            ("S", base + dt.timedelta(hours=t), float(t))
            for t in range(24) if t != hole
        ]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
        t0 = int(base.replace(tzinfo=dt.timezone.utc).timestamp()) // 3600
        got = {
            int(r["bucket_ts"].timestamp()) // 3600 - t0
            for r in classical_decompose(df, 3600, p).collect()
        }
        # window of bucket t covers [t-2, t+1]; any window touching the
        # hole (t in [hole-1, hole+2]) is gone, as is the hole itself
        assert got == {
            t for t in range(2, 23)
            if t != hole and not (hole - 1 <= t <= hole + 2)
        }


class TestDeltaExtrapolated:
    def test_gauge_delta_ignores_resets(self, spark):
        """A gauge that goes 100 -> 40 within the bucket has delta
        -60 * extrapolation — NOT the counter interpretation (+40)."""
        import datetime as dt

        from afspark.operators.tsanalytics import increase_extrapolated_per_bucket

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("G", base + dt.timedelta(seconds=600), 100.0),
            ("G", base + dt.timedelta(seconds=1800), 70.0),
            ("G", base + dt.timedelta(seconds=3000), 40.0),
        ]
        df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
        r = increase_extrapolated_per_bucket(df, 3600, counter=False).collect()[0]
        assert r["raw_increase"] == -60.0
        # sampled = 2400s, avg = 1200s, d_start = d_end = 600s < 1.1*avg
        assert abs(r["increase"] - (-60.0) * (2400 + 600 + 600) / 2400) < 1e-9
        # counter mode on the same data resets at each drop: raw = 70+40
        rc = increase_extrapolated_per_bucket(df, 3600, counter=True).collect()[0]
        assert rc["raw_increase"] == 110.0


class TestVectorBinop:
    def _mk(self, spark, rows, schema="series_id string, be long, value double"):
        return spark.createDataFrame(rows, schema)

    def test_one_to_one_matching(self, spark):
        from afspark.operators.tsanalytics import vector_binop

        left = self._mk(spark, [("a", 0, 10.0), ("a", 60, 4.0), ("b", 0, 1.0)])
        right = self._mk(spark, [("a", 0, 5.0), ("a", 60, 8.0), ("c", 0, 2.0)])
        out = {
            (r.series_id, r.be): r.value
            for r in vector_binop(
                left, right, "div", on=["series_id", "be"]
            ).collect()
        }
        # unmatched left ("b",0) and right ("c",0) rows drop (PromQL inner)
        assert out == {("a", 0): 2.0, ("a", 60): 0.5}

    def test_group_left_many_to_one(self, spark):
        from afspark.operators.tsanalytics import vector_binop

        left = self._mk(spark, [("a", 0, 3.0), ("b", 0, 1.0), ("a", 60, 2.0)])
        glob = spark.createDataFrame([(0, 4.0), (60, 2.0)], "be long, value double")
        out = {
            (r.series_id, r.be): r.value
            for r in vector_binop(
                left, glob, "div", on=["be"], broadcast_right=True
            ).collect()
        }
        assert out == {("a", 0): 0.75, ("b", 0): 0.25, ("a", 60): 1.0}

    def test_div_by_zero_yields_null(self, spark):
        from afspark.operators.tsanalytics import vector_binop

        left = self._mk(spark, [("a", 0, 3.0)])
        right = self._mk(spark, [("a", 0, 0.0)])
        rows = vector_binop(left, right, "div", on=["series_id", "be"]).collect()
        assert len(rows) == 1 and rows[0].value is None

    def test_add_sub_mul(self, spark):
        from afspark.operators.tsanalytics import vector_binop

        left = self._mk(spark, [("a", 0, 3.0)])
        right = self._mk(spark, [("a", 0, 2.0)])
        for op, want in [("add", 5.0), ("sub", 1.0), ("mul", 6.0)]:
            got = vector_binop(left, right, op, on=["series_id", "be"]).collect()
            assert got[0].value == want

    def test_bad_op_raises(self, spark):
        from afspark.operators.tsanalytics import vector_binop

        with pytest.raises(ValueError):
            vector_binop(
                self._mk(spark, []), self._mk(spark, []), "pow", on=["be"]
            )

    def test_broadcast_plan(self, spark):
        from afspark.operators.tsanalytics import vector_binop

        left = self._mk(spark, [("a", 0, 3.0)])
        glob = spark.createDataFrame([(0, 4.0)], "be long, value double")
        plan = (
            vector_binop(left, glob, "div", on=["be"], broadcast_right=True)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan

    def test_check_right_unique_raises_on_duplicate(self, spark):
        from afspark.operators.tsanalytics import vector_binop

        left = self._mk(spark, [("a", 0, 3.0)])
        dup = self._mk(spark, [("a", 0, 1.0), ("a", 0, 2.0)])
        out = vector_binop(
            left, dup, "div", on=["series_id", "be"], check_right_unique=True
        )
        with pytest.raises(Exception, match="duplicate right series"):
            out.collect()
        # and the same inputs pass when the key is actually unique
        ok = vector_binop(
            left,
            self._mk(spark, [("a", 0, 2.0)]),
            "div",
            on=["series_id", "be"],
            check_right_unique=True,
        ).collect()
        assert ok[0].value == 1.5


class TestReviewRegressions:
    def test_holt_final_state_deterministic_on_duplicates(self, spark):
        """Duplicate (ts, value) samples: the keep_order tiebreak must
        pick the state after the LAST input, == the sequential loop."""
        import datetime as dt

        import numpy as np

        from afspark.operators.tsanalytics import holt_linear

        t0 = dt.datetime(2024, 1, 1)
        rows = [("s", t0 + dt.timedelta(hours=h), v) for h, v in
                [(0, 5.0), (1, 7.0), (1, 7.0), (1, 7.0), (2, 3.0)]]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        ).repartition(4)
        out = holt_linear(df, 0.3, 0.1, chunk_seconds=3600, keep_order=True)
        from pyspark.sql import functions as F

        got = out.groupBy("series_id").agg(
            F.max_by(
                F.struct("level", "trend"),
                F.struct("ts", "value", "_chunk", "_p"),
            ).alias("e")
        ).collect()[0]["e"]
        # sequential twin
        l = b = 0.0
        for x in [5.0, 7.0, 7.0, 7.0, 3.0]:
            l, b = 0.7 * l + 0.7 * b + 0.3 * x, -0.03 * l + 0.97 * b + 0.03 * x
        assert abs(got["level"] - l) < 1e-9
        assert abs(got["trend"] - b) < 1e-9

    def test_cross_corr_multi_key_pairs_not_dropped(self, spark):
        """Composite keys: same-first-component pairs must appear."""
        import datetime as dt

        from afspark.operators.tsanalytics import lagged_cross_correlation

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for m, vals in [("x", [1, 2, 3, 4]), ("y", [2, 4, 6, 8])]:
            for h, v in enumerate(vals):
                rows.append(("a", m, t0 + dt.timedelta(hours=h), float(v)))
        tier = spark.createDataFrame(
            rows,
            "domain string, metric string, bucket_ts timestamp, sum double",
        )
        out = lagged_cross_correlation(
            tier, 3600, lags=[0], keys=["domain", "metric"], min_overlap=3
        ).collect()
        pairs = {(r["a_domain"], r["a_metric"], r["b_domain"], r["b_metric"])
                 for r in out}
        assert ("a", "x", "a", "y") in pairs  # was silently dropped
        corr = [r["corr"] for r in out
                if (r["a_metric"], r["b_metric"]) == ("x", "y")][0]
        assert abs(corr - 1.0) < 1e-12

    def test_hits_zero_iterations_rejected(self, spark):
        from afspark.operators.linkgraph import hits_fixed

        nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
        edges = spark.createDataFrame([(1, 2)], "src long, dst long")
        with pytest.raises(ValueError, match="n_iter"):
            hits_fixed(nodes, edges, n_iter=0)
