"""ASAP auto-smoothing window pick (operators/asap.py)."""

import numpy as np
import pytest

from afspark.operators.asap import (
    _kurtosis,
    _roughness,
    asap_smooth,
    asap_smooth_local,
)


def _brute_force(x, max_w=None):
    """Independent re-derivation of the exhaustive ASAP objective."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if max_w is None:
        max_w = max(1, n // 5)
    k1 = _kurtosis(x)
    best_r, best_w = _roughness(x), 1
    for w in range(2, max_w + 1):
        sma = np.convolve(x, np.ones(w) / w, mode="valid")
        if _kurtosis(sma) < k1:
            continue
        r = _roughness(sma)
        if r < best_r:
            best_r, best_w = r, w
    return best_w, best_r


class TestLocalKernel:
    def test_brute_force_parity(self):
        rng = np.random.default_rng(11)
        for _ in range(20):
            x = np.floor(rng.normal(100, 25, size=rng.integers(10, 200)))
            got = asap_smooth_local(x)
            assert got is not None
            w, kr, rr, ko, ro, cs = got
            bw, br = _brute_force(x)
            assert w == bw
            assert abs(ro - br) < 1e-12

    def test_smoothing_never_rougher(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=500)
        w, kr, rr, ko, ro, cs = asap_smooth_local(x)
        assert ro <= rr
        assert w >= 1

    def test_kurtosis_constraint_respected(self):
        # spiky series: heavy smoothing would wash out the spike and
        # drop kurtosis below raw -> chosen window must keep kurt >= raw
        x = np.zeros(100)
        x[50] = 100.0
        w, kr, rr, ko, ro, cs = asap_smooth_local(x)
        assert ko >= kr or w == 1

    def test_noisy_periodic_picks_window_gt_one(self):
        # the ASAP showcase: noise on a slow sine -> a real window wins
        rng = np.random.default_rng(2)
        t = np.arange(720)
        x = 10 * np.sin(2 * np.pi * t / 144) + rng.normal(0, 3, 720)
        w, kr, rr, ko, ro, cs = asap_smooth_local(x)
        assert w > 1
        assert ro < rr

    def test_constant_series(self):
        w, kr, rr, ko, ro, cs = asap_smooth_local(np.full(50, 7.0))
        assert kr == 0.0 and rr == 0.0 and w == 1

    def test_too_short_returns_none(self):
        assert asap_smooth_local(np.arange(7, dtype=float)) is None

    def test_ties_pick_smallest_window(self):
        # constant series: every window has roughness 0 -> w stays 1
        w, *_ = asap_smooth_local(np.full(100, 3.0))
        assert w == 1


class TestSparkOperator:
    def test_matches_local_twin(self, spark):
        import datetime as dt

        rng = np.random.default_rng(9)
        base = dt.datetime(2024, 1, 1)
        rows = []
        series = {}
        for sid in ("A", "B", "C"):
            n = int(rng.integers(20, 120))
            v = np.floor(rng.normal(50, 10, size=n) * 100 + 0.5)
            series[sid] = v
            for h, x in enumerate(v):
                rows.append((sid, base + dt.timedelta(hours=h), float(x)))
        # one too-short series must be dropped, not crash
        rows.append(("D", base, 1.0))
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        out = {
            r["series_id"]: r for r in asap_smooth(df, 3600).collect()
        }
        assert set(out) == set(series)
        for sid, v in series.items():
            w, kr, rr, ko, ro, cs = asap_smooth_local(v)
            r = out[sid]
            assert r["n_buckets"] == v.size
            assert r["w_opt"] == w
            assert r["kurt_raw_u"] == int(np.floor(kr * 1e6 + 0.5))
            assert r["rough_raw_u"] == int(np.floor(rr * 1e6 + 0.5))
            assert r["kurt_opt_u"] == int(np.floor(ko * 1e6 + 0.5))
            assert r["rough_opt_u"] == int(np.floor(ro * 1e6 + 0.5))
            assert r["sma_checksum"] == cs
