"""Matrix profile discord/motif (operators/matrixprofile.py)."""

import numpy as np
import pytest

from afspark.operators.matrixprofile import (
    matrix_profile_local,
    matrix_profile_discord,
)


class TestLocalKernel:
    def test_brute_force_parity(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=120)
        m = 10
        got_mp, got_nn = matrix_profile_local(x, m)
        W = x.size - m + 1
        excl = int(np.ceil(m / 2))

        def znorm(w):
            sd = w.std()
            return (w - w.mean()) / sd if sd > 0 else np.zeros_like(w)

        for i in range(W):
            best, bj = np.inf, -1
            qi = znorm(x[i:i + m])
            for j in range(W):
                if abs(i - j) < excl:
                    continue
                d = np.linalg.norm(qi - znorm(x[j:j + m]))
                if d < best:
                    best, bj = d, j
            assert abs(got_mp[i] - best) < 1e-8
            # nn may differ on exact ties; distances must agree
            dj = np.linalg.norm(qi - znorm(x[got_nn[i]:got_nn[i] + m]))
            assert abs(dj - best) < 1e-8

    def test_planted_discord_found(self):
        # periodic signal with one corrupted cycle -> discord lands there
        t = np.arange(240)
        x = np.sin(2 * np.pi * t / 24)
        x[100:112] += 5.0
        mp, _ = matrix_profile_local(x, 24)
        di = int(mp.argmax())
        assert 76 < di < 112  # window overlapping the corruption

    def test_flat_windows_zero_distance(self):
        x = np.zeros(50)
        mp, _ = matrix_profile_local(x, 8)
        assert np.allclose(mp, 0.0)

    def test_too_short_returns_none(self):
        assert matrix_profile_local(np.arange(10, dtype=float), 8) is None


class TestSparkOperator:
    def test_matches_local_twin(self, spark):
        import datetime as dt

        rng = np.random.default_rng(3)
        base = dt.datetime(2024, 1, 1)
        rows = []
        series = {}
        for sid in ("A", "B"):
            v = np.floor(rng.normal(50, 10, size=90) * 100 + 0.5)
            series[sid] = v
            for h, x in enumerate(v):
                rows.append(
                    (sid, base + dt.timedelta(hours=h), float(x))
                )
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        out = {
            r["series_id"]: r
            for r in matrix_profile_discord(df, 3600, 24).collect()
        }
        for sid, v in series.items():
            mp, nn = matrix_profile_local(v, 24)
            r = out[sid]
            assert r["n_windows"] == mp.size
            assert r["discord_idx"] == int(mp.argmax())
            assert r["discord_mp_u"] == int(
                np.floor(mp[mp.argmax()] * 1e6 + 0.5)
            )
            assert r["motif_idx"] == int(mp.argmin())

    def test_short_series_emits_nothing(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [("S", base + dt.timedelta(hours=h), 1.0) for h in range(20)]
        df = spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        )
        assert matrix_profile_discord(df, 3600, 24).count() == 0


def test_short_series_excl_band_no_inf(spark):
    # W in (excl, 2*excl): middle windows have NO allowed neighbor and
    # must be NaN-skipped, never cast inf -> garbage int64
    import datetime as dt

    import numpy as np

    rng = np.random.default_rng(8)
    base = dt.datetime(2024, 1, 1)
    # L = 36, m = 24 -> W = 13, excl = 12: only (0,12) is an allowed pair
    vals = rng.normal(size=36)
    mp, nn = matrix_profile_local(vals, 24)
    assert np.isfinite(mp[0]) and np.isfinite(mp[12])
    assert np.isnan(mp[1:12]).all()
    rows = [
        ("S", base + dt.timedelta(hours=h), float(v))
        for h, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "series_id string, ts timestamp, value double"
    )
    out = matrix_profile_discord(df, 3600, 24).collect()
    assert len(out) == 1
    r = out[0]
    assert r["discord_idx"] in (0, 12) and r["motif_idx"] in (0, 12)
    assert 0 <= r["discord_mp_u"] < 10**12  # sane micros, not cast junk
