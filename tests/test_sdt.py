"""Swinging-door trimming: naive-scalar parity, reconstruction bound,
line collapse, and distributed == local."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from afspark.operators.sdt import sdt_downsample, sdt_mask


def naive_mask(t, v, dev):
    """Textbook scalar SDT — the semantics oracle for the blocked kernel."""
    n = len(v)
    keep = np.zeros(n, dtype=bool)
    keep[0] = True
    if n <= 2:
        keep[-1] = True
        return keep
    a, i = 0, 1
    smax, smin = np.inf, -np.inf
    while i < n:
        dt = t[i] - t[a]
        up = (v[i] + dev - v[a]) / dt
        dn = (v[i] - dev - v[a]) / dt
        if max(smin, dn) > min(smax, up):
            keep[i - 1] = True
            a = i - 1
            smax, smin = np.inf, -np.inf
            continue  # reprocess i against the new anchor
        smax, smin = min(smax, up), max(smin, dn)
        i += 1
    keep[-1] = True
    return keep


def test_blocked_kernel_matches_naive():
    rng = np.random.default_rng(7)
    for n in [1, 2, 3, 50, 257, 1000, 5000]:
        t = np.cumsum(rng.uniform(0.5, 2.0, size=n))
        v = np.cumsum(rng.normal(0, 1, size=n))
        for dev in [0.5, 2.0, 10.0]:
            got = sdt_mask(t, v, dev)
            want = naive_mask(t, v, dev)
            assert np.array_equal(got, want), (n, dev)


def test_straight_line_keeps_only_endpoints():
    t = np.arange(100, dtype=float)
    v = 3.0 * t + 7.0
    m = sdt_mask(t, v, 0.01)
    assert m[0] and m[-1] and m.sum() == 2


def test_reconstruction_within_two_dev():
    """The kernel's doors at half-width dev guarantee 2*dev, and real
    data must actually exceed dev somewhere (the bound is tight-ish)."""
    rng = np.random.default_rng(11)
    t = np.cumsum(rng.uniform(0.5, 2.0, size=3000))
    v = np.cumsum(rng.normal(0, 1, size=3000))
    dev = 3.0
    m = sdt_mask(t, v, dev)
    recon = np.interp(t, t[m], v[m])
    assert np.abs(recon - v).max() <= 2 * dev + 1e-9


def test_distributed_equals_local(spark):
    rng = np.random.default_rng(3)
    rows = []
    series = {}
    for sid in ["a", "b", "c"]:
        n = int(rng.integers(100, 400))
        t = np.arange(1, n + 1, dtype=np.int64)
        v = np.cumsum(rng.normal(0, 5, size=n))
        series[sid] = (t, v)
        rows += [(sid, int(ti), float(vi)) for ti, vi in zip(t, v)]
    df = spark.createDataFrame(rows, "series_id string, seq long, value double")
    kept = sdt_downsample(
        df, dev=8.0, ts_col="seq", order_col="seq"
    ).collect()
    got = {}
    for r in kept:
        got.setdefault(r.series_id, set()).add(r.seq)
    for sid, (t, v) in series.items():
        m = sdt_mask(t.astype(float), v, 4.0)  # operator halves dev
        assert got[sid] == set(t[m].tolist()), sid
        recon = np.interp(t.astype(float), t[m].astype(float), v[m])
        assert np.abs(recon - v).max() <= 8.0 + 1e-9  # operator's contract
