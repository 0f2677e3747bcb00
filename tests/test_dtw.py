"""DTW distance (operators/dtw.py)."""

import datetime as dtm

import numpy as np
import pytest

from afspark.operators.dtw import dtw_local, dtw_pairs


def naive_dtw(x, y, radius=None):
    n, m = len(x), len(y)
    D = np.full((n, m), np.inf)
    scale = n / m
    for i in range(n):
        for j in range(m):
            if radius is not None and abs(i - j * scale) > radius:
                continue
            c = abs(x[i] - y[j])
            if i == 0 and j == 0:
                D[i, j] = c
                continue
            best = np.inf
            if i > 0:
                best = min(best, D[i - 1, j])
            if j > 0:
                best = min(best, D[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, D[i - 1, j - 1])
            D[i, j] = c + best
    return D[n - 1, m - 1]


def test_dtw_local_identities():
    x = np.array([0.0, 1.0, 2.0, 3.0])
    assert dtw_local(x, x) == 0.0
    # one-step time shift of a spiky series warps to near-zero cost
    a = np.array([0, 0, 10, 0, 0, 0], dtype=float)
    b = np.array([0, 0, 0, 10, 0, 0], dtype=float)
    assert dtw_local(a, b) == 0.0
    # Euclidean-style lockstep would pay 20; DTW pays 0 -> it's elastic
    assert np.abs(a - b).sum() == 20.0


def test_dtw_local_matches_naive_random():
    rng = np.random.default_rng(5)
    for n, m, r in [(13, 13, None), (20, 11, None), (17, 23, 4), (30, 30, 3)]:
        x = rng.integers(0, 50, n).astype(float)
        y = rng.integers(0, 50, m).astype(float)
        assert dtw_local(x, y, r) == naive_dtw(x, y, r)


def test_dtw_local_integer_exact_and_empty():
    x = np.array([100000.0, 250000.0] * 300)
    y = np.array([100000.0] * 500)
    d = dtw_local(x, y)
    assert d == int(d)  # integer inputs -> integer distance
    assert np.isnan(dtw_local(np.array([]), x))


def test_dtw_pairs_spark_matches_local(spark):
    t0 = dtm.datetime(2024, 1, 1)
    rng = np.random.default_rng(9)
    seqs = {
        "1": rng.integers(0, 100, 48).astype(float),
        "2": rng.integers(0, 100, 40).astype(float),
        "3": rng.integers(0, 100, 48).astype(float),
    }
    rows = [
        (sid, t0 + dtm.timedelta(hours=i), float(v))
        for sid, xs in seqs.items()
        for i, v in enumerate(xs)
    ]
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    ).repartition(7)
    cand = spark.createDataFrame(
        [("1", "2"), ("1", "3"), ("2", "3")],
        "a_series_id string, b_series_id string",
    )
    out = {
        (r.a_series_id, r.b_series_id): r
        for r in dtw_pairs(tier, cand, radius=8).collect()
    }
    assert len(out) == 3
    for (a, b), r in out.items():
        assert r.n_a == len(seqs[a]) and r.n_b == len(seqs[b])
        assert r.dtw == dtw_local(seqs[a], seqs[b], radius=8)
