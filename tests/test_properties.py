"""Property-based tests (hypothesis) for invariant-heavy primitives."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from afspark.functions import kernels as K
from afspark.functions.codec import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)
from afspark.functions.findpeaks import find_peaks

finite_floats = st.floats(
    allow_nan=False, allow_infinity=False, width=64, min_value=-1e300, max_value=1e300
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_floats, min_size=0, max_size=300))
def test_codec_values_roundtrip_any_floats(xs):
    x = np.asarray(xs, dtype=np.float64)
    out = decode_values(encode_values(x), len(x))
    assert out.view(np.uint64).tolist() == x.view(np.uint64).tolist()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300))
def test_codec_timestamps_roundtrip_any_ints(xs):
    x = np.asarray(xs, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(x), len(x))
    assert out.tolist() == x.tolist()


@settings(max_examples=100, deadline=None)
@given(
    xlen=st.integers(min_value=1, max_value=5000),
    winlen=st.integers(min_value=1, max_value=5000),
    noverlap=st.integers(min_value=0, max_value=4999),
)
def test_window_starts_match_bruteforce(xlen, winlen, noverlap):
    if noverlap >= winlen or winlen > xlen:
        return
    starts = K.window_starts(xlen, winlen, noverlap)
    step = winlen - noverlap
    brute = [s for s in range(1, xlen + 1, step) if s + winlen - 1 <= xlen]
    assert starts.tolist() == brute


@settings(max_examples=100, deadline=None)
@given(
    xs=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6),
        min_size=4,
        max_size=60,
    ),
    m=st.integers(min_value=2, max_value=4),
    tau=st.integers(min_value=1, max_value=3),
)
def test_ordinal_patterns_are_probabilities(xs, m, tau):
    x = np.asarray(xs, dtype=np.float64)
    if len(x) - tau * m + tau <= 0:
        return
    p = K.ordinal_patterns(x, m, tau)
    assert np.all(p > 0)
    assert abs(p.sum() - 1.0) < 1e-12
    assert len(p) <= min(math.factorial(m), len(x) - tau * m + tau)


@settings(max_examples=100, deadline=None)
@given(
    xs=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-100, max_value=100),
        min_size=3,
        max_size=100,
    ),
    distance=st.integers(min_value=1, max_value=20),
)
def test_find_peaks_invariants(xs, distance):
    x = np.asarray(xs, dtype=np.float64)
    peaks = find_peaks(x, distance=distance)
    # every reported peak is a local max (>= neighbors)
    for p in peaks:
        assert 0 < p < len(x) - 1
        assert x[p] >= x[p - 1] and x[p] >= x[p + 1]
    # distance constraint holds pairwise
    if len(peaks) > 1:
        assert np.all(np.diff(peaks) >= distance)


@settings(max_examples=50, deadline=None)
@given(
    xs=st.lists(
        st.floats(allow_nan=False, allow_infinity=False, min_value=-1e3, max_value=1e3),
        min_size=8,
        max_size=256,
    )
)
def test_batch_equals_scalar_paths(xs):
    """compute_batch (vectorized) agrees with compute (scalar) closely."""
    x = np.asarray(xs, dtype=np.float64)
    W = x[None, :]
    for f in [
        K.Energy(),
        K.SoundPressureLevel(),
        K.ZeroCrossingRate(),
        K.SpectralCentroid(),
        K.SpectralFlatness(),
        K.PermutationEntropy(3),
        K.StatisticalComplexity(3),
    ]:
        a = np.asarray(f.compute(x, 100.0), dtype=np.float64)
        b = np.asarray(f.compute_batch(W, 100.0), dtype=np.float64)[0]
        both_nan = np.isnan(a) & np.isnan(b)
        close = np.isclose(a, b, rtol=1e-9, atol=1e-12)
        assert np.all(both_nan | close), (f.key, a, b)


@given(
    span=st.integers(min_value=0, max_value=10 * 365 * 86_400),
    target=st.integers(min_value=1, max_value=100_000),
)
@settings(max_examples=200, deadline=None)
def test_choose_tier_is_coarsest_satisfying(span, target):
    """Router invariant: the chosen tier satisfies the target (or is the
    finest tier), and no coarser tier satisfies it."""
    from afspark.operators.rollup import TIERS, choose_tier

    name = choose_tier(0, span, target)
    sec = TIERS[name]
    finest = min(TIERS.values())
    if sec != finest:
        assert span // sec >= target
    for other, osec in TIERS.items():
        if osec > sec:
            assert span // osec < target, (name, other)
