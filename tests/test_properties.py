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


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=1, max_value=8).flatmap(
        lambda a: st.tuples(
            st.just(60 * a),
            st.integers(min_value=1, max_value=48),
            st.integers(min_value=1, max_value=40),
        )
    ),
    st.integers(min_value=1, max_value=10_000),  # 1h retention units
    st.integers(min_value=0, max_value=20_000),  # extra coarse retention
    st.integers(min_value=0, max_value=500_000),
    st.integers(min_value=1, max_value=500_000),
)
def test_stitch_spans_disjoint_aligned_and_covering(cfg, r1, r2, t0, width):
    """Over random 3-tier configs: spans are disjoint, ordered, aligned
    to the serving tier at internal handoffs, and cover [t0, t1) up to
    the documented whole-bucket edges — or the config raises."""
    from afspark.operators.rollup import stitch_spans

    s1, m2, m3 = cfg
    secs = {"a": s1, "b": s1 * m2, "c": s1 * m2 * m3}
    now = 1_000_000_000
    rets = {"a": r1 * 3600, "b": r1 * 3600 + r2 * 3600, "c": 10**10}
    t1 = t0 + width
    try:
        spans = stitch_spans(["a", "b", "c"], secs, rets, now, t0, t1)
    except ValueError:
        return  # unreachable-handoff configs must raise, not mis-serve
    # fine -> coarse, contiguous, disjoint
    hi_prev = t1
    for name, flo, hi in spans:
        assert hi == hi_prev  # contiguous from the top
        assert flo < hi
        hi_prev = flo
    # every internal handoff boundary is a bucket edge of the tier BELOW
    # it (the coarser server): no coarse bucket straddles into a finer span
    for (n_fine, _f1, _h1), (n_coarse, _f2, h2) in zip(spans, spans[1:]):
        assert h2 % secs[n_coarse] == 0
    # coverage: the union of [flo, hi) contains [max(t0, lowest flo), t1)
    lo_all = min(f for _n, f, _h in spans)
    covered = sorted((f, h) for _n, f, h in spans)
    cursor = lo_all
    for f, h in covered:
        assert f <= cursor  # no gap
        cursor = max(cursor, h)
    assert cursor == t1
    # the start tier reaches t0 unless clipped by the coarsest retention
    oldest_c = now - rets["c"]
    if oldest_c <= t0:
        assert lo_all <= t0


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=8,
        max_size=200,
    )
)
def test_asap_objective_invariants(xs):
    """ASAP pick: smoothing never increases roughness, kurtosis of the
    pick is >= raw (or w==1), and w_opt matches a brute-force rescan."""
    import numpy as np

    from afspark.operators.asap import (
        _kurtosis,
        _roughness,
        asap_smooth_local,
    )

    x = np.asarray(xs, dtype=np.float64)
    got = asap_smooth_local(x)
    assert got is not None
    w, kr, rr, ko, ro, cs = got
    assert ro <= rr
    assert w == 1 or ko >= kr
    # rescan with the SAME cumsum SMA the kernel uses: a convolve-based
    # SMA rounds differently and can land on the other side of the
    # kurtosis gate at exact ties (affine-of-x smoothed series)
    c = np.concatenate([[0.0], np.cumsum(x)])
    best_w, best_r = 1, rr
    for cand in range(2, max(1, x.size // 5) + 1):
        sma = (c[cand:] - c[:-cand]) / cand
        if _kurtosis(sma) < kr:
            continue
        r = _roughness(sma)
        if r < best_r:
            best_w, best_r = cand, r
    assert w == best_w
