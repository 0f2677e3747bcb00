"""Bit-level round-trip tests for the Gorilla / delta-of-delta codecs."""

import math

import numpy as np
import pytest

from afspark.functions.codec import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


def roundtrip_vals(x):
    x = np.asarray(x, dtype=np.float64)
    out = decode_values(encode_values(x), len(x))
    assert out.view(np.uint64).tolist() == x.view(np.uint64).tolist()


def roundtrip_ts(x):
    x = np.asarray(x, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(x), len(x))
    assert out.tolist() == x.tolist()


def test_values_adversarial_bitexact():
    roundtrip_vals([])
    roundtrip_vals([0.0])
    roundtrip_vals([0.0, -0.0, 0.0, -0.0])
    roundtrip_vals([1.0, 1.0, 1.0])
    roundtrip_vals([math.inf, -math.inf, math.nan, 5e-324, -5e-324, 1.7976931348623157e308])
    # NaN payloads must survive
    weird_nan = np.array([0x7FF8DEADBEEF0001], dtype=np.uint64).view(np.float64)
    roundtrip_vals([1.0, float(weird_nan[0]), 2.0])


def test_values_random_walks_bitexact():
    rng = np.random.default_rng(42)
    for n in [1, 2, 3, 100, 4096]:
        roundtrip_vals(np.cumsum(rng.normal(size=n)))
        roundtrip_vals(rng.normal(size=n) * 10.0**rng.integers(-300, 300, n))


def test_values_compression_ratio_on_stepped_series():
    # repeated/stepped values (gauges, counters) are Gorilla's sweet spot
    x = np.repeat(np.arange(100.0), 100)
    blob = encode_values(x)
    assert len(blob) < 2 * len(x)  # well under 8 bytes/value
    roundtrip_vals(x)
    # churny values still round-trip, just without the ratio win
    roundtrip_vals(1000.0 + np.sin(np.arange(10_000) / 100.0).round(3))


def test_timestamps_regular_and_jittered():
    roundtrip_ts([])
    roundtrip_ts([1700000000])
    base = 1_700_000_000_000_000  # epoch micros
    roundtrip_ts(base + 1_000_000 * np.arange(5000))  # perfectly regular
    rng = np.random.default_rng(7)
    jitter = rng.integers(-500, 500, 5000)
    roundtrip_ts(base + 1_000_000 * np.arange(5000) + jitter)
    # non-monotone + huge gaps exercise the 64-bit escape bucket
    roundtrip_ts([10, 5, 10**17, -(10**17), 0, 2**62])


def test_timestamps_regular_compresses_to_bits():
    base = 1_700_000_000
    ts = base + 60 * np.arange(10_000)
    blob = encode_timestamps(ts)
    # constant delta -> ~1 bit per timestamp after the header
    assert len(blob) < 16 + 10_000 // 8 + 10


@pytest.mark.parametrize("n", [1, 2, 7, 64, 1000])
def test_negative_and_zero_mix(n):
    rng = np.random.default_rng(n)
    vals = rng.choice([0.0, -0.0, 1.5, -1.5, 1e-310, np.nan], size=n)
    x = np.asarray(vals, dtype=np.float64)
    out = decode_values(encode_values(x), n)
    assert out.view(np.uint64).tolist() == x.view(np.uint64).tolist()
