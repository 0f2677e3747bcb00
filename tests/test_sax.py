"""SAX symbolization (operators/sax.py)."""

import datetime as dtm

import numpy as np
import pytest

from afspark.operators.sax import BREAKPOINTS, sax_symbolize, sax_words


def t(s):
    return dtm.datetime(2024, 1, 1) + dtm.timedelta(seconds=s)


@pytest.fixture(scope="module")
def tier(spark):
    # series "s": one bucket per hour for 24h, values chosen so the four
    # 6h frames land in the four alphabet-4 cells (deep-low, low, high,
    # deep-high); series "flat": constant
    vals = [0.0] * 6 + [40.0] * 6 + [60.0] * 6 + [100.0] * 6
    rows = [("s", t(i * 3600), v) for i, v in enumerate(vals)]
    rows += [("flat", t(i * 3600), 5.0) for i in range(24)]
    return spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    )


def test_sax_hand_golden_letters(tier):
    out = sax_symbolize(tier, frame_seconds=21600, alphabet=4)
    rows = sorted(
        (r for r in out.collect() if r.series_id == "s"),
        key=lambda r: r.frame_epoch,
    )
    assert [r.letter for r in rows] == ["a", "b", "c", "d"]
    assert all(r.n_buckets == 6 for r in rows)
    # z matches numpy population z-scores of the PAA means
    x = np.array([0.0] * 6 + [40.0] * 6 + [60.0] * 6 + [100.0] * 6)
    paa = x.reshape(4, 6).mean(axis=1)
    want = (paa - x.mean()) / x.std()
    got = np.array([r.z for r in rows])
    assert np.allclose(got, want, atol=1e-12)


def test_sax_flat_series_null(tier):
    out = sax_symbolize(tier, frame_seconds=21600, alphabet=4)
    flat = [r for r in out.collect() if r.series_id == "flat"]
    assert len(flat) == 4
    assert all(r.letter is None and r.z is None for r in flat)
    # PAA itself is still defined
    assert all(r.paa == 5.0 for r in flat)


def test_sax_words_order_and_null(tier):
    out = sax_words(sax_symbolize(tier, 21600, 4).repartition(5))
    m = {r.series_id: r for r in out.collect()}
    assert m["s"].word == "abcd" and m["s"].n_frames == 4
    assert m["flat"].word is None


def test_sax_alphabet_8_breakpoints_monotone(spark):
    """Ramp series: letters are non-decreasing in frame order and cover
    both extremes at alphabet 8."""
    rows = [("r", t(i * 3600), float(i)) for i in range(64)]
    tier = spark.createDataFrame(
        rows, "series_id string, bucket_ts timestamp, sum double"
    )
    out = sorted(
        sax_symbolize(tier, frame_seconds=8 * 3600, alphabet=8).collect(),
        key=lambda r: r.frame_epoch,
    )
    letters = [r.letter for r in out]
    assert letters == sorted(letters)
    assert letters[0] == "a" and letters[-1] == "h"
    assert len(BREAKPOINTS[8]) == 7


def test_sax_bad_alphabet_raises(tier):
    with pytest.raises(ValueError):
        sax_symbolize(tier, 21600, alphabet=7)
