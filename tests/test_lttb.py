"""LTTB downsampling: local-twin parity, endpoint/extrema preservation."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from afspark.operators.lttb import lttb, lttb_numpy


def test_lttb_numpy_preserves_endpoints_and_spike():
    x = np.arange(1000, dtype=np.float64)
    y = np.zeros(1000)
    y[500] = 100.0  # a spike LTTB must keep
    idx = lttb_numpy(x, y, 50)
    assert idx[0] == 0 and idx[-1] == 999
    assert len(idx) == 50
    assert 500 in idx
    assert np.all(np.diff(idx) > 0)


def test_lttb_small_series_passthrough():
    x = np.arange(5, dtype=np.float64)
    y = np.ones(5)
    assert lttb_numpy(x, y, 10).tolist() == [0, 1, 2, 3, 4]


def test_lttb_spark_equals_local(spark):
    rng = np.random.default_rng(9)
    rows = []
    want = {}
    for sid in ["a", "b"]:
        n = 777 if sid == "a" else 333
        ts = pd.to_datetime(1_700_000_000_000_000 + np.arange(n) * 1_000_000, unit="us")
        y = np.cumsum(rng.normal(size=n))
        idx = lttb_numpy(
            ts.astype("int64").to_numpy().astype(np.float64), y, 40
        )
        want[sid] = {(ts[i], y[i]) for i in idx}
        rows.append(pd.DataFrame({"series_id": sid, "ts": ts, "value": y}))
    pdf = pd.concat(rows, ignore_index=True).sample(frac=1.0, random_state=1)
    df = spark.createDataFrame(pdf).repartition(7)
    got = {}
    for r in lttb(df, 40).collect():
        got.setdefault(r.series_id, set()).add((pd.Timestamp(r.ts), r.value))
    assert got == want


def test_lttb_threshold_below_3_raises(spark):
    import numpy as np
    import pytest

    from afspark.operators.lttb import lttb, lttb_numpy

    with pytest.raises(ValueError):
        lttb_numpy(np.arange(5.0), np.arange(5.0), 2)
    with pytest.raises(ValueError):
        lttb(spark.range(1).selectExpr(
            "'s' as series_id", "current_timestamp() as ts", "1.0 as value"
        ), 2)


def test_m4_downsample_hand_golden_with_ties(spark):
    from datetime import datetime, timezone

    from afspark.operators.lttb import m4_downsample

    def ts(sec):
        return datetime.fromtimestamp(sec, tz=timezone.utc).replace(tzinfo=None)

    # one series, one 1h bucket; min value 1.0 appears twice (seq 2, 4),
    # max value 9.0 appears twice (seq 1, 3)
    rows = [
        ("a", 1, ts(10), 9.0),
        ("a", 2, ts(20), 1.0),
        ("a", 3, ts(30), 9.0),
        ("a", 4, ts(40), 1.0),
        ("a", 5, ts(50), 5.0),
        ("b", 1, ts(4000), 7.0),  # second bucket, other series
    ]
    pts = spark.createDataFrame(
        rows, "series_id string, seq long, ts timestamp, value double"
    )
    out = {(r.series_id, r.bucket_epoch): r
           for r in m4_downsample(pts, 3600).collect()}
    ra = out[("a", 0)]
    assert (ra.t_first, ra.v_first) == (10, 9.0)
    assert (ra.t_last, ra.v_last) == (50, 5.0)
    assert (ra.t_min, ra.v_min) == (20, 1.0)   # tie -> smallest seq
    assert (ra.t_max, ra.v_max) == (30, 9.0)   # tie -> largest seq
    assert ra.n == 5
    rb = out[("b", 3600)]
    assert (rb.t_first, rb.v_first) == (rb.t_last, rb.v_last) == (4000, 7.0)
    assert len(out) == 2

    # partitioning invariance (witness determinism)
    again = {(r.series_id, r.bucket_epoch): tuple(r)
             for r in m4_downsample(pts.repartition(7), 3600).collect()}
    assert again == {k: tuple(v) for k, v in out.items()}
