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
