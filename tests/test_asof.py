"""asof_join unit semantics: inclusive match, tolerance, per-series."""

from datetime import datetime

from pyspark.sql import functions as F

from afspark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_planted(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:10"), 1),
            ("a", _ts("2024-01-01 00:00:20"), 2),  # exactly at a right ts
            ("a", _ts("2024-01-01 00:00:05"), 3),  # before any right row
            ("b", _ts("2024-01-01 00:00:15"), 4),  # other series
        ],
        "series_id string, ts timestamp, tag int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:08"), 80.0),
            ("a", _ts("2024-01-01 00:00:20"), 200.0),
            ("b", _ts("2024-01-01 00:00:01"), 10.0),
        ],
        "series_id string, ts timestamp, value double",
    )
    got = {r.tag: (r.value_asof, r.ts_asof) for r in asof_join(left, right).collect()}
    assert got[1] == (80.0, _ts("2024-01-01 00:00:08"))
    assert got[2] == (200.0, _ts("2024-01-01 00:00:20"))  # inclusive
    assert got[3] == (None, None)  # nothing at-or-before
    assert got[4] == (10.0, _ts("2024-01-01 00:00:01"))  # series isolation
    # tolerance: the 14s-old match for tag=4 dies at tolerance 5s
    tol = {r.tag: r.value_asof for r in asof_join(left, right, tolerance_seconds=5).collect()}
    assert tol[1] == 80.0 and tol[2] == 200.0 and tol[4] is None


def test_asof_right_nulls_stay_row_coherent(spark):
    """Right value columns with legitimate NULLs must not mix values
    from different right rows: the carried (v1, v2, ts_asof) must all
    come from THE most recent right row (ADVICE r2)."""
    left = spark.createDataFrame(
        [("a", _ts("2024-01-01 00:00:30"), 1)],
        "series_id string, ts timestamp, tag int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:10"), 10.0, 100.0),
            # most recent row: v2 is NULL — a per-column carry would
            # backfill v2=100.0 from the older row
            ("a", _ts("2024-01-01 00:00:20"), 20.0, None),
        ],
        "series_id string, ts timestamp, v1 double, v2 double",
    )
    r = asof_join(left, right).collect()[0]
    assert r.v1_asof == 20.0
    assert r.v2_asof is None
    assert r.ts_asof == _ts("2024-01-01 00:00:20")


def test_asof_chunked_equals_single_window(spark):
    """The two-level chunk decomposition of the as-of carry must match
    the single per-series window exactly: matches reaching back across
    several empty chunks, same-ts left/right rows (inclusive), legit
    NULLs in right value columns, and tolerance gating."""
    import numpy as np

    rng = np.random.default_rng(13)
    lrows, rrows = [], []
    base = _ts("2024-01-01 00:00:00")
    from datetime import timedelta

    for sid in ("a", "b"):
        rsec = sorted(int(x) for x in rng.choice(500_000, size=40, replace=False))
        for i, s in enumerate(rsec):
            # legit NULL values in some right rows; distinct ts per series
            v = None if i % 7 == 3 else float(i)
            rrows.append((sid, base + timedelta(seconds=s), v, i))
        lsec = [int(x) for x in rng.choice(500_000, size=120, replace=False)]
        lsec += rsec[:10]  # same-ts left rows (inclusive-match edge)
        for j, s in enumerate(lsec):
            lrows.append((sid, base + timedelta(seconds=s), j))
    left = spark.createDataFrame(lrows, "series_id string, ts timestamp, tag long")
    right = spark.createDataFrame(
        rrows, "series_id string, ts timestamp, value double, rtag long"
    )

    for tol in (None, 3600):
        a = sorted(
            asof_join(left, right, tolerance_seconds=tol, chunk_seconds=3600).collect(),
            key=lambda r: (r.series_id, r.ts, r.tag),
        )
        b = sorted(
            asof_join(left, right, tolerance_seconds=tol, chunk_seconds=None).collect(),
            key=lambda r: (r.series_id, r.ts, r.tag),
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in b], f"tol={tol}"
