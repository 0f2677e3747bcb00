"""Gap-based sessionization semantics."""

from datetime import datetime

from afspark.operators.sessions import session_stats, sessionize


def _ts(s):
    return datetime.fromisoformat(s)


def test_sessionize_planted_gaps(spark):
    rows = [
        ("u", _ts("2024-01-01 00:00:00"), 1.0),
        ("u", _ts("2024-01-01 00:10:00"), 2.0),   # same session (gap 10m)
        ("u", _ts("2024-01-01 01:00:00"), 3.0),   # 50m gap -> new session
        ("u", _ts("2024-01-01 01:30:00"), 4.0),   # exactly 30m -> SAME (> is strict)
        ("u", _ts("2024-01-01 02:00:01"), 5.0),   # 30m1s -> new
        ("v", _ts("2024-01-01 00:00:00"), 9.0),   # other series independent
    ]
    df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    got = {
        (r.series_id, r.value): r.session_id
        for r in sessionize(df, 1800).collect()
    }
    assert got[("u", 1.0)] == got[("u", 2.0)] == 1
    assert got[("u", 3.0)] == got[("u", 4.0)] == 2
    assert got[("u", 5.0)] == 3
    assert got[("v", 9.0)] == 1
    stats = {
        (r.series_id, r.session_id): (r.n, r.duration_s, r.value_sum)
        for r in session_stats(df, 1800).collect()
    }
    assert stats[("u", 1)] == (2, 600, 3.0)
    assert stats[("u", 2)] == (2, 1800, 7.0)
    assert stats[("u", 3)] == (1, 0, 5.0)
