"""Bucketed range join: containment semantics, replication, no dup matches."""

from datetime import datetime

from pyspark.sql import functions as F

from afspark.operators.rangejoin import range_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_range_join_planted(spark):
    pts = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:30:00"), 1),
            ("a", _ts("2024-01-01 05:00:00"), 2),   # bucket-spanning interval
            ("a", _ts("2024-01-01 09:00:01"), 3),   # 1s past the end -> no match
            ("a", _ts("2024-01-01 01:00:00"), 4),   # exactly at an end bound
            ("b", _ts("2024-01-01 00:30:00"), 5),   # other series
        ],
        "series_id string, ts timestamp, tag int",
    )
    iv = spark.createDataFrame(
        [
            ("a", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), 10),
            ("a", _ts("2024-01-01 00:45:00"), _ts("2024-01-01 09:00:00"), 11),  # overlaps 10
            ("a", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 09:00:00"), 12),  # inverted -> dropped
            ("b", _ts("2024-01-01 00:00:00"), _ts("2024-01-01 01:00:00"), 13),
        ],
        "series_id string, start_ts timestamp, end_ts timestamp, iv int",
    )
    got = sorted(
        (r.tag, r.iv) for r in range_join(pts, iv, bucket_seconds=3600).collect()
    )
    assert got == [(1, 10), (2, 11), (4, 10), (4, 11), (5, 13)]
    # a point inside a multi-bucket interval matches it exactly ONCE
    assert len([g for g in got if g == (2, 11)]) == 1
