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


def test_interval_overlap_join_matches_naive(spark):
    import random

    from afspark.operators.rangejoin import interval_overlap_join

    rng = random.Random(7)
    day = 86400

    def mk(n, sid_prefix):
        rows = []
        for i in range(n):
            key = f"k{rng.randrange(4)}"
            start = rng.randrange(0, 5 * day)
            span = rng.choice([0, 60, 3600, day // 2, 2 * day])  # incl. zero-length
            rows.append((key, f"{sid_prefix}{i}", start, start + span))
        return rows

    rows_a, rows_b = mk(60, "a"), mk(40, "b")
    a = spark.createDataFrame(
        rows_a, "k string, l_id string, l_start_s long, l_end_s long"
    )
    b = spark.createDataFrame(
        rows_b, "k string, r_id string, r_start_s long, r_end_s long"
    )
    out = interval_overlap_join(a, b, bucket_seconds=day, keys=["k"])
    got = {(r.l_id, r.r_id, r.overlap_s) for r in out.collect()}
    assert len(got) == out.count()  # claim rule: each pair exactly once

    want = set()
    for ka, lid, ls, le in rows_a:
        for kb, rid, rs, re_ in rows_b:
            if ka == kb and ls <= re_ and rs <= le:
                want.add((lid, rid, min(le, re_) - max(ls, rs)))
    assert got == want
    assert any(ov == 0 for _, _, ov in got)  # touching endpoints count


def test_interval_overlap_join_drops_inverted_and_spans_buckets(spark):
    from afspark.operators.rangejoin import interval_overlap_join

    a = spark.createDataFrame(
        [("x", "a1", 0, 10 * 86400),      # spans 11 buckets
         ("x", "bad", 100, 50)],          # inverted -> dropped
        "k string, l_id string, l_start_s long, l_end_s long",
    )
    b = spark.createDataFrame(
        [("x", "b1", 5 * 86400, 5 * 86400 + 60)],
        "k string, r_id string, r_start_s long, r_end_s long",
    )
    rows = interval_overlap_join(a, b, 86400, keys=["k"]).collect()
    assert [(r.l_id, r.r_id, r.overlap_s) for r in rows] == [("a1", "b1", 60)]
