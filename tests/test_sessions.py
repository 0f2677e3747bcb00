"""Gap-based sessionization semantics."""

from datetime import datetime

from pyspark.sql import functions as F

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


def test_sessionize_chunked_equals_single_window(spark):
    """The two-level chunk decomposition must reproduce the single
    per-series window exactly: sessions spanning chunk boundaries,
    gap-openers landing ON a boundary, duplicate timestamps, and gaps
    larger than several chunks."""
    import numpy as np

    rng = np.random.default_rng(9)
    rows = []
    for sid in ("a", "b"):
        sec = 0
        for _ in range(300):
            # mix sub-gap steps, exact-gap steps, and multi-chunk jumps
            r = rng.random()
            if r < 0.6:
                sec += int(rng.integers(1, 1800))
            elif r < 0.8:
                sec += 1800  # exactly the gap: NOT an opener (> is strict)
            else:
                sec += int(rng.integers(100_000, 400_000))  # multi-chunk gap
            rows.append((sid, _ts("2024-01-01 00:00:00"), float(sec), sec))
    df = spark.createDataFrame(
        [(s, t, v, sec) for (s, t, v, sec) in rows],
        "series_id string, ts0 timestamp, value double, off long",
    ).select(
        "series_id",
        (F.col("ts0") + F.make_interval(secs=F.col("off"))).alias("ts"),
        "value",
    )
    # duplicate timestamps
    df = df.unionByName(df.limit(20))

    key = lambda r: (r.series_id, r.ts, r.value)  # noqa: E731
    chunked = sorted(sessionize(df, 1800, chunk_seconds=86_400).collect(), key=key)
    single = sorted(sessionize(df, 1800, chunk_seconds=None).collect(), key=key)
    assert [r.session_id for r in chunked] == [r.session_id for r in single]

    # session_stats over the chunked path matches the single-window path
    a = {(r.series_id, r.session_id): tuple(r) for r in
         session_stats(df, 1800).collect()}
    # temporarily force the stats through the single-window sessionizer
    s = sessionize(df, 1800, chunk_seconds=None)
    b = {(r.series_id, r.session_id): tuple(r) for r in
         s.groupBy("series_id", "session_id").agg(
             F.count(F.lit(1)).alias("n"),
             F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("duration_s"),
             F.sum("value").alias("value_sum"),
         ).collect()}
    assert a == b


def test_coalesce_intervals_merge_semantics(spark):
    """Overlap and adjacency merge; strict gaps split; series isolate."""
    from afspark.operators.sessions import coalesce_intervals

    rows = [
        # u: [0,10) + [5,20) overlap; [20,25) adjacent -> one island
        ("u", 1, 0, 10),
        ("u", 2, 5, 20),
        ("u", 3, 20, 25),
        # u: [30,40) gap of 5s -> new island
        ("u", 4, 30, 40),
        # u: contained interval [31,33) merges into the island
        ("u", 5, 31, 33),
        # v: independent
        ("v", 1, 0, 1),
    ]
    df = spark.createDataFrame(
        rows, "series_id string, seq long, start_es long, end_es long"
    )
    got = sorted(
        coalesce_intervals(df).collect(),
        key=lambda r: (r.series_id, r.island_start),
    )
    flat = [
        (r.series_id, r.island_id, r.island_start, r.island_end, r.n_events)
        for r in got
    ]
    assert flat == [
        ("u", 1, 0, 25, 3),
        ("u", 2, 30, 40, 2),
        ("v", 1, 0, 1, 1),
    ]


def test_coalesce_intervals_out_of_order_end_containment(spark):
    """A long interval swallowing later-starting short ones: the running
    max end (not lag(end)) is what keeps the island open."""
    from afspark.operators.sessions import coalesce_intervals

    rows = [("u", 1, 0, 100), ("u", 2, 10, 20), ("u", 3, 50, 60), ("u", 4, 101, 110)]
    df = spark.createDataFrame(
        rows, "series_id string, seq long, start_es long, end_es long"
    )
    got = sorted(coalesce_intervals(df).collect(), key=lambda r: r.island_start)
    assert [(r.island_start, r.island_end, r.n_events) for r in got] == [
        (0, 100, 3),
        (101, 110, 1),
    ]
