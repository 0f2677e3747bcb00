"""Distinct-count tiers: exact chain parity + HLL sketch merge parity."""

import datetime as dtm
import random

import pytest
from pyspark.sql import functions as F

from afspark.operators.distinct import (
    distinct_counts,
    distinct_rollup,
    distinct_tier_rollup,
    hll_merge_rollup,
    hll_rollup,
)


def _events(spark, n=4000, seed=7):
    rng = random.Random(seed)
    base = dtm.datetime(2024, 1, 1)
    rows = [
        (
            base + dtm.timedelta(seconds=rng.randrange(4 * 86400)),
            rng.randrange(300),
            rng.choice(["click", "view", "error"]),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string"
    )


def test_exact_chain_equals_direct(spark):
    """1h tier -> 1d re-distinct == count(distinct) straight off the raw
    stream: the chained tier loses nothing."""
    ev = _events(spark)
    chained = distinct_counts(
        distinct_tier_rollup(distinct_rollup(ev, 3600), 86400)
    )
    direct = (
        ev.withColumn(
            "bucket_ts",
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
            ),
        )
        .groupBy("event_type", "bucket_ts")
        .agg(F.countDistinct("user_id").alias("n_distinct"))
    )
    a = {(r.event_type, r.bucket_ts): r.n_distinct for r in chained.collect()}
    b = {(r.event_type, r.bucket_ts): r.n_distinct for r in direct.collect()}
    assert a == b and len(a) == 12


def test_distinct_tier_is_mergeable_rows(spark):
    """The 1h tier stores TUPLES: its 1d roll touches only tier rows
    (distinct set), never the raw stream — row counts prove the dedup
    collapsed repeats before the chain."""
    ev = _events(spark)
    tier_1h = distinct_rollup(ev, 3600)
    assert tier_1h.count() < ev.count()
    assert (
        tier_1h.count()
        == ev.select("event_type", "user_id", "ts").withColumn(
            "b", (F.floor(F.unix_timestamp("ts") / 3600)).cast("long")
        ).select("event_type", "b", "user_id").distinct().count()
    )


def test_hll_merge_matches_direct_sketch_and_exact(spark):
    """Merging 1h sketches to 1d gives the same estimate as sketching the
    day directly (register-max union is lossless at equal lg_k), and both
    land within 5% of the exact count."""
    ev = _events(spark)
    merged = hll_merge_rollup(hll_rollup(ev, 3600, lg_k=14), 86400)
    direct = hll_rollup(ev, 86400, lg_k=14).withColumn(
        "n_estimate", F.hll_sketch_estimate("hll").cast("long")
    )
    exact = distinct_counts(distinct_rollup(ev, 86400))
    m = {(r.event_type, r.bucket_ts): r.n_estimate for r in merged.collect()}
    d = {(r.event_type, r.bucket_ts): r.n_estimate for r in direct.collect()}
    e = {(r.event_type, r.bucket_ts): r.n_distinct for r in exact.collect()}
    assert m == d
    for k, exact_n in e.items():
        assert abs(m[k] - exact_n) <= 0.05 * exact_n, (k, m[k], exact_n)


def test_hll_shuffle_is_partial_agged(spark):
    """Scale shape: the sketch aggregation must show a partial (map-side)
    phase — shuffle volume is sketches, not raw entities."""
    ev = _events(spark)
    plan = (
        hll_rollup(ev, 3600)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_hll_sketch_agg" in plan.lower().replace(" ", "_") or (
        "HllSketchAgg" in plan and "partial" in plan.lower()
    ), plan


class TestSlidingDistinct:
    def test_brute_force_parity(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = []
        # deterministic scatter incl. exact hour boundaries and repeats
        for i in range(200):
            m = (i * 37) % 600  # minutes over a 10h span
            rows.append(((i * 13) % 17, base + dt.timedelta(minutes=m)))
        rows.append((99, base))  # exactly on the epoch-aligned boundary
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        from afspark.operators.distinct import sliding_distinct

        got = {
            r["window_start"]: r["n_distinct"]
            for r in sliding_distinct(df, 21600, 3600).collect()
        }
        # brute force: every hourly start h covering at least one event
        import collections

        want = collections.defaultdict(set)
        for u, ts in rows:
            e = int(ts.timestamp())
            he = e // 3600
            for j in range(6):
                want[(he - j) * 3600].add(u)
        assert got == {k: len(v) for k, v in want.items()}

    def test_window_count_per_event(self, spark):
        # one event -> exactly window/hop = 6 windows
        import datetime as dt

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 5, 30))],
            "user_id long, ts timestamp",
        )
        from afspark.operators.distinct import sliding_distinct

        out = sliding_distinct(df, 21600, 3600).collect()
        assert len(out) == 6
        assert all(r["n_distinct"] == 1 for r in out)
