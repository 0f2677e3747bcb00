"""Retention matrix + funnel conversion goldens."""

import datetime as dtm

import pytest
from pyspark.sql import functions as F

from afspark.operators.cohorts import funnel_conversion, retention_matrix
from afspark.operators.distinct import distinct_rollup


def d(day, sec=0):
    return dtm.datetime(2024, 1, 1) + dtm.timedelta(days=day, seconds=sec)


def test_retention_matrix_hand_golden(spark):
    """day0 actives {1,2,3}; day1 {2,3}; day2 {3,9}: retention(0,1)=2/3,
    retention(0,2)=1/3, retention(1,1)=1/2."""
    rows = [
        (1, d(0)), (2, d(0)), (3, d(0)),
        (2, d(1)), (3, d(1)),
        (3, d(2)), (9, d(2)),
        (1, d(0, 500)),  # duplicate activity same day: tier dedups it
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    tier = distinct_rollup(ev, 86400, entity_col="user_id", keys=[])
    out = {
        (r.day_epoch // 86400 % 100, r.lag): r
        for r in retention_matrix(tier, max_lag_days=7).collect()
    }
    base_day = min(k[0] for k in out)
    g = {(k[0] - base_day, k[1]): v for k, v in out.items()}
    assert (g[(0, 1)].n_active, g[(0, 1)].n_retained) == (3, 2)
    assert g[(0, 1)].retention == pytest.approx(2 / 3)
    assert (g[(0, 2)].n_active, g[(0, 2)].n_retained) == (3, 1)
    assert (g[(1, 1)].n_active, g[(1, 1)].n_retained) == (2, 1)
    assert (2, 1) not in g  # nobody returns after day 2


def test_funnel_order_and_horizon(spark):
    """u1 completes in order; u2 clicks BEFORE viewing (click must not
    count); u3 converts outside the horizon (dropped); u4 only views."""
    rows = [
        # u1: view -> click -> purchase, in order
        (1, "view", d(0, 10)), (1, "click", d(0, 20)), (1, "purchase", d(0, 30)),
        # u2: click precedes the first view; purchase without valid click
        (2, "click", d(0, 5)), (2, "view", d(0, 50)), (2, "purchase", d(0, 60)),
        # u3: click lands past the 1h horizon
        (3, "view", d(0, 0)), (3, "click", d(0, 4000)),
        # u4: view only
        (4, "view", d(1, 0)),
        # u5: same-second view and click (>= bound admits the tie)
        (5, "view", d(1, 7)), (5, "click", d(1, 7)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r.cohort_epoch // 86400 % 100: r
        for r in funnel_conversion(
            ev, ["view", "click", "purchase"], horizon_seconds=3600
        ).collect()
    }
    d0 = min(out)
    day0, day1 = out[d0], out[d0 + 1]
    assert (day0.n_s1, day0.n_s2, day0.n_s3) == (3, 1, 1)  # u1 only advances
    assert (day1.n_s1, day1.n_s2) == (2, 1)                # u5 tie admitted
    assert day1.n_s3 == 0


def test_funnel_no_horizon_counts_late_steps(spark):
    rows = [
        (3, "view", d(0, 0)), (3, "click", d(0, 4000)), (3, "purchase", d(2, 0)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    r = funnel_conversion(ev, ["view", "click", "purchase"]).collect()[0]
    assert (r.n_s1, r.n_s2, r.n_s3) == (1, 1, 1)


class TestTransitionEntropy:
    def test_hand_golden(self, spark):
        import datetime as dt
        import math

        base = dt.datetime(2024, 1, 1)
        # sequence A B A B A: pairs AB,BA,AB,BA -> p={AB:1/2, BA:1/2}
        rows = [
            (1, i, base + dt.timedelta(minutes=i), s)
            for i, s in enumerate("ABABA")
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, "
            "event_type string"
        )
        from afspark.operators.cohorts import transition_entropy

        out = transition_entropy(df).collect()[0]
        assert out["n_transitions"] == 4
        assert out["n_pair_kinds"] == 2
        assert abs(out["entropy_bits"] - 1.0) < 1e-9

    def test_constant_sequence_zero_entropy(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        rows = [
            (7, i, base + dt.timedelta(minutes=i), "X") for i in range(10)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, "
            "event_type string"
        )
        from afspark.operators.cohorts import transition_entropy

        out = transition_entropy(df).collect()[0]
        assert out["entropy_nanos"] == 0
        assert out["n_pair_kinds"] == 1

    def test_numpy_parity(self, spark):
        import datetime as dt
        import numpy as np

        base = dt.datetime(2024, 1, 1)
        rng = np.random.default_rng(4)
        seq = [chr(65 + int(x)) for x in rng.integers(0, 4, size=100)]
        rows = [
            (3, i, base + dt.timedelta(minutes=i), s)
            for i, s in enumerate(seq)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_id long, ts timestamp, "
            "event_type string"
        )
        from afspark.operators.cohorts import transition_entropy
        import collections

        out = transition_entropy(df).collect()[0]
        c = collections.Counter(zip(seq, seq[1:]))
        N = sum(c.values())
        want = sum(
            int(np.floor(-(n / N) * np.log2(n / N) * 1e9 + 0.5))
            for n in c.values()
        )
        assert out["entropy_nanos"] == want
