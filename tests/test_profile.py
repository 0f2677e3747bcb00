"""Single-pass table profiler (operators/profile.py)."""

import pytest
from pyspark.sql import functions as F

from afspark.operators.profile import PROFILE_COLUMNS, profile_table


@pytest.fixture(scope="module")
def sample(spark):
    rows = [
        (1, 10, "a", "xx"),
        (2, 20, "b", None),
        (3, None, "a", "yyyy"),
        (4, 40, None, "zz"),
        (5, 30, "c", "xx"),
    ]
    return spark.createDataFrame(rows, "id long, v long, cat string, s string")


def test_profile_hand_golden(sample):
    out = profile_table(sample, numeric_cols=["id", "v"], string_cols=["cat", "s"])
    assert out.columns == PROFILE_COLUMNS
    m = {r["col"]: r.asDict() for r in out.collect()}
    assert set(m) == {"id", "v", "cat", "s"}
    assert all(r["n"] == 5 for r in m.values())

    assert m["id"]["n_null"] == 0 and m["id"]["n_distinct"] == 5
    assert m["id"]["min_num"] == 1.0 and m["id"]["max_num"] == 5.0
    assert m["id"]["mean"] == 3.0 and m["id"]["min_str"] is None

    assert m["v"]["n_null"] == 1 and m["v"]["n_distinct"] == 4
    assert m["v"]["mean"] == 25.0  # (10+20+40+30)/4

    assert m["cat"]["n_null"] == 1 and m["cat"]["n_distinct"] == 3
    assert m["cat"]["min_str"] == "a" and m["cat"]["max_str"] == "c"
    assert m["cat"]["avg_len"] == 1.0 and m["cat"]["min_num"] is None

    assert m["s"]["n_null"] == 1 and m["s"]["n_distinct"] == 3
    assert m["s"]["avg_len"] == 2.5  # (2+4+2+2)/4


def test_profile_single_scan_plan(sample):
    """All metrics come from ONE aggregation over one scan: the physical
    plan must contain exactly one Scan and no Join (no per-column jobs)."""
    out = profile_table(sample, numeric_cols=["id"], string_cols=["cat"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 1
    assert "Join" not in plan


def test_profile_approx_distinct_path(sample):
    out = profile_table(
        sample, numeric_cols=["id", "v"], exact_distinct=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # HLL path: no distinct-aggregate expand
    m = {r["col"]: r.asDict() for r in out.collect()}
    # HLL++ is exact at these cardinalities
    assert m["id"]["n_distinct"] == 5 and m["v"]["n_distinct"] == 4


def test_profile_empty_table(spark):
    df = spark.createDataFrame([], "a long, b string")
    m = {r["col"]: r.asDict()
         for r in profile_table(df, ["a"], ["b"]).collect()}
    assert m["a"]["n"] == 0 and m["a"]["mean"] is None
    assert m["b"]["avg_len"] is None and m["b"]["min_str"] is None


def test_profile_partitioning_invariant(sample):
    base = profile_table(sample, ["id", "v"], ["cat", "s"]).collect()
    shuffled = profile_table(
        sample.repartition(7), ["id", "v"], ["cat", "s"]
    ).collect()
    key = lambda rows: sorted(map(tuple, rows))
    assert key(base) == key(shuffled)


class TestChi2Independence:
    def test_hand_golden_2x2(self, spark):
        # contingency table: a/x=10, a/y=20, b/x=30, b/y=40
        import numpy as np

        rows = (
            [("a", "x")] * 10 + [("a", "y")] * 20
            + [("b", "x")] * 30 + [("b", "y")] * 40
        )
        df = spark.createDataFrame(rows, "lang string, source string")
        from afspark.operators.profile import chi2_independence

        out = chi2_independence(df, "lang", "source").collect()[0]
        o = np.array([[10, 20], [30, 40]], dtype=float)
        n = o.sum()
        e = np.outer(o.sum(1), o.sum(0)) / n
        # the operator rounds each cell term to nanos before summing
        chi2 = sum(
            np.floor(t * 1e9 + 0.5) for t in ((o - e) ** 2 / e).ravel()
        )
        assert out["n"] == 100
        assert out["dof"] == 1
        assert out["chi2_nanos"] == int(chi2)
        v = np.sqrt((chi2 / 1e9) / (n * 1))
        assert abs(out["cramers_v"] - v) < 1e-9

    def test_absent_cell_mass(self, spark):
        # (b, y) never occurs: o=0, e=rt*ct/N must still contribute e
        import numpy as np

        rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 10
        df = spark.createDataFrame(rows, "lang string, source string")
        from afspark.operators.profile import chi2_independence

        out = chi2_independence(df, "lang", "source").collect()[0]
        o = np.array([[5, 5], [10, 0]], dtype=float)
        e = np.outer(o.sum(1), o.sum(0)) / o.sum()
        # reproduce the closed-form absent-cell correction in nanos
        present = [(0, 0), (0, 1), (1, 0)]
        tp = sum(
            np.floor((o[i, j] - e[i, j]) ** 2 / e[i, j] * 1e9 + 0.5)
            for i, j in present
        )
        se = sum(np.floor(e[i, j] * 1e9 + 0.5) for i, j in present)
        want = int(tp + o.sum() * 1e9 - se)
        assert out["chi2_nanos"] == want
        # and it approximates the true chi2 including the absent cell
        true = ((o - e) ** 2 / e).sum()
        assert abs(out["chi2_nanos"] / 1e9 - true) < 1e-6

    def test_independent_columns_near_zero(self, spark):
        # perfectly proportional table -> chi2 == 0
        rows = (
            [("a", "x")] * 6 + [("a", "y")] * 4
            + [("b", "x")] * 12 + [("b", "y")] * 8
        )
        df = spark.createDataFrame(rows, "lang string, source string")
        from afspark.operators.profile import chi2_independence

        out = chi2_independence(df, "lang", "source").collect()[0]
        assert abs(out["chi2_nanos"]) <= 4  # nanos rounding slack


class TestBenford:
    def test_digit_extraction_and_probs(self, spark):
        # values whose cents are 1, 19, 199, 2000, -950, 0 (dropped)
        rows = [(0.01,), (0.19,), (1.99,), (20.0,), (-9.5,), (0.0,)]
        df = spark.createDataFrame(rows, "value double")
        from afspark.operators.profile import benford_first_digit

        out = {r["digit"]: r for r in
               benford_first_digit(df, "value").collect()}
        assert set(out) == set(range(1, 10))  # all digits, zeros included
        assert out[1]["n"] == 3  # 1, 19, 199
        assert out[2]["n"] == 1  # 2000
        assert out[9]["n"] == 1  # 950
        import math

        assert abs(out[1]["p_obs"] - 3 / 5) < 1e-12
        assert abs(out[1]["p_benford"] - math.log10(2)) < 1e-12
        # absent digit keeps its zero-cell chi2 mass: n_total * p_benford
        assert out[3]["n"] == 0 and out[3]["p_obs"] == 0.0
        want = 5 * math.log10(1 + 1 / 3)
        assert out[3]["chi2c_nanos"] == math.floor(want * 1e9 + 0.5)

    def test_benford_sample_scores_low(self, spark):
        # magnitudes spanning decades (log-uniform) ~ Benford
        import numpy as np

        rng = np.random.default_rng(2)
        # keep magnitudes >= 100 so integer rounding can't move a value
        # across a first-digit boundary by more than ~0.5%
        v = np.power(10.0, rng.uniform(2, 6, size=20000))
        df = spark.createDataFrame(
            [(float(x),) for x in v], "value double"
        )
        from afspark.operators.profile import benford_first_digit

        rows = benford_first_digit(df, "value", scale=1).collect()
        chi2 = sum(r["chi2c_nanos"] for r in rows) / 1e9
        assert chi2 < 30  # chi2_8 at alpha=0.0001 is ~33


class TestGini:
    def test_uniform_and_extreme(self, spark):
        from afspark.operators.profile import gini_concentration

        # uniform: G = 0; one-holds-all of n=4: G = (n-1)/n = 0.75
        rows = [("u", 5), ("u", 5), ("u", 5), ("u", 5),
                ("e", 0), ("e", 0), ("e", 0), ("e", 12)]
        df = spark.createDataFrame(rows, "source string, n_chars long")
        out = {r["source"]: r["gini"]
               for r in gini_concentration(df, "n_chars",
                                           keys=["source"]).collect()}
        assert abs(out["u"]) < 1e-12
        assert abs(out["e"] - 0.75) < 1e-12

    def test_numpy_parity(self, spark):
        import numpy as np

        from afspark.operators.profile import gini_concentration

        rng = np.random.default_rng(6)
        x = rng.integers(1, 1000, size=200)
        df = spark.createDataFrame(
            [(int(v),) for v in x], "n_chars long"
        )
        out = gini_concentration(df, "n_chars").collect()[0]
        xs = np.sort(x)
        i = np.arange(1, len(xs) + 1)
        want = 2 * (i * xs).sum() / (len(xs) * xs.sum()) \
            - (len(xs) + 1) / len(xs)
        assert abs(out["gini"] - want) < 1e-12
