"""HDR log-bucket sketch: index exactness vs numpy, tier-merge identity,
and the rank-quantile error guarantee vs exact order statistics."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from afspark.operators.hdrsketch import (
    SUBBUCKETS,
    hdr_merge,
    hdr_quantile,
    hdr_rollup,
)
from afspark.operators.rollup import TIERS

UTC = dt.timezone.utc


def np_idx(v: np.ndarray, s: int = SUBBUCKETS) -> np.ndarray:
    """Local twin of _idx_sql for golden comparison."""
    v = v.astype(np.int64)
    out = np.full(v.shape, -1, dtype=np.int64)
    pos = v > 0
    msb = np.zeros(v.shape, dtype=np.int64)
    msb[pos] = np.floor(np.log2(v[pos])).astype(np.int64)
    # log2 of exact ints < 2^53 on powers of 2 is exact in numpy, but be
    # safe: fix up any off-by-one from float log at the boundaries
    msb[pos] = np.where(2 ** msb[pos] > v[pos], msb[pos] - 1, msb[pos])
    msb[pos] = np.where(2 ** (msb[pos] + 1) <= v[pos], msb[pos] + 1, msb[pos])
    sub = (v * s) // np.maximum(2**msb, 1) - s
    out[pos] = (msb * s + sub)[pos]
    return out


@pytest.fixture(scope="module")
def cents(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.select(
        F.col("user_id").cast("string").alias("series_id"),
        "ts",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("value"),
    )


def test_index_matches_numpy_golden(spark):
    vals = np.r_[np.arange(1, 2050), [4095, 4096, 4097, 49002, 2**40, 0, -7]]
    df = spark.createDataFrame([(int(v),) for v in vals], "value long")
    got = (
        hdr_rollup(
            df.withColumn("series_id", F.lit("s")).withColumn(
                "ts", F.lit(dt.datetime(2024, 1, 1, tzinfo=UTC))
            ),
            TIERS["1h"],
        )
        .select("idx")
        .toPandas()["idx"]
        .to_numpy()
    )
    want = np.unique(np_idx(vals))
    assert np.array_equal(np.sort(got), np.sort(want))


def test_huge_values_saturate_no_int64_wrap(spark):
    """Scaled values past 2^57-1 saturate into the top octave-56 cell
    (MAX_SCALED) instead of overflowing v*S / the read-back midpoint —
    Spark would silently wrap where DuckDB raises, so the domain is
    bounded identically in both engines."""
    from afspark.operators.hdrsketch import MAX_SCALED

    vals = [MAX_SCALED, MAX_SCALED + 1, 2**60, 2**62 + 3]
    df = (
        spark.createDataFrame([(int(v),) for v in vals], "value long")
        .withColumn("series_id", F.lit("s"))
        .withColumn("ts", F.lit(dt.datetime(2024, 1, 1, tzinfo=UTC)))
    )
    cells = hdr_rollup(df, TIERS["1h"])
    rows = cells.collect()
    top = int(np_idx(np.array([MAX_SCALED]))[0])
    assert [(r.idx, r.n) for r in rows] == [(top, len(vals))]
    est = hdr_quantile(cells, 99, 100).collect()[0].est
    assert est > 0 and np.isfinite(est)  # wrapped midpoint would go negative


def test_merge_identity_1d_from_1h(cents):
    """Sketch cells merged 1h -> 1d == sketch built from raw at 1d."""
    t1h = hdr_rollup(cents, TIERS["1h"])
    merged = hdr_merge(t1h, TIERS["1d"])
    direct = hdr_rollup(cents, TIERS["1d"])
    a = {(r.series_id, r.bucket_ts, r.idx): r.n for r in merged.collect()}
    b = {(r.series_id, r.bucket_ts, r.idx): r.n for r in direct.collect()}
    assert a == b


def test_quantile_error_guarantee(cents):
    """p50/p99 estimates within 1/(2S) relative of the exact rank stat."""
    t1d = hdr_rollup(cents, TIERS["1d"])
    for q_num, q_den in [(1, 2), (99, 100)]:
        est = {
            (r.series_id, r.bucket_ts): r.est
            for r in hdr_quantile(t1d, q_num, q_den).collect()
        }
        raw = (
            cents.withColumn(
                "bucket_ts",
                F.timestamp_seconds(
                    (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
                ),
            )
            .groupBy("series_id", "bucket_ts")
            .agg(F.collect_list("value").alias("vs"))
            .collect()
        )
        assert est
        for r in raw:
            vs = np.sort(np.array(r.vs, dtype=np.int64))
            rank = -(-q_num * len(vs) // q_den)  # ceil(q * n)
            exact = vs[max(rank - 1, 0)] / 100.0
            got = est[(r.series_id, r.bucket_ts)]
            assert got == pytest.approx(
                exact, rel=1.0 / (2 * SUBBUCKETS) + 1e-12
            ), (r.series_id, r.bucket_ts, q_num, q_den, exact, got)


def test_quantile_exactly_one_row_per_group(cents):
    t1h = hdr_rollup(cents, TIERS["1h"])
    n_groups = t1h.select("series_id", "bucket_ts").distinct().count()
    n_est = hdr_quantile(t1h, 9, 10).count()
    assert n_est == n_groups


def test_cell_cardinality_bounded(cents):
    """Per series-bucket live cells stay under the documented cap."""
    t1d = hdr_rollup(cents, TIERS["1d"])
    worst = (
        t1d.groupBy("series_id", "bucket_ts")
        .agg(F.count(F.lit(1)).alias("cells"), F.sum("n").alias("pts"))
        .agg(F.max("cells").alias("mx"))
        .collect()[0]
        .mx
    )
    assert worst <= SUBBUCKETS * 63 + 1


def test_incremental_refresh_equals_full_rebuild(cents):
    """committed cells + late batch via hdr_refresh_incremental ==
    sketching the full history — bit-exact cell counts."""
    from pyspark.sql import functions as F

    from afspark.operators.hdrsketch import hdr_refresh_incremental

    tagged = cents.withColumn(
        "_h", F.pmod(F.xxhash64("series_id", "ts"), F.lit(5))
    )
    early = tagged.filter(F.col("_h") != 0).drop("_h")
    late = tagged.filter(F.col("_h") == 0).drop("_h")
    committed = hdr_rollup(early, TIERS["1h"])
    refreshed = hdr_refresh_incremental(committed, late, TIERS["1h"])
    full = hdr_rollup(cents, TIERS["1h"])
    a = {(r.series_id, r.bucket_ts, r.idx): r.n for r in refreshed.collect()}
    b = {(r.series_id, r.bucket_ts, r.idx): r.n for r in full.collect()}
    assert a == b


def test_incremental_refresh_broadcasts_touched_set(cents):
    from pyspark.sql import functions as F

    from afspark.operators.hdrsketch import hdr_refresh_incremental

    tagged = cents.withColumn(
        "_h", F.pmod(F.xxhash64("series_id", "ts"), F.lit(5))
    )
    committed = hdr_rollup(tagged.filter(F.col("_h") != 0).drop("_h"), TIERS["1h"])
    out = hdr_refresh_incremental(
        committed, tagged.filter(F.col("_h") == 0).drop("_h"), TIERS["1h"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
