"""Time-series analytics over points and rollup tiers.

PromQL-style counter rate/increase with reset handling, and rolling
z-score anomaly detection — the standard monitoring-engine query pair on
top of a rollup store (the reference has no engine layer; these extend
SURVEY.md §2.9's streaming/tier semantics the way every production TSDB
does).

Both are pure Catalyst window/aggregation expressions (whole-stage
codegen, no Python).  The per-series windows partition by series_id; the
skew story is the same as every per-series op here: hot series are split
by the planner's salting machinery upstream, and window frames are
bounded (lag-1 / N rows), so state per task is O(frame), not O(series).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def counter_increase(
    points: DataFrame,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-sample increase of a monotone counter, with reset handling.

    PromQL `increase` semantics: delta to the previous sample; a NEGATIVE
    delta means the counter reset (process restart), in which case the
    increase is the raw new value (the counter restarted from 0).  The
    first sample of a series contributes no increase (null).

    One lag-1 window per series — a single shuffle on the series key,
    O(1) state per row.  Ordering tiebreaks on the value so duplicate
    timestamps (possible in the events stream) yield a deterministic,
    engine-independent lag sequence.
    """
    w = W.partitionBy(*keys).orderBy(ts_col, value_col)
    prev = F.lag(value_col).over(w)
    delta = F.col(value_col) - prev
    inc = F.when(prev.isNull(), F.lit(None).cast("double")).when(
        delta < 0, F.col(value_col)
    ).otherwise(delta)
    return points.withColumn("increase", inc)


def rate_per_bucket(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(series, bucket) counter rate: sum(increase)/bucket_seconds.

    The lag window and the bucket aggregation share the same series
    shuffle; the aggregation is algebraic (map-side combined).  Output:
    keys + bucket_ts, n_samples, increase_sum, rate_per_sec.
    """
    from .rollup import bucket_ts

    inc = counter_increase(points, keys, ts_col, value_col)
    return (
        inc.withColumn("bucket_ts", bucket_ts(F.col(ts_col), bucket_seconds))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("increase").alias("increase_sum"),
            (F.sum("increase") / F.lit(float(bucket_seconds))).alias("rate_per_sec"),
        )
    )


def rolling_zscore(
    tier: DataFrame,
    n_window: int = 24,
    keys: list[str] = ["series_id"],
    ts_col: str = "bucket_ts",
    value_col: str = "avg",
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly flag over the PRECEDING n_window buckets.

    The baseline excludes the current point (rowsBetween(-n, -1)), so an
    anomaly cannot suppress itself.  Variance is computed from integer-
    safe running sums with the explicit textbook formula
    (sumsq - sum^2/n)/(n-1) rather than stddev_samp, so a DuckDB oracle
    evaluating the same expression over the same operands is bit-
    identical (aggregate-internal algorithms differ between engines;
    explicit arithmetic does not).  Rows with fewer than 2 baseline
    points get a null z-score.

    Bounded frame -> O(n_window) state per task; same single series
    shuffle as every tier scan.
    """
    w = (
        W.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(-n_window, -1)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    z = (v - mean) / F.sqrt(var)
    return (
        tier.withColumn("baseline_n", n)
        .withColumn("baseline_mean", mean)
        .withColumn(
            "zscore", F.when((F.col("baseline_n") >= 2) & (var > 0), z)
        )
        .withColumn(
            "is_anomaly",
            F.when(F.col("zscore").isNotNull(), F.abs(F.col("zscore")) > threshold)
            .otherwise(F.lit(False)),
        )
    )
