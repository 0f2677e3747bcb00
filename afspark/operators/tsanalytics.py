"""Time-series analytics over points and rollup tiers.

PromQL-style counter rate/increase with reset handling, and rolling
z-score anomaly detection — the standard monitoring-engine query pair on
top of a rollup store (the reference has no engine layer; these extend
SURVEY.md §2.9's streaming/tier semantics the way every production TSDB
does).

Both are pure Catalyst window/aggregation expressions (whole-stage
codegen, no Python).  counter_increase's default path chunks the lag
recurrence by time (the EWMA two-level decomposition), so a hot series
never serializes into one sort task; rolling_zscore partitions by
series_id with a BOUNDED frame (O(n_window) state per task), which is
inherent to its semantics and safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def counter_increase(
    points: DataFrame,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_seconds: int | None = 3600,
) -> DataFrame:
    """Per-sample increase of a monotone counter, with reset handling.

    PromQL `increase` semantics: delta to the previous sample; a NEGATIVE
    delta means the counter reset (process restart), in which case the
    increase is the raw new value (the counter restarted from 0).  The
    first sample of a series contributes no increase (null).  Ordering
    tiebreaks on the value so duplicate timestamps (possible in the
    events stream) yield a deterministic, engine-independent lag
    sequence.

    Default path is the TWO-LEVEL chunk decomposition (the EWMA trick,
    tsanalytics.ewma, applied to the lag recurrence): rows are lag-1'd
    within (series, time-chunk) windows — parallel across series AND
    time, so a hot series' history never lands in one sort task — and
    the cross-chunk boundary value (the last (ts, value)-ordered sample
    per chunk, i.e. max(struct(ts, value)) — an algebraic map-side-
    combinable aggregate) is lagged over a tiny one-row-per-chunk
    per-series window, then joined back to fill each chunk's first row.
    Chunk grouping preserves global (ts, value) order because floor-
    bucketing is monotone in ts.  All Catalyst: one shuffle of the data
    by (series, chunk) shared by the window and the chunk aggregate;
    the carry side is tiny (one row per series-chunk).

    ``chunk_seconds=None`` selects the single per-series window (one
    sort task per series — fine for small/unskewed series, and the
    form a SQL oracle expresses directly).
    """
    if chunk_seconds is None:
        w = W.partitionBy(*keys).orderBy(ts_col, value_col)
        prev = F.lag(value_col).over(w)
    else:
        from .rollup import bucket_ts

        points = points.withColumn(
            "_chunk", bucket_ts(F.col(ts_col), chunk_seconds)
        )
        wloc = W.partitionBy(*keys, "_chunk").orderBy(ts_col, value_col)
        # the lag and the cross-chunk carry are wrapped in STRUCTS so that
        # "no previous row" (struct null -> consult the carry / yield the
        # single-window null) stays distinguishable from "previous row's
        # VALUE is a legitimate NULL" (struct non-null, field null) — a
        # bare-column coalesce would substitute the carry for mid-chunk
        # null values and diverge from the single-window form (tested)
        local_prev = F.lag(F.struct(F.col(value_col).alias("v"))).over(wloc)
        last_per_chunk = points.groupBy(*keys, "_chunk").agg(
            F.max(F.struct(ts_col, value_col)).alias("_last")
        )
        wser = W.partitionBy(*keys).orderBy("_chunk")
        carries = last_per_chunk.select(
            *keys,
            "_chunk",
            F.lag(F.col("_last")).over(wser).alias("_carry"),
        )
        points = points.withColumn("_lp", local_prev).join(
            carries, [*keys, "_chunk"]
        )
        prev = F.when(
            F.col("_lp").isNotNull(), F.col("_lp.v")
        ).otherwise(F.col(f"_carry.{value_col}"))
    delta = F.col(value_col) - prev
    inc = F.when(prev.isNull(), F.lit(None).cast("double")).when(
        delta < 0, F.col(value_col)
    ).otherwise(delta)
    out = points.withColumn("increase", inc)
    if chunk_seconds is not None:
        out = out.drop("_chunk", "_lp", "_carry")
    return out


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


def topk_per_bucket(
    points: DataFrame,
    tier_seconds: int,
    k: int = 3,
    term_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Heavy hitters per time bucket: top-k terms by count in each bucket.

    Group-wise top-k, the trending-terms query.  One algebraic count
    aggregation, then a rank window PARTITIONED BY BUCKET — parallel
    across buckets (the window's partition count grows with time, never a
    global sort).  Ties break on the term for deterministic,
    engine-independent output.  At 100 TB the count shuffle dominates and
    is map-side combined; the ranked input is already one row per
    (bucket, term).
    """
    from .rollup import bucket_ts

    counts = (
        points.withColumn("bucket_ts", bucket_ts(F.col(ts_col), tier_seconds))
        .groupBy("bucket_ts", term_col)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = W.partitionBy("bucket_ts").orderBy(F.col("n").desc(), F.col(term_col))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def ewma(
    points: DataFrame,
    alpha: float,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Sample-order EWMA per series: y_i = (1-a)*y_{i-1} + a*x_i, y_{-1}=0.

    EWMA looks inherently sequential, but it is a LINEAR recurrence, so it
    parallelizes with the same two-level trick as the series offsets
    (sources/pages.py): rows are chunked by time; each (series, chunk)
    computes a zero-initialized local pass independently (one Arrow task
    per chunk — parallel across series AND time); the cross-chunk state
    obeys state_k = local_last_k + (1-a)^{n_k} * state_{k-1}, a recurrence
    over ONE ROW PER CHUNK, evaluated in a tiny per-series pass; the carry
    re-enters each row as (1-a)^{p+1} * carry_in (p = row position in its
    chunk), which underflows to exactly the same negligible contribution
    the sequential pass would have.  No single-task-per-series window
    anywhere; skew bound is one chunk, not one series.

    Matches the sequential recurrence to float round-off (tested at
    rtol 1e-12 against a numpy loop).  Sample-order semantics: gaps in
    time do not extra-decay (index EWMA, not time-decay EWMA).
    """
    import numpy as np
    import pandas as pd

    from .rollup import bucket_ts

    one_minus = 1.0 - alpha
    src = points.withColumn("_chunk", bucket_ts(F.col(ts_col), chunk_seconds))
    key_cols = [*keys, "_chunk"]

    fields = src.schema
    ts_t = fields[ts_col].dataType.simpleString()
    key_schema = ", ".join(f"{k} {fields[k].dataType.simpleString()}" for k in keys)
    local_schema = (
        f"{key_schema}, _chunk timestamp, {ts_col} {ts_t}, "
        f"{value_col} double, _p long, _local double"
    )

    def local_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort").reset_index(
            drop=True
        )
        x = pdf[value_col].to_numpy(np.float64)
        # prepend-zero trick: pandas ewm(adjust=False) sets y_0 = x_0, so
        # seed with 0 to realize the y_{-1}=0 convention, then drop it
        z = pd.Series(np.concatenate([[0.0], x]))
        local = z.ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
        pdf["_p"] = np.arange(len(pdf), dtype=np.int64)
        pdf["_local"] = local
        return pdf[[*keys, "_chunk", ts_col, value_col, "_p", "_local"]]

    local = src.select(*key_cols, ts_col, value_col).groupBy(*key_cols).applyInPandas(
        lambda pdf: local_pass(pdf), local_schema
    )
    # consumed twice (chunk aggregates + final join): persist so the Arrow
    # pass runs once.  Cache lifetime is the CALLER's: the returned
    # DataFrame is lazy and reads this cache, so ewma() cannot unpersist
    # before the caller materializes; the block is reclaimed by the
    # ContextCleaner when the returned DataFrame is garbage collected —
    # in a long-lived session that calls ewma() repeatedly and HOLDS the
    # results, unpersist via df.sparkSession.catalog.clearCache() or drop
    # the references.
    local = local.persist()

    agg = local.groupBy(*key_cols).agg(
        F.max_by("_local", "_p").alias("_a"),
        F.count(F.lit(1)).alias("_n"),
    )

    carry_schema = f"{key_schema}, _chunk timestamp, _carry double"

    def chunk_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_chunk").reset_index(drop=True)
        state = 0.0
        carries = []
        for a, n in zip(pdf["_a"].to_numpy(), pdf["_n"].to_numpy()):
            carries.append(state)  # carry INTO this chunk
            state = a + (one_minus ** int(n)) * state
        pdf["_carry"] = carries
        return pdf[[*keys, "_chunk", "_carry"]]

    carries = agg.groupBy(*keys).applyInPandas(lambda pdf: chunk_scan(pdf), carry_schema)

    out = local.join(carries, key_cols)
    y = F.col("_local") + F.pow(F.lit(one_minus), F.col("_p") + 1) * F.col("_carry")
    return out.withColumn("ewma", y).drop("_chunk", "_p", "_local", "_carry")
