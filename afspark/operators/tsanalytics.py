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
    # reset flag (PromQL `resets`): previous sample exists and the counter
    # went DOWN.  Null when there is no previous sample, so bucket-level
    # sums skip series heads exactly like increase does.
    is_reset = F.when(prev.isNull(), F.lit(None).cast("int")).otherwise(
        (delta < 0).cast("int")
    )
    out = points.withColumn("increase", inc).withColumn("is_reset", is_reset)
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
            F.sum("is_reset").alias("reset_count"),
        )
    )


def increase_extrapolated_per_bucket(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    counter: bool = True,
) -> DataFrame:
    """PromQL ``increase()`` with Prometheus' boundary EXTRAPOLATION,
    per (series, bucket) — the semantic rate_per_bucket deliberately
    does NOT implement.

    Prometheus does not return the raw sum of deltas over a range: it
    extrapolates to the range boundaries (promql extrapolatedRate),
    because samples rarely land exactly on the window edges.  Per
    bucket, with samples paired strictly WITHIN the bucket (true PromQL
    range pairing — the cross-boundary pair belongs to no bucket):

        raw      = sum of reset-corrected deltas
        sampled  = last_sample_time - first_sample_time
        avg      = sampled / (n - 1)
        d_start  = first_sample_time - bucket_start, capped by the
                   counter-zero heuristic sampled * first_value / raw
                   (a counter cannot have been negative before the
                   window, so extrapolating past its zero point is
                   wrong) when raw > 0 and first_value >= 0
        d_end    = bucket_end - last_sample_time
        each of d_start/d_end collapses to avg/2 when >= 1.1 * avg
        increase = raw * (sampled + d_start + d_end) / sampled

    All time math runs on integer MICROSECONDS (exact in both Spark and
    the DuckDB oracle: unix_micros == epoch_us) and the float expression
    tree is written identically on both sides, so results match bit-for-
    bit on cents-integer counters.

    ``counter=False`` gives PromQL ``delta()`` (gauge semantics):
    raw = last - first with NO reset correction and NO counter-zero
    cap — exactly Prometheus' extrapolatedRate with isCounter=false.

    Plan shape: one shuffle on (keys, bucket) shared by the in-bucket
    lag window and the aggregation — parallelism grows with time, a hot
    series spreads over its buckets (never one sort task per series).
    Buckets with n < 2 or zero sampled interval are dropped (PromQL
    needs two points).

    Output: keys + bucket_ts, n_samples, raw_increase, increase
    (extrapolated), rate_per_sec.
    """
    from .rollup import bucket_ts

    bus = int(bucket_seconds) * 1_000_000
    src = (
        points.withColumn("bucket_ts", bucket_ts(F.col(ts_col), bucket_seconds))
        # parquet timestamps load as NTZ; session tz is UTC (session.py),
        # so the cast makes unix_micros the exact naive-as-UTC micros —
        # the same integer DuckDB's epoch_us(ts) yields
        .withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
        .withColumn("_v", F.col(value_col))
    )
    w = W.partitionBy(*keys, "bucket_ts").orderBy("_us", "_v")
    prev = F.lag("_v").over(w)
    delta = F.col("_v") - prev
    inc = (
        F.when(prev.isNull(), F.lit(None).cast("double"))
        .when(delta < 0, F.col("_v"))
        .otherwise(delta)
    )
    if counter:
        raw_agg = F.sum("_inc")
        src = src.withColumn("_inc", inc)
    else:
        # gauge delta needs no lag window at all — last minus first
        raw_agg = (
            F.max(F.struct("_us", "_v"))["_v"] - F.min(F.struct("_us", "_v"))["_v"]
        )
    agg = (
        src
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            raw_agg.alias("_raw"),
            F.min(F.struct("_us", "_v")).alias("_first"),
            F.max("_us").alias("_lus"),
        )
    )
    range_start = F.unix_micros(F.col("bucket_ts"))
    sampled = (F.col("_lus") - F.col("_first._us")).cast("double")
    n1 = (F.col("n_samples") - F.lit(1)).cast("double")
    avg = sampled / n1
    d_start = (F.col("_first._us") - range_start).cast("double")
    d_end = (range_start + F.lit(bus) - F.col("_lus")).cast("double")
    if counter:
        d_zero = sampled * (F.col("_first._v") / F.col("_raw"))
        d_start = F.when(
            (F.col("_raw") > 0) & (F.col("_first._v") >= 0) & (d_zero < d_start),
            d_zero,
        ).otherwise(d_start)
    thr = avg * F.lit(1.1)
    half = avg / F.lit(2.0)
    d_start = F.when(d_start >= thr, half).otherwise(d_start)
    d_end = F.when(d_end >= thr, half).otherwise(d_end)
    factor = (sampled + d_start + d_end) / sampled
    extrap = F.col("_raw") * factor
    return (
        agg.filter((F.col("n_samples") >= 2) & (F.col("_lus") > F.col("_first._us")))
        .select(
            *keys,
            "bucket_ts",
            "n_samples",
            F.col("_raw").alias("raw_increase"),
            extrap.alias("increase"),
            (extrap / F.lit(float(bucket_seconds))).alias("rate_per_sec"),
        )
    )


def instant_delta_per_bucket(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """PromQL idelta/irate per (series, bucket): delta of the LAST TWO samples.

    For each (series, bucket) the two most recent samples (ordered by
    (ts, value) — the value tiebreak makes duplicate timestamps
    engine-independent) yield ``idelta`` (reset-aware: a negative delta
    means a counter reset, so the raw last value is used, PromQL irate
    semantics) and ``irate`` = idelta / gap seconds.  Buckets with one
    sample emit nulls.

    Plan shape: one shuffle by (keys, bucket); the row_number window is
    PARTITIONED BY BUCKET, so parallelism grows with time — a hot series
    splits across its buckets and never serializes into one sort task.
    The top-2 filter feeds a tiny algebraic pivot aggregation (one row
    per series-bucket enters it).
    """
    from .rollup import bucket_ts

    src = points.withColumn("bucket_ts", bucket_ts(F.col(ts_col), bucket_seconds))
    w = W.partitionBy(*keys, "bucket_ts").orderBy(
        F.col(ts_col).desc(), F.col(value_col).desc()
    )
    top2 = src.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= 2)
    last_v = F.max(F.when(F.col("_rk") == 1, F.col(value_col)))
    prev_v = F.max(F.when(F.col("_rk") == 2, F.col(value_col)))
    last_t = F.max(F.when(F.col("_rk") == 1, F.unix_timestamp(F.col(ts_col))))
    prev_t = F.max(F.when(F.col("_rk") == 2, F.unix_timestamp(F.col(ts_col))))
    agg = top2.groupBy(*keys, "bucket_ts").agg(
        F.count(F.lit(1)).alias("_n2"),
        last_v.alias("_lv"),
        prev_v.alias("_pv"),
        last_t.alias("_lt"),
        prev_t.alias("_pt"),
    )
    delta = F.col("_lv") - F.col("_pv")
    idelta = F.when(F.col("_n2") < 2, F.lit(None).cast("double")).when(
        delta < 0, F.col("_lv")
    ).otherwise(delta)
    gap = F.col("_lt") - F.col("_pt")
    irate = F.when(gap > 0, idelta / gap)
    return agg.select(
        *keys,
        "bucket_ts",
        idelta.alias("idelta"),
        gap.alias("gap_s"),
        irate.alias("irate"),
    )


def deriv_per_bucket(
    points: DataFrame,
    bucket_seconds: int,
    horizon_seconds: int = 3600,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """PromQL deriv + predict_linear per (series, bucket): least-squares slope.

    Simple linear regression of value on time within each bucket, from
    the five algebraic sums (n, Σt, Σv, Σtv, Σt²) — one map-side-combined
    aggregation, no window functions, no ordering sensitivity (the sums
    are commutative).  ``t`` is INTEGER SECONDS since the bucket start
    and callers pass integer-valued samples (cents), so every sum is an
    exact integer (engine-independent); only the final slope/intercept
    division is float.  Exactness bound: n·Σt² < 2^63 holds up to ~8e5
    samples per series-bucket at 1h granularity — far above any real
    scrape cadence.

    ``predict`` is the regression value ``horizon_seconds`` after the
    bucket START (PromQL predict_linear with the bucket as the range).
    Buckets with <2 samples or zero time spread emit null slope/predict.
    """
    from .rollup import bucket_ts

    src = points.withColumn("bucket_ts", bucket_ts(F.col(ts_col), bucket_seconds))
    t = (
        F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.col("bucket_ts"))
    ).cast("long")
    v = F.col(value_col).cast("long")
    agg = src.groupBy(*keys, "bucket_ts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(t).alias("_st"),
        F.sum(v).alias("_sv"),
        F.sum(t * v).alias("_stv"),
        F.sum(t * t).alias("_stt"),
    )
    n, st, sv, stv, stt = (F.col(c) for c in ("n", "_st", "_sv", "_stv", "_stt"))
    det = n * stt - st * st
    slope = F.when((n >= 2) & (det > 0), (n * stv - st * sv) / det)
    intercept = (sv - slope * st) / n
    predict = intercept + slope * F.lit(float(horizon_seconds))
    return agg.select(
        *keys,
        "bucket_ts",
        "n",
        slope.alias("slope_per_sec"),
        predict.alias("predict"),
    )


def cusum_detect(
    tier: DataFrame,
    target: float,
    slack: float,
    h: float,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
) -> DataFrame:
    """Two-sided CUSUM changepoint scores with alarm thresholds.

    Classic reset-at-zero CUSUM (Page 1954):
        s⁺_i = max(0, s⁺_{i-1} + (x_i − target − slack))
        s⁻_i = max(0, s⁻_{i-1} − (x_i − target + slack))
    looks sequential, but the one-sided recurrence has the closed form
    s_n = P_n − min(0, min_{k≤n} P_k) with P the plain cumulative sum of
    the deviations — so BOTH sides are a running sum + a running min:
    two Catalyst window aggregates, whole-stage codegen, no UDF, no
    sequential pass at all.  With integer (cents) values and integer
    target/slack every intermediate is exact, making the scores
    engine-identical for the oracle.

    Alarm: s⁺ > h (upward shift) or s⁻ > h (downward shift).  Output:
    keys + bucket_ts, value, cusum_hi, cusum_lo, alarm.
    """
    w = (
        W.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    d_hi = F.col(value_col) - F.lit(target) - F.lit(slack)
    d_lo = -(F.col(value_col) - F.lit(target)) - F.lit(slack)
    p_hi = F.sum(d_hi).over(w)
    p_lo = F.sum(d_lo).over(w)
    src = tier.withColumn("_ph", p_hi).withColumn("_pl", p_lo)
    m_hi = F.min("_ph").over(w)
    m_lo = F.min("_pl").over(w)
    s_hi = F.col("_ph") - F.least(F.lit(0.0), m_hi)
    s_lo = F.col("_pl") - F.least(F.lit(0.0), m_lo)
    return (
        src.withColumn("cusum_hi", s_hi)
        .withColumn("cusum_lo", s_lo)
        .withColumn(
            "alarm", (F.col("cusum_hi") > h) | (F.col("cusum_lo") > h)
        )
        .select(
            *keys,
            bucket_col,
            F.col(value_col).alias("value"),
            "cusum_hi",
            "cusum_lo",
            "alarm",
        )
    )


def alert_firing(
    tier: DataFrame,
    tier_seconds: int,
    threshold: float,
    for_buckets: int = 3,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
) -> DataFrame:
    """Prometheus-style threshold alerting with a `for:` duration.

    A bucket EXCEEDS when value > threshold; an alert FIRES on the
    ``for_buckets``-th consecutive exceeding bucket and stays firing
    until the run breaks (a non-exceeding bucket OR a missing bucket —
    contiguity is judged by the bucket INDEX, so a gap in the tier resets
    the pending counter, the conservative reading of absent data).

    Pure gaps-and-islands Catalyst: island id = bucket_index − rank among
    exceeding buckets (constant within a consecutive run), position
    within the island = rank − rank of the island head.  One series-keyed
    window over TIER rows (already ~3600x smaller than raw samples at
    1h), bounded state; at extreme per-series tier sizes the same
    chunk-decomposition as counter_increase applies, but tier cardinality
    makes that premature here.

    Output: keys + bucket_ts, value, exceeds, pending_n, firing.
    """
    idx = (F.unix_timestamp(F.col(bucket_col)) / tier_seconds).cast("long")
    exceeds = (F.col(value_col) > threshold).cast("int")
    src = tier.withColumn("_idx", idx).withColumn("exceeds", exceeds)
    w = W.partitionBy(*keys).orderBy("_idx")
    # rank among exceeding buckets only; island = _idx - rank is constant
    # per consecutive exceeding run and changes across gaps
    rk = F.sum("exceeds").over(w)
    src = src.withColumn("_island", F.when(F.col("exceeds") == 1, F.col("_idx") - rk))
    wi = W.partitionBy(*keys, "_island").orderBy("_idx")
    pending = F.when(F.col("exceeds") == 1, F.row_number().over(wi)).otherwise(
        F.lit(0)
    )
    out = src.withColumn("pending_n", pending).withColumn(
        "firing", F.col("pending_n") >= for_buckets
    )
    return out.select(
        *keys,
        bucket_col,
        F.col(value_col).alias("value"),
        F.col("exceeds").cast("boolean").alias("exceeds"),
        "pending_n",
        "firing",
    )


def lagged_cross_correlation(
    tier: DataFrame,
    tier_seconds: int,
    lags: list[int] = [0, 1],
    min_overlap: int = 12,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
    block_keys: list[str] | None = None,
    candidate_top_k: int | None = None,
    max_pair_estimate: int | None = 50_000_000,
) -> DataFrame:
    """Pearson cross-correlation between series pairs at bucket lags.

    For each ordered pair (a < b) and each lag L, correlates a's bucket
    value with b's value L buckets later, over the buckets BOTH series
    populated (inner join on the shifted bucket).  All five sums are
    exact integers when the tier carries cents sums, so the final
    correlation is the identical float expression in Spark and DuckDB.

    Plan shape: the tier self-joins on the (block, shifted-bucket) key.
    Without blocking, per-bucket fan-out is (series per bucket)² — fine
    for a pre-filtered candidate tier, quadratic death on a full 100-TB
    tier.  Two dials bound it:

    * ``block_keys`` — a subset of ``keys`` (domain / metric family)
      folded into the equi-join key, so the shuffle partitions on
      (block, bucket) and pairs only form within a block.  Fan-out drops
      to (series per bucket per block)².
    * ``candidate_top_k`` — keep only the k highest-variance series per
      block (globally when unblocked) before pairing; ties broken by
      key for determinism.

    A fail-fast guard estimates the joined row count
    (len(lags) x sum over (block, bucket) of series-count²) and fails
    the job when it exceeds ``max_pair_estimate`` — so handing the
    operator an unfiltered million-series tier dies in seconds instead
    of emitting 10¹² pairs.  The guard is LAZY: it rides the plan as a
    one-row broadcast whose projection ``raise_error``s over budget, so
    constructing the DataFrame stays job-free (plan-builder contract)
    and the estimate is evaluated against the data the job actually
    reads — Spark materializes the broadcast before the pair-join stage
    can start, so no quadratic work ever runs.  Costs one extra
    counting scan of the (filtered) tier at execution; pass ``None``
    to skip it.
    Pairs with fewer than ``min_overlap`` common buckets are dropped
    (their correlation is noise).
    """
    block_keys = list(block_keys or [])
    if not set(block_keys) <= set(keys):
        raise ValueError(
            f"block_keys {block_keys} must be a subset of keys {keys}"
        )
    epoch = F.unix_timestamp(F.col(bucket_col))
    base = tier.select(
        *keys, epoch.alias("_be"), F.col(value_col).alias("_v")
    )
    if candidate_top_k is not None:
        # variance proxy n*Σx² − (Σx)² is exact with integer cents; the
        # full-key tiebreak makes the cut deterministic across engines
        x = F.col("_v")
        stats = base.groupBy(*keys).agg(
            (F.count(F.lit(1)) * F.sum(x * x) - F.sum(x) * F.sum(x)).alias(
                "_varp"
            )
        )
        wv = W.partitionBy(*block_keys).orderBy(
            F.col("_varp").desc(), *[F.col(k) for k in keys]
        )
        keep = (
            stats.withColumn("_rk", F.row_number().over(wv))
            .filter(F.col("_rk") <= int(candidate_top_k))
            .select(*keys)
        )
        base = base.join(F.broadcast(keep), keys, "left_semi")
    guard_ok = None
    if max_pair_estimate is not None:
        lim = int(max_pair_estimate)
        est = (
            base.groupBy(*block_keys, "_be")
            .count()
            .agg(
                (
                    F.coalesce(F.sum(F.col("count") * F.col("count")), F.lit(0))
                    * F.lit(len(lags))
                ).alias("_est")
            )
        )
        guard_ok = est.select(
            F.when(
                F.col("_est") > lim,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "lagged_cross_correlation: estimated pair fan-out "
                        ),
                        F.col("_est").cast("string"),
                        F.lit(
                            f" exceeds max_pair_estimate={lim}; pass "
                            "block_keys= (domain / metric family), "
                            "candidate_top_k=, or raise/disable "
                            "max_pair_estimate explicitly"
                        ),
                    )
                ).cast("int"),
            )
            .otherwise(F.lit(1))
            .alias("_guard_ok")
        )
    lagged = base.withColumn("lag", F.explode(F.array(*[F.lit(int(x)) for x in lags])))
    a = lagged.select(
        *[F.col(k).alias(f"a_{k}") for k in keys],
        "lag",
        (F.col("_be") + F.col("lag") * tier_seconds).alias("_join_be"),
        F.col("_v").alias("_x"),
    )
    b = base.select(
        *[F.col(k).alias(f"b_{k}") for k in keys],
        F.col("_be").alias("_join_be"),
        F.col("_v").alias("_y"),
    )
    cond = [a["_join_be"] == b["_join_be"]] + [
        a[f"a_{k}"] == b[f"b_{k}"] for k in block_keys
    ]
    # ordered-pair filter over the FULL key tuple (struct comparison is
    # lexicographic): with composite keys, comparing only the first
    # column would drop every cross-series pair sharing it
    pair_filter = F.struct(*[a[f"a_{k}"] for k in keys]) < F.struct(
        *[b[f"b_{k}"] for k in keys]
    )
    joined = a.join(b, cond).filter(pair_filter)
    if guard_ok is not None:
        # 1-row broadcast: materialized before the pair-join stage runs,
        # so an over-budget estimate kills the job pre-fan-out.  The
        # filter keeps the raise_error projection alive under pruning.
        joined = (
            joined.crossJoin(F.broadcast(guard_ok))
            .filter(F.col("_guard_ok") == 1)
            .drop("_guard_ok")
        )
    x, y = F.col("_x"), F.col("_y")
    agg = joined.groupBy(
        *[f"a_{k}" for k in keys], *[f"b_{k}" for k in keys], "lag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("n", "_sx", "_sy", "_sxy", "_sxx", "_syy")
    )
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0), (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    )
    return (
        agg.filter(n >= min_overlap)
        .select(
            *[f"a_{k}" for k in keys],
            *[f"b_{k}" for k in keys],
            "lag",
            "n",
            corr.alias("corr"),
        )
    )


def autocorrelation(
    tier: DataFrame,
    tier_seconds: int,
    lags: list[int] = [1, 2, 3],
    min_overlap: int = 12,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
) -> DataFrame:
    """Per-series autocorrelation function (ACF) at bucket lags.

    For each series and lag L, Pearson-correlates the bucket value at t
    with the SAME series' value at t + L buckets, over every t where
    both buckets exist (join pairing — intermediate gaps don't disqualify
    a pair, unlike a row-offset lead()).  The five sums are exact
    integers on a cents tier, so the final correlation is the identical
    float expression in Spark and DuckDB.

    Plan shape: a self equi-join keyed on (series, shifted bucket) — the
    series key is IN the join key, so fan-out per key is #lags, never
    (series per bucket)² like the cross-series variant.  One shuffle of
    the tier per side; aggregation is algebraic and map-side combined.
    Scales linearly in tier rows × #lags at any series count.
    """
    epoch = F.unix_timestamp(F.col(bucket_col))
    base = tier.select(*keys, epoch.alias("_be"), F.col(value_col).alias("_v"))
    lagged = base.withColumn(
        "lag", F.explode(F.array(*[F.lit(int(x)) for x in lags]))
    )
    a = lagged.select(
        *keys,
        "lag",
        (F.col("_be") + F.col("lag") * tier_seconds).alias("_join_be"),
        F.col("_v").alias("_x"),
    )
    b = base.select(*keys, F.col("_be").alias("_join_be"), F.col("_v").alias("_y"))
    joined = a.join(b, [*keys, "_join_be"])
    x, y = F.col("_x"), F.col("_y")
    agg = joined.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col(c) for c in ("n", "_sx", "_sy", "_sxy", "_sxx", "_syy")
    )
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    corr = F.when(
        (vx > 0) & (vy > 0), (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    )
    return (
        agg.filter(n >= min_overlap)
        .select(*keys, "lag", "n", corr.alias("acf"))
    )


def holt_linear(
    points: DataFrame,
    alpha: float,
    beta: float,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_seconds: int | None = 86400,
    keep_order: bool = False,
) -> DataFrame:
    """Chunk-parallel Holt linear (double exponential) smoothing per series.

    Level/trend recurrence (zero-init convention s_{-1} = (0, 0), the
    2-dim analog of ewma's y_{-1}=0):

        l_i = α x_i + (1-α)(l_{i-1} + b_{i-1})
        b_i = β (l_i - l_{i-1}) + (1-β) b_{i-1}

    i.e. s_i = A s_{i-1} + c x_i with constant A = [[1-α, 1-α],
    [-αβ, 1-αβ]], c = (α, αβ).  Like EWMA this LOOKS inherently
    sequential but is a LINEAR recurrence, so the same two-level
    decomposition applies with 2×2 MATRIX carries: each (series,
    time-chunk) runs a zero-init local pass and, in the same loop,
    accumulates A^{p+1} for every row; the cross-chunk state obeys
    s_k = A^{n_k} s_{k-1} + s_local_end(k) — a recurrence over ONE ROW
    PER CHUNK (A^{n} is just the last row's accumulated power); the
    carry re-enters each row as A^{p+1} @ s_in, a 4-multiply Catalyst
    expression.  No per-series sort task; skew bound is one chunk.
    (A's eigenvalues are complex for typical (α, β), so the two-real-EWMA
    factorization doesn't exist — the matrix form is the general one.)

    Matches the sequential recurrence to reassociation round-off
    (tested rtol 1e-9 vs a numpy loop).  ``chunk_seconds=None`` runs the
    sequential form in one task per series (testing/oracle twin).
    Output: input columns + level, trend.

    Rows are processed in (keys, ts, value) order; duplicate (ts, value)
    pairs leave the recurrence unchanged (identical inputs in either
    order) but carry DIFFERENT per-row states.  ``keep_order=True``
    additionally emits the recurrence position (``_chunk``, ``_p``) so a
    final-state pick can break such ties deterministically —
    ``max_by(..., struct(ts, value, _chunk, _p))`` always returns the
    state after the LAST input, matching a sequential twin.
    """
    import numpy as np
    import pandas as pd

    from .rollup import bucket_ts

    a11, a12 = 1.0 - alpha, 1.0 - alpha
    a21, a22 = -alpha * beta, 1.0 - alpha * beta
    ca, cb = alpha, alpha * beta

    fields = points.schema
    ts_t = fields[ts_col].dataType.simpleString()
    key_schema = ", ".join(f"{k} {fields[k].dataType.simpleString()}" for k in keys)

    def local_loop(x: "np.ndarray"):
        """Sequential zero-init pass + cumulative powers A^{p+1}."""
        n = len(x)
        lv = np.empty(n)
        tv = np.empty(n)
        pw = np.empty((n, 4))
        l = b = 0.0
        p11, p12, p21, p22 = 1.0, 0.0, 0.0, 1.0  # A^0
        for i in range(n):
            xi = x[i]
            l, b = a11 * l + a12 * b + ca * xi, a21 * l + a22 * b + cb * xi
            lv[i], tv[i] = l, b
            # P <- A @ P  (left-multiply keeps P = A^{i+1})
            q11 = a11 * p11 + a12 * p21
            q12 = a11 * p12 + a12 * p22
            q21 = a21 * p11 + a22 * p21
            q22 = a21 * p12 + a22 * p22
            p11, p12, p21, p22 = q11, q12, q21, q22
            pw[i] = (p11, p12, p21, p22)
        return lv, tv, pw

    if chunk_seconds is None:
        extra = ", _chunk timestamp, _p long" if keep_order else ""
        schema = (
            f"{key_schema}, {ts_col} {ts_t}, {value_col} double, "
            f"level double, trend double{extra}"
        )

        def seq_pass(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.reset_index(drop=True)  # sorted by (keys, ts, value)
            lv, tv, _ = local_loop(pdf[value_col].to_numpy(np.float64))
            pdf["level"], pdf["trend"] = lv, tv
            cols = [*keys, ts_col, value_col, "level", "trend"]
            if keep_order:
                pdf["_chunk"] = pd.Timestamp(0)
                pdf["_p"] = np.arange(len(pdf), dtype=np.int64)
                cols += ["_chunk", "_p"]
            return pdf[cols]

        from ._grouped import grouped_map_in_pandas

        return grouped_map_in_pandas(
            points.select(*keys, ts_col, value_col),
            keys, [ts_col, value_col], seq_pass, schema,
        )

    src = points.withColumn("_chunk", bucket_ts(F.col(ts_col), chunk_seconds))
    key_cols = [*keys, "_chunk"]
    local_schema = (
        f"{key_schema}, _chunk timestamp, {ts_col} {ts_t}, "
        f"{value_col} double, _p long, _l double, _b double, "
        "_m11 double, _m12 double, _m21 double, _m22 double"
    )

    def local_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        # already sorted by (key_cols, ts, value) — _grouped contract
        pdf = pdf.reset_index(drop=True)
        lv, tv, pw = local_loop(pdf[value_col].to_numpy(np.float64))
        pdf["_p"] = np.arange(len(pdf), dtype=np.int64)
        pdf["_l"], pdf["_b"] = lv, tv
        pdf[["_m11", "_m12", "_m21", "_m22"]] = pw
        return pdf[
            [*keys, "_chunk", ts_col, value_col, "_p", "_l", "_b",
             "_m11", "_m12", "_m21", "_m22"]
        ]

    from ._grouped import grouped_map_in_pandas

    local = grouped_map_in_pandas(
        src.select(*key_cols, ts_col, value_col),
        key_cols, [ts_col, value_col], local_pass, local_schema,
    )
    # consumed twice (chunk-end aggregate + final join) — caller owns the
    # cache lifetime, as with ewma()
    local = local.persist()

    # the carry recurrence needs only each chunk's LAST row: its local
    # state is s_local_end and its power block is exactly A^{n_chunk}
    last = local.groupBy(*key_cols).agg(
        F.max_by(
            F.struct("_l", "_b", "_m11", "_m12", "_m21", "_m22"), F.col("_p")
        ).alias("_e")
    )

    carry_schema = f"{key_schema}, _chunk timestamp, _lin double, _bin double"

    def chunk_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)  # sorted by (keys, _chunk)
        l = b = 0.0
        lin, bin_ = [], []
        for e in pdf["_e"]:
            lin.append(l)
            bin_.append(b)
            l, b = (
                e["_m11"] * l + e["_m12"] * b + e["_l"],
                e["_m21"] * l + e["_m22"] * b + e["_b"],
            )
        pdf["_lin"], pdf["_bin"] = lin, bin_
        return pdf[[*keys, "_chunk", "_lin", "_bin"]]

    carries = grouped_map_in_pandas(last, keys, ["_chunk"], chunk_scan, carry_schema)

    out = local.join(carries, key_cols)
    level = F.col("_l") + F.col("_m11") * F.col("_lin") + F.col("_m12") * F.col("_bin")
    trend = F.col("_b") + F.col("_m21") * F.col("_lin") + F.col("_m22") * F.col("_bin")
    res = (
        out.withColumn("level", level)
        .withColumn("trend", trend)
        .drop("_l", "_b", "_m11", "_m12", "_m21", "_m22", "_lin", "_bin")
    )
    return res if keep_order else res.drop("_chunk", "_p")


def seasonal_zscore(
    tier: DataFrame,
    tier_seconds: int,
    season_buckets: int = 24,
    n_periods: int = 7,
    threshold: float = 3.0,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
) -> DataFrame:
    """Seasonal anomaly: z-score against the SAME PHASE in prior periods.

    A 17:00 bucket is compared to the last ``n_periods`` 17:00 buckets,
    not to the immediately preceding hours — the baseline window
    partitions on (series, phase) where phase = bucket_index mod
    ``season_buckets``.  Catches diurnal-pattern violations that the
    rolling z-score (rolling_zscore) smears over.

    Same engine-exact explicit variance form as rolling_zscore
    ((ss−s²/n)/(n−1) over integer tier sums); the window frame is BOUNDED
    (≤ n_periods rows of state) and partitions on (series, phase) — finer
    than per-series, so seasonal analysis of a hot series fans out over
    ``season_buckets`` tasks.
    """
    epoch = F.unix_timestamp(F.col(bucket_col))
    phase = (F.floor(epoch / tier_seconds) % season_buckets).cast("int")
    src = tier.withColumn("_phase", phase)
    w = (
        W.partitionBy(*keys, "_phase")
        .orderBy(bucket_col)
        .rowsBetween(-n_periods, -1)
    )
    v = F.col(value_col)
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    mean = s / n
    var = (ss - s * s / n) / (n - 1)
    z = (v - mean) / F.sqrt(var)
    return (
        src.withColumn("baseline_n", n)
        .withColumn("seasonal_mean", mean)
        .withColumn("zscore", F.when((F.col("baseline_n") >= 2) & (var > 0), z))
        .withColumn(
            "is_anomaly",
            F.when(F.col("zscore").isNotNull(), F.abs(F.col("zscore")) > threshold)
            .otherwise(F.lit(False)),
        )
        .drop("_phase")
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
        # already sorted by (key_cols, ts, value) — _grouped contract
        pdf = pdf.reset_index(drop=True)
        x = pdf[value_col].to_numpy(np.float64)
        # prepend-zero trick: pandas ewm(adjust=False) sets y_0 = x_0, so
        # seed with 0 to realize the y_{-1}=0 convention, then drop it
        z = pd.Series(np.concatenate([[0.0], x]))
        local = z.ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]
        pdf["_p"] = np.arange(len(pdf), dtype=np.int64)
        pdf["_local"] = local
        return pdf[[*keys, "_chunk", ts_col, value_col, "_p", "_local"]]

    from ._grouped import grouped_map_in_pandas

    local = grouped_map_in_pandas(
        src.select(*key_cols, ts_col, value_col),
        key_cols, [ts_col, value_col], local_pass, local_schema,
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
        pdf = pdf.reset_index(drop=True)  # sorted by (keys, _chunk)
        state = 0.0
        carries = []
        for a, n in zip(pdf["_a"].to_numpy(), pdf["_n"].to_numpy()):
            carries.append(state)  # carry INTO this chunk
            state = a + (one_minus ** int(n)) * state
        pdf["_carry"] = carries
        return pdf[[*keys, "_chunk", "_carry"]]

    carries = grouped_map_in_pandas(agg, keys, ["_chunk"], chunk_scan, carry_schema)

    out = local.join(carries, key_cols)
    y = F.col("_local") + F.pow(F.lit(one_minus), F.col("_p") + 1) * F.col("_carry")
    return out.withColumn("ewma", y).drop("_chunk", "_p", "_local", "_carry")


def time_weighted_avg(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """LOCF time-weighted average per bucket (TimescaleDB ``time_weight
    ('locf', ...)`` + ``time_bucket`` parity).

    Irregularly-sampled gauges make plain ``avg`` wrong: a value that
    held for an hour must weigh 3600x one that held a second.  Each
    sample's value holds until the NEXT sample in the same bucket
    (last-observation-carried-forward); the bucket's last sample
    contributes no duration — TimescaleDB's non-interpolated bucket
    semantics, which keeps every bucket independent (mergeable, and no
    cross-bucket shuffle dependency).

    Emits the EXACT integer pieces instead of the float ratio:
    ``twa_num`` = sum(value_i * (t_{i+1} - t_i)) and ``dur_s`` =
    covered seconds, so with integer (cents) values every output is
    order-independent-exact (sums of int64-range integers in float64);
    twa = twa_num / dur_s is the consumer's one division.

    Scale: the window partition is (series, bucket) — bounded by bucket
    width, never a whole hot series in one task.  One shuffle; the
    groupBy reuses the window's hash partitioning (no second exchange).
    ``seq_col`` is the total-order tiebreak for same-timestamp samples
    (two engines must agree which value "holds" across a tie; max over
    the preceding frame depends on row order under ties).
    """
    es = F.unix_timestamp(ts_col).cast("long")
    src = points.withColumn("_es", es).withColumn(
        "_be", (F.floor(F.col("_es") / bucket_seconds) * bucket_seconds).cast("long")
    )
    w = W.partitionBy(*keys, "_be").orderBy("_es", seq_col)
    seg = (F.lead("_es").over(w) - F.col("_es")).cast("long")
    src = src.withColumn("_seg", F.coalesce(seg, F.lit(0)))
    return src.groupBy(*keys, "_be").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col(value_col).cast("long") * F.col("_seg")).alias("twa_num"),
        F.sum("_seg").alias("dur_s"),
    ).withColumnRenamed("_be", "bucket_epoch")


def state_durations(
    points: DataFrame,
    bucket_seconds: int,
    threshold: float,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Seconds spent in each state per bucket (TimescaleDB ``state_agg``
    parity, with a threshold quantizer as the state function).

    State = 'high' when value > threshold else 'low'; a sample's state
    holds until the next sample in the same bucket (LOCF), the bucket's
    last sample contributes no duration — the same within-bucket segment
    model as :func:`time_weighted_avg`, so the two compose off one scan.
    Output: keys + bucket_epoch + state -> n_segments, dur_s (exact
    integer seconds).

    Scale: identical shape to time_weighted_avg — (series, bucket)
    window partitions, one shuffle, whole-stage codegen throughout.
    """
    es = F.unix_timestamp(ts_col).cast("long")
    src = points.withColumn("_es", es).withColumn(
        "_be", (F.floor(F.col("_es") / bucket_seconds) * bucket_seconds).cast("long")
    )
    w = W.partitionBy(*keys, "_be").orderBy("_es", seq_col)
    seg = (F.lead("_es").over(w) - F.col("_es")).cast("long")
    src = src.withColumn("_seg", F.coalesce(seg, F.lit(0))).withColumn(
        "state", F.when(F.col(value_col) > threshold, "high").otherwise("low")
    )
    return src.groupBy(*keys, "_be", "state").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("_seg").alias("dur_s"),
    ).withColumnRenamed("_be", "bucket_epoch")


def time_weighted_avg_interpolated(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    seq_col: str = "seq",
) -> DataFrame:
    """Cross-bucket LOCF time-weighted average (TimescaleDB
    ``interpolated_average('locf')`` semantics): a sample's value holds
    until the series' NEXT sample regardless of bucket boundaries, so
    buckets that contain no samples are still covered by the segment
    spanning them.  The series' last sample extrapolates nothing.

    Shape: one lead() per series gives global LOCF segments
    [es, next_es); each segment is clipped to the buckets it spans via
    explode(sequence(first_bucket, last_bucket)) — overlap =
    min(seg_end, bucket_end) - max(seg_start, bucket_start).  Exact
    integer seconds; ``twa_num``/``dur_s`` are the mergeable pieces
    (twa = twa_num / dur_s downstream).

    Zero-length segments (duplicate timestamps) are filtered BEFORE the
    explode: with seg_end == seg_start the bucket sequence would run
    BACKWARDS (Spark's sequence(lo, hi) descends when hi < lo — the
    repo's documented three-time bug), and DuckDB's generate_series
    returns empty for the same input, so the engines would diverge.

    Scale: the lead() sorts each series once (one hot series' history in
    one task — the same inherent bound as sessionize/asof, documented
    there); the explode fan-out is proportional to buckets COVERED, i.e.
    to the gap-filled output spine, exactly like gapfill.  One shuffle
    on series, one on (series, bucket) for the final merge — at 100 TB
    the second is map-side combined to the output cardinality.
    """
    es = F.unix_timestamp(ts_col).cast("long")
    w = W.partitionBy(*keys).orderBy("_es", seq_col)
    src = (
        points.withColumn("_es", es)
        .withColumn("_ee", F.lead("_es").over(w))
        .filter(F.col("_ee") > F.col("_es"))
    )
    b0 = F.floor(F.col("_es") / bucket_seconds).cast("long")
    b1 = F.floor((F.col("_ee") - 1) / bucket_seconds).cast("long")
    seg = src.select(
        *keys,
        F.col(value_col).alias("_v"),
        "_es",
        "_ee",
        F.explode(F.sequence(b0, b1)).alias("_b"),
    )
    be = F.col("_b") * bucket_seconds
    overlap = (
        F.least(F.col("_ee"), be + bucket_seconds) - F.greatest(F.col("_es"), be)
    ).cast("long")
    return (
        seg.withColumn("_ov", overlap)
        .groupBy(*keys, "_b")
        .agg(
            F.sum(F.col("_v").cast("long") * F.col("_ov")).alias("twa_num"),
            F.sum("_ov").alias("dur_s"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .withColumn("bucket_epoch", (F.col("_b") * bucket_seconds).cast("long"))
        .drop("_b")
    )


def uptime_rollup(
    heartbeats: DataFrame,
    bucket_seconds: int,
    timeout_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    seq_col: str = "seq",
) -> DataFrame:
    """Covered (live) seconds per bucket from a heartbeat stream —
    TimescaleDB ``heartbeat_agg``/``uptime`` semantics: a heartbeat at t
    proves liveness over [t, t + timeout); overlapping proofs merge; a
    gap longer than the timeout is downtime.  The last heartbeat still
    covers its full timeout window (no future sample needed).

    Same clipped-segment shape as time_weighted_avg_interpolated, but
    the segment end is min(next_es, es + timeout) — capping at the next
    heartbeat makes segments DISJOINT (each covered second attributed
    exactly once), so summing clipped overlaps needs no interval-union
    pass.  Zero-length segments (duplicate timestamps) are filtered
    before the explode (Spark sequence() descends when hi < lo).
    Output: keys + bucket_epoch + up_s + n_beats; uptime fraction =
    up_s / bucket_seconds downstream.

    Scale: one per-series lead() sort (hot-series bound documented at
    sessionize), explode fan-out = covered buckets (output-spine-sized,
    bounded by timeout/bucket per beat), map-side-combined final merge.
    """
    es = F.unix_timestamp(ts_col).cast("long")
    w = W.partitionBy(*keys).orderBy("_es", seq_col)
    src = (
        heartbeats.withColumn("_es", es)
        .withColumn(
            # least() ignores nulls in Spark but engines differ on that;
            # coalesce first so the last heartbeat's cap is explicit
            "_ee",
            F.least(
                F.coalesce(
                    F.lead("_es").over(w), F.col("_es") + timeout_seconds
                ),
                F.col("_es") + timeout_seconds,
            ),
        )
        .filter(F.col("_ee") > F.col("_es"))
    )
    b0 = F.floor(F.col("_es") / bucket_seconds).cast("long")
    b1 = F.floor((F.col("_ee") - 1) / bucket_seconds).cast("long")
    seg = src.select(
        *keys, "_es", "_ee", F.explode(F.sequence(b0, b1)).alias("_b")
    )
    be = F.col("_b") * bucket_seconds
    overlap = (
        F.least(F.col("_ee"), be + bucket_seconds) - F.greatest(F.col("_es"), be)
    ).cast("long")
    return (
        seg.withColumn("_ov", overlap)
        .groupBy(*keys, "_b")
        .agg(F.sum("_ov").alias("up_s"), F.count(F.lit(1)).alias("n_beats"))
        .withColumn("bucket_epoch", (F.col("_b") * bucket_seconds).cast("long"))
        .drop("_b")
    )


def burn_rate_alerts(
    events: DataFrame,
    tier_seconds: int,
    slo_target: float,
    long_buckets: int,
    short_buckets: int,
    burn_factor: float,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    error_col: str = "is_error",
    threshold_ratio: tuple[int, int] | None = None,
) -> DataFrame:
    """Multiwindow SLO burn-rate alert (Google SRE workbook ch. 5): page
    when the error RATIO burns budget ``burn_factor`` times faster than
    the SLO allows over a long window AND a short window simultaneously
    (the short window gates stale alerts after the incident ends; the
    long one suppresses blips).

    Input is raw request/error events; the op first rolls them into a
    per-(series, bucket) (errors, total) tier — map-side combinable, the
    only raw-data shuffle — then evaluates both rolling ratios with
    range frames over the BUCKET INDEX (missing buckets contribute
    nothing, matching rate() over sparse series), on rows ~tier_seconds
    x smaller than raw.  budget = 1 - slo_target; alert when
    ratio_long > burn_factor*budget AND ratio_short > burn_factor*budget.

    Emits the exact integer numerators/denominators for both windows
    plus the boolean, so engines agree bit-for-bit and consumers can
    re-derive the ratios.
    """
    idx = (F.floor(F.unix_timestamp(F.col(ts_col)) / tier_seconds)).cast("long")
    tier = (
        events.withColumn("_idx", idx)
        .groupBy(*keys, "_idx")
        .agg(
            F.sum(F.col(error_col).cast("long")).alias("errors"),
            F.count(F.lit(1)).alias("total"),
        )
    )
    budget = 1.0 - slo_target

    def _win(n: int):
        return (
            W.partitionBy(*keys)
            .orderBy("_idx")
            .rangeBetween(-(n - 1), 0)
        )

    out = (
        tier.withColumn("err_long", F.sum("errors").over(_win(long_buckets)))
        .withColumn("tot_long", F.sum("total").over(_win(long_buckets)))
        .withColumn("err_short", F.sum("errors").over(_win(short_buckets)))
        .withColumn("tot_short", F.sum("total").over(_win(short_buckets)))
    )
    if threshold_ratio is not None:
        # exact rational threshold num/den: integer cross-multiplication
        # avoids float boundary flapping (err == thr*tot rows) AND keeps
        # the predicate engine-portable (SQL decimals vs float64 round
        # the product differently exactly at those boundaries)
        num, den = threshold_ratio
        firing = (
            (F.col("err_long") * den > F.col("tot_long") * num)
            & (F.col("err_short") * den > F.col("tot_short") * num)
        )
    else:
        thr = F.lit(burn_factor * budget)
        firing = (
            (F.col("err_long") > thr * F.col("tot_long"))
            & (F.col("err_short") > thr * F.col("tot_short"))
        )
    return out.select(
        *keys,
        (F.col("_idx") * tier_seconds).alias("bucket_epoch"),
        "errors",
        "total",
        "err_long",
        "tot_long",
        "err_short",
        "tot_short",
        firing.alias("firing"),
    )


def seasonal_holt(
    points: DataFrame,
    alpha: float,
    beta: float,
    period_seconds: int = 86400,
    n_phases: int = 24,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_seconds: int | None = 86400,
    keep_order: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Seasonal Holt forecast via classical additive decomposition:
    per-(series, phase) seasonal indices (phase mean minus series mean)
    plus chunk-parallel Holt on the deseasonalized stream — additive
    Holt-Winters with batch-estimated, non-adaptive seasonals (the
    gamma=0 limit), the classical-decomposition forecast.

    Scale shape: the index fit is two exact integer-sum groupBys (the
    index table is n_series x n_phases rows), deseasonalizing is ONE
    co-partitioned (keys, phase) equi-join, and the smoother is
    holt_linear's 2x2 matrix-carry decomposition — no per-series
    sequential task anywhere.  With cents-integer values all means are
    exact-rational, so the decomposition is bit-deterministic across
    partitionings.

    Returns (smoothed, indices): smoothed = (keys, ts, value=ADJUSTED,
    level, trend) rows; indices = (keys, _phase, seasonal_index).
    Forecast h phase-steps ahead: level + h*trend +
    seasonal_index(phase(last_ts + h*phase_width)).
    """
    if period_seconds % n_phases:
        raise ValueError("period_seconds must be divisible by n_phases")
    pw = period_seconds // n_phases
    es = F.unix_timestamp(F.col(ts_col))
    p = points.withColumn("_phase", F.floor((es % period_seconds) / pw))
    ph = p.groupBy(*keys, "_phase").agg(
        F.sum(value_col).alias("_ps"), F.count(F.lit(1)).alias("_pn")
    )
    tot = ph.groupBy(*keys).agg(
        F.sum("_ps").alias("_ts"), F.sum("_pn").alias("_tn")
    )
    indices = ph.join(tot, keys).select(
        *keys,
        "_phase",
        (F.col("_ps") / F.col("_pn") - F.col("_ts") / F.col("_tn")).alias(
            "seasonal_index"
        ),
    )
    adj = p.join(indices, [*keys, "_phase"]).select(
        *keys, ts_col, (F.col(value_col) - F.col("seasonal_index")).alias(value_col)
    )
    smoothed = holt_linear(
        adj, alpha, beta, keys=keys, ts_col=ts_col, value_col=value_col,
        chunk_seconds=chunk_seconds, keep_order=keep_order,
    )
    return smoothed, indices


def changes_per_bucket(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_seconds: int | None = 3600,
) -> DataFrame:
    """PromQL ``changes()`` rolled to buckets: how many consecutive-sample
    transitions inside each (series, bucket) changed the value.

    Rides counter_increase's chunk-parallel lag: a transition changed the
    value iff the counter reset (went down) or the non-reset increase is
    nonzero — ``increase`` alone is NOT enough, a reset to the previous
    value's own magnitude can emit increase == 0 with the value changed.
    Series heads (null prev) contribute nothing, matching PromQL's
    within-range pairing.  One data shuffle (shared with the lag), then
    a map-side-combinable bucket sum.
    """
    from .rollup import bucket_ts

    inc = counter_increase(
        points, keys=keys, ts_col=ts_col, value_col=value_col,
        chunk_seconds=chunk_seconds,
    )
    changed = (
        (F.col("is_reset") == 1) | (F.col("increase") != 0.0)
    ).cast("int")
    return (
        inc.withColumn("_bucket", bucket_ts(F.col(ts_col), bucket_seconds))
        .groupBy(*keys, "_bucket")
        .agg(
            F.sum(changed).alias("n_changes"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .withColumnRenamed("_bucket", "bucket_ts")
    )


def rolling_percentile(
    tier: DataFrame,
    p: float,
    window_buckets: int,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "value",
) -> DataFrame:
    """Moving exact percentile over the trailing ``window_buckets``
    tier buckets (e.g. p95 of hourly means over the last 24 h) — the
    sliding-SLO indicator dashboards pair with burn-rate alerts.

    RANGE frame on the integer bucket INDEX, not ROWS: a series with
    missing buckets still windows over \"the last N hours\" rather than
    silently stretching to N observed rows.  Runs on the ROLLED tier —
    one row per (series, bucket) — so the per-series window sorts tier
    rows, not raw points; skew is bounded by the series' bucket count,
    the same bound every tier window op here documents.  Percentile is
    Spark's exact linear-interpolation aggregate (DuckDB quantile_cont
    twin); on exact-rational bucket means the two engines agree to ulp.
    """
    idx = F.floor(F.unix_timestamp(F.col(bucket_col)) / bucket_seconds)
    w = (
        W.partitionBy(*keys)
        .orderBy("_idx")
        .rangeBetween(-(window_buckets - 1), 0)
    )
    return (
        tier.withColumn("_idx", idx)
        .withColumn("rolling_p", F.percentile(value_col, p).over(w))
        .withColumn("n_window", F.count(F.lit(1)).over(w))
        .drop("_idx")
    )


def holt_winters_fit(
    points: DataFrame,
    alpha: float,
    beta: float,
    gamma: float,
    period_seconds: int = 86400,
    n_phases: int = 24,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
    chunk_seconds: int | None = 86400,
) -> DataFrame:
    """Full additive Holt-Winters (ADAPTIVE seasonals, gamma > 0) —
    per-series final state, chunk-parallel.

    Hyndman's additive form with the seasonal slot selected by the
    TIMESTAMP phase (hour-of-day style), zero-init state like ewma/holt:

        l_t = a (y_t - s_phi) + (1-a)(l_{t-1} + b_{t-1})
        b_t = B (l_t - l_{t-1}) + (1-B) b_{t-1}
        s_phi' = g (y_t - l_{t-1} - b_{t-1}) + (1-g) s_phi

    The state u = (l, b, s_0..s_{m-1}) obeys u_t = A_phi u_{t-1} +
    c_phi y_t — a LINEAR recurrence in dimension m+2, so the same
    two-level decomposition as holt_linear applies with (m+2)x(m+2)
    MATRIX carries: each (series, time-chunk) runs one numpy pass
    emitting its zero-init end state v and its cumulative operator M
    (A_phi is 3-row sparse, so accumulating M costs O(m) per row, not
    O(m^2)); the cross-chunk scan u_k = M_k u_{k-1} + v_k runs over ONE
    ROW PER CHUNK.  Unlike holt_linear no per-row carry re-entry is
    attempted — per-row corrected output would need the full M_i per
    row; the FIT (final state + forecast) only needs chunk ends, which
    keeps the shuffle at one (m+2)(m+3)-double row per series-chunk.

    Returns one row per series: n, level, trend, seasonals
    (array<double>, phase-indexed), last_es (epoch of the last sample).
    Forecast h phase-steps out: level + h*trend +
    seasonals[phase(last_es + h*phase_width)].
    """
    import numpy as np
    import pandas as pd

    if period_seconds % n_phases:
        raise ValueError("period_seconds must be divisible by n_phases")
    pw = period_seconds // n_phases
    m = n_phases
    n_dim = m + 2

    def phases_of(es: "np.ndarray") -> "np.ndarray":
        return ((es % period_seconds) // pw).astype(np.int64)

    def local_pass_np(y: "np.ndarray", ph: "np.ndarray"):
        """Zero-init response v and cumulative operator M for one run."""
        M = np.eye(n_dim)
        v = np.zeros(n_dim)
        for yi, phi in zip(y, ph):
            j = 2 + int(phi)
            l, b, s = v[0], v[1], v[j]
            # A_phi touches rows (l, b, s_phi) only
            nl = (1 - alpha) * (l + b) + alpha * (yi - s)
            nb = beta * (nl - l) + (1 - beta) * b
            ns = gamma * (yi - l - b) + (1 - gamma) * s
            v[0], v[1], v[j] = nl, nb, ns
            rl, rb, rs = M[0].copy(), M[1].copy(), M[j].copy()
            M[0] = (1 - alpha) * (rl + rb) - alpha * rs
            M[1] = beta * (M[0] - rl) + (1 - beta) * rb
            M[j] = -gamma * (rl + rb) + (1 - gamma) * rs
        return v, M

    fields = points.schema
    key_schema = ", ".join(f"{k} {fields[k].dataType.simpleString()}" for k in keys)

    if chunk_seconds is None:
        out_schema = (
            f"{key_schema}, n long, level double, trend double, "
            "seasonals array<double>, last_es long"
        )

        def seq_fit(pdf: pd.DataFrame) -> pd.DataFrame:
            # already sorted by (keys, ts, value) — _grouped contract
            es = pdf["_es"].to_numpy(np.int64)
            v, _ = local_pass_np(
                pdf[value_col].to_numpy(np.float64), phases_of(es)
            )
            head = pdf.iloc[:1][keys].reset_index(drop=True)
            head["n"] = len(pdf)
            head["level"], head["trend"] = v[0], v[1]
            head["seasonals"] = [list(v[2:])]
            head["last_es"] = int(es.max())
            return head

        from ._grouped import grouped_map_in_pandas

        src = points.withColumn("_es", F.unix_timestamp(F.col(ts_col)))
        return grouped_map_in_pandas(
            src.select(*keys, ts_col, value_col, "_es"),
            keys, [ts_col, value_col], seq_fit, out_schema,
        )

    from .rollup import bucket_ts

    src = points.withColumn("_chunk", bucket_ts(F.col(ts_col), chunk_seconds))
    src = src.withColumn("_es", F.unix_timestamp(F.col(ts_col)))
    chunk_schema = (
        f"{key_schema}, _chunk timestamp, _n long, _last_es long, "
        "_v array<double>, _m array<double>"
    )

    def chunk_pass(pdf: pd.DataFrame) -> pd.DataFrame:
        # already sorted by (keys, _chunk, ts, value) — _grouped contract
        es = pdf["_es"].to_numpy(np.int64)
        v, M = local_pass_np(
            pdf[value_col].to_numpy(np.float64), phases_of(es)
        )
        head = pdf.iloc[:1][[*keys, "_chunk"]].reset_index(drop=True)
        head["_n"] = len(pdf)
        head["_last_es"] = int(es.max())
        head["_v"] = [list(v)]
        head["_m"] = [list(M.reshape(-1))]
        return head

    from ._grouped import grouped_map_in_pandas

    per_chunk = grouped_map_in_pandas(
        src.select(*keys, "_chunk", ts_col, value_col, "_es"),
        [*keys, "_chunk"], [ts_col, value_col], chunk_pass, chunk_schema,
    )

    out_schema = (
        f"{key_schema}, n long, level double, trend double, "
        "seasonals array<double>, last_es long"
    )

    def series_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)  # sorted by (keys, _chunk)
        u = np.zeros(n_dim)
        for _, row in pdf.iterrows():
            M = np.asarray(row["_m"], dtype=np.float64).reshape(n_dim, n_dim)
            v = np.asarray(row["_v"], dtype=np.float64)
            u = M @ u + v
        head = pdf.iloc[:1][keys].reset_index(drop=True)
        head["n"] = int(pdf["_n"].sum())
        head["level"], head["trend"] = u[0], u[1]
        head["seasonals"] = [list(u[2:])]
        head["last_es"] = int(pdf["_last_es"].max())
        return head

    return grouped_map_in_pandas(
        per_chunk, keys, ["_chunk"], series_scan, out_schema
    )


def fano_burstiness(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
) -> DataFrame:
    """Arrival burstiness per series from bucketed event counts: Fano
    factor (index of dispersion, var/mean) and the Goh-Barabasi
    burstiness coefficient B = (sigma - mu)/(sigma + mu).

    A Poisson arrival process has Fano == 1 and B ~ 0; crawl traffic,
    retries, and bot bursts push both up — the standard screen a web-
    scale ingest runs per domain/series before alert thresholds are
    trusted (reference scope is feature kernels, SURVEY.md §2.4; this
    extends the monitoring tier like the PromQL family).

    Empty buckets COUNT: the series span is [min bucket, max bucket] and
    the n_buckets denominator is the full span width, so a series that
    goes quiet reads as bursty rather than uniform.  Zero buckets add 0
    to both Σn and Σn², so only the observed buckets are aggregated —
    no spine join, no explode.

    Determinism: Σn, Σn², and the span are exact integers (map-side
    combined, order-independent); mean/var/Fano/B are computed from them
    by one identical float expression in the SQL twin.

    Scale shape: two keyed aggregations (series×bucket, then series) —
    the same shuffle profile as rollup_points.  No windows, no Python.
    """
    be = (F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
          * bucket_seconds).cast("long")
    per_bucket = (
        points.select(*keys, be.alias("_be"))
        .groupBy(*keys, "_be")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    agg = per_bucket.groupBy(*keys).agg(
        F.sum("_n").alias("n_events"),
        F.sum(F.col("_n") * F.col("_n")).alias("_ss"),
        F.min("_be").alias("_lo"),
        F.max("_be").alias("_hi"),
    )
    nb = ((F.col("_hi") - F.col("_lo")) / bucket_seconds + 1).cast("long")
    mean = F.col("n_events") / F.col("n_buckets")
    # population variance over ALL buckets in the span (zeros included):
    # E[n^2] - mean^2 with E over n_buckets
    var = F.col("_ss") / F.col("n_buckets") - mean * mean
    sigma = F.sqrt(var)
    return (
        agg.withColumn("n_buckets", nb)
        .withColumn("mean_rate", mean)
        .withColumn("fano", F.when(mean > 0, var / mean))
        .withColumn(
            "burstiness",
            F.when(sigma + mean > 0, (sigma - mean) / (sigma + mean)),
        )
        .select(*keys, "n_events", "n_buckets", "mean_rate", "fano",
                "burstiness")
    )


def theil_sen_trend(
    points: DataFrame,
    bucket_seconds: int,
    group_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Theil-Sen robust trend per (series, group window): the median of
    all pairwise slopes between bucket means, plus the matching median
    intercept — the standard outlier-resistant alternative to the OLS
    deriv_per_bucket (one wild bucket shifts OLS; Theil-Sen tolerates
    ~29% contamination).

    Slopes are taken between BUCKET MEANS, not raw points: the pairwise
    explosion is bounded by C(group/bucket, 2) per series-group (276 for
    1h buckets over 1d) regardless of raw data volume, so the self-join
    is a tier-sized equi-join on (keys, group) — never all raw pairs.

    Plan shape: one bucket aggregate (map-side combined), one
    equi-self-join keyed on (keys, group) with the ascending-bucket
    filter, two exact-percentile aggregates.  ``F.percentile`` and
    DuckDB ``quantile_cont`` share the continuous-interpolation
    definition, and slopes are quotients of exact-integer sums through
    one identical expression — cross-engine stable at the oracle's 1e-9
    rounding.

    Intercept is at the GROUP-window origin (be - group_start), so its
    scale stays bounded.  Groups with a single bucket emit nothing
    (no pair to vote).  Output: keys + group_epoch, n_buckets, n_pairs,
    slope (value-units/sec), intercept.
    """
    e = F.unix_timestamp(F.col(ts_col))
    be = (F.floor(e / bucket_seconds) * bucket_seconds).cast("long")
    de = (F.floor(e / group_seconds) * group_seconds).cast("long")
    h = (
        points.select(
            *keys, be.alias("_be"), de.alias("_de"),
            F.col(value_col).alias("_v"),
        )
        .groupBy(*keys, "_de", "_be")
        .agg(F.sum("_v").alias("_sv"), F.count(F.lit(1)).alias("_n"))
    )
    mean = F.col("_sv") / F.col("_n")
    a = h.select(*keys, "_de", F.col("_be").alias("_be1"),
                 mean.alias("_m1"))
    b = h.select(*keys, "_de", F.col("_be").alias("_be2"),
                 mean.alias("_m2"))
    pairs = (
        a.join(b, [*keys, "_de"])
        .filter(F.col("_be2") > F.col("_be1"))
        .select(
            *keys, "_de",
            ((F.col("_m2") - F.col("_m1"))
             / (F.col("_be2") - F.col("_be1"))).alias("_slope"),
        )
    )
    s = pairs.groupBy(*keys, "_de").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("_slope", F.lit(0.5)).alias("slope"),
    )
    resid = h.join(s, [*keys, "_de"]).select(
        *keys, "_de", "n_pairs", "slope",
        (mean - F.col("slope") * (F.col("_be") - F.col("_de"))).alias("_r"),
    )
    return (
        resid.groupBy(*keys, "_de", "n_pairs", "slope")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.percentile("_r", F.lit(0.5)).alias("intercept"),
        )
        .select(*keys, F.col("_de").alias("group_epoch"), "n_buckets",
                "n_pairs", "slope", "intercept")
    )


def pettitt_changepoint(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Pettitt's nonparametric changepoint test per series over the
    bucketed tier — the rank-based (outlier-robust) complement to
    cusum_detect, detecting a single shift in distribution at unknown
    time.

    U_t = Σ_{i<=t} Σ_{j>t} sgn(x_j - x_i); the changepoint estimate is
    argmax |U_t| and the approximate significance is
    p = 2·exp(-6K²/(B³+B²)) (Pettitt 1979).

    The O(B²) double sum is NOT materialized: the recurrence
    U_t - U_{t-1} = Σ_k sgn(x_k - x_t) reduces each term to competition
    ranks, S_t = rank_desc(x_t) - rank_asc(x_t), so the whole statistic
    is two rank windows + one running sum per series — all exact
    integers, order-independent across engines.  Ties in |U_t| resolve
    to the EARLIEST bucket.

    Scale shape: one tier aggregate + per-series window functions over
    tier-sized rows (bounded by retention).  One series-keyed shuffle;
    frames are the per-series tier, not raw data.

    Output: keys + n_buckets, k_stat, cp_epoch (bucket BEFORE the
    shift), u_at_cp (signed), p_approx.
    """
    be = (F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
          * bucket_seconds).cast("long")
    tier = (
        points.select(*keys, be.alias("_be"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "_be")
        .agg(F.sum("_v").alias("_x"))
    )
    wk = W.partitionBy(*keys)
    wa = wk.orderBy("_x")
    wd = wk.orderBy(F.col("_x").desc())
    wo = wk.orderBy("_be")
    t = tier.select(
        *keys, "_be", "_x",
        F.count(F.lit(1)).over(wk).alias("_B"),
        (F.rank().over(wd) - F.rank().over(wa)).alias("_s"),
    ).select(
        *keys, "_be", "_B",
        F.sum("_s").over(
            wo.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("_u"),
        F.row_number().over(wk.orderBy(F.col("_be").desc())).alias("_rn"),
    )
    # exclude t = B (U_B == 0 by construction) and degenerate series
    cand = t.filter((F.col("_rn") > 1) & (F.col("_B") >= 2))
    kmax = cand.select(
        *keys, "_be", "_B", "_u",
        F.max(F.abs("_u")).over(wk).alias("_k"),
    )
    best = (
        kmax.filter(F.abs("_u") == F.col("_k"))
        .groupBy(*keys)
        .agg(
            F.first("_B").alias("n_buckets"),
            F.first("_k").alias("k_stat"),
            F.min("_be").alias("cp_epoch"),
            F.min_by("_u", "_be").alias("u_at_cp"),
        )
    )
    b = F.col("n_buckets").cast("double")
    p = 2.0 * F.exp(
        F.lit(-6.0) * F.col("k_stat") * F.col("k_stat") / (b * b * b + b * b)
    )
    return best.select(
        *keys, "n_buckets", "k_stat", "cp_epoch", "u_at_cp",
        F.least(p, F.lit(1.0)).alias("p_approx"),
    )


def seasonality_strength(
    points: DataFrame,
    period_seconds: int = 86400,
    bucket_seconds: int = 3600,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Seasonality strength per series: the fraction of value variance
    explained by phase-of-period (hour-of-day by default) — one-way
    ANOVA eta-squared SS_between/SS_total, plus the F statistic.
    Complements dominant_period (which finds WHICH period; this scores
    HOW seasonal a known period is, the tsfeatures 'seasonal_strength'
    screen before fitting seasonal models).

    Exactness: with integer values (cents), every sufficient statistic
    is an exact integer — N, S=Σx, Q=Σx², per-phase (n_h, s_h), and
    B = Σ_h round(s_h²/n_h) (each phase term rounded to the unit before
    the sum, making the 24-term float sum order-independent).  Then
    SS_between = B - S²/N, and SS_within = Q - B EXACTLY (the rounding
    cancels from SS_total - SS_between), so eta² and F come from one
    identical float expression per engine.

    Scale shape: two keyed aggregations (series×phase, then series) +
    one series aggregate of Σx² unioned in by join — map-side combined
    throughout, no windows, no Python.

    Output: keys + n, n_phases, eta2, fstat (null when degenerate).
    """
    e = F.unix_timestamp(F.col(ts_col))
    ph = F.floor((e % period_seconds) / bucket_seconds).cast("int")
    base = points.select(
        *keys, ph.alias("_h"), F.col(value_col).alias("_v")
    )
    g = base.groupBy(*keys, "_h").agg(
        F.count(F.lit(1)).alias("_nh"), F.sum("_v").alias("_sh")
    )
    a = g.groupBy(*keys).agg(
        F.sum("_nh").alias("_N"),
        F.sum("_sh").alias("_S"),
        F.count(F.lit(1)).alias("n_phases"),
        F.sum(
            F.floor(
                F.col("_sh") * F.col("_sh") / F.col("_nh") + 0.5
            ).cast("long")
        ).alias("_B"),
    )
    q = base.groupBy(*keys).agg(
        F.sum(F.col("_v") * F.col("_v")).alias("_Q")
    )
    j = a.join(q, keys)
    grand = F.col("_S") * F.col("_S") / F.col("_N")
    ssb = F.col("_B") - grand
    sst = F.col("_Q") - grand
    ssw = F.col("_Q") - F.col("_B")  # exact integer difference
    k = F.col("n_phases")
    eta2 = F.when(sst > 0, ssb / sst)
    fstat = F.when(
        (k >= 2) & (F.col("_N") > k) & (ssw > 0),
        (ssb / (k - 1)) / (ssw / (F.col("_N") - k)),
    )
    return j.select(
        *keys,
        F.col("_N").cast("long").alias("n"),
        F.col("n_phases").cast("long").alias("n_phases"),
        eta2.alias("eta2"),
        fstat.alias("fstat"),
    )


def mad_anomalies(
    points: DataFrame,
    bucket_seconds: int,
    k: float = 3.5,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Robust per-series anomaly flags on the bucketed tier: modified
    z-score 0.6745·(x − median)/MAD (Iglewicz-Hoban), flagging
    |z| > k (3.5 is their recommended cut).  The robust sibling of
    rolling_zscore — one wild point inflates a stddev but not a MAD, so
    this screen survives the exact contamination it is meant to find.

    Two exact-percentile aggregates per series (median, then MAD as the
    median of absolute deviations) + equi-joins back on the series key
    (one row per series — AQE broadcasts when the series count is
    small, shuffles co-keyed when it is not); the
    bucket sums are exact integers, and both engines evaluate the same
    continuous-interpolation percentile and one identical float z
    expression (the Theil-Sen determinism argument).

    Output: one row per (keys, bucket) with x, med, mad, z (null when
    MAD == 0 — a constant series has no robust scale), is_anomaly.
    """
    be = (F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
          * bucket_seconds).cast("long")
    tier = (
        points.select(*keys, be.alias("_be"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "_be")
        .agg(F.sum("_v").alias("_x"))
    )
    med = tier.groupBy(*keys).agg(
        F.percentile("_x", F.lit(0.5)).alias("_med")
    )
    dev = tier.join(med, keys)
    mad = dev.groupBy(*keys).agg(
        F.first("_med").alias("_med"),
        F.percentile(F.abs(F.col("_x") - F.col("_med")), F.lit(0.5))
        .alias("_mad"),
    )
    j = tier.join(mad, keys)
    z = F.lit(0.6745) * (F.col("_x") - F.col("_med")) / F.col("_mad")
    return j.select(
        *keys,
        F.col("_be").alias("bucket_epoch"),
        F.col("_x").alias("x"),
        F.col("_med").alias("med"),
        F.col("_mad").alias("mad"),
        F.when(F.col("_mad") > 0, z).alias("z"),
        F.when(F.col("_mad") > 0, F.abs(z) > k)
        .otherwise(F.lit(False)).alias("is_anomaly"),
    )


def completeness(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
) -> DataFrame:
    """Per-series data-completeness audit on the bucket grid: how much
    of the expected bucket spine between a series' first and last
    observation actually has data, and the largest silent gap — the
    standard ingest-health metric a TSDB reports before anyone trusts
    downstream aggregates (gap-fill hides holes; this one measures
    them).

    All exact integers: present buckets, span = (max-min)/bucket + 1,
    max_gap from a lag over the DISTINCT bucket list (tier-sized frame,
    not raw rows).  completeness = present/span is the one float, same
    expression both engines.

    Output: keys + n_present, n_span, completeness, max_gap_buckets —
    the largest count of consecutive MISSING buckets (0 for a dense
    series).
    """
    be = (F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
          * bucket_seconds).cast("long")
    tier = points.select(*keys, be.alias("_be")).distinct()
    w = W.partitionBy(*keys).orderBy("_be")
    gap = (
        (F.col("_be") - F.lag("_be").over(w)) / bucket_seconds - 1
    ).cast("long")
    g = tier.select(*keys, "_be", gap.alias("_gap"))
    agg = g.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.min("_be").alias("_lo"),
        F.max("_be").alias("_hi"),
        F.coalesce(F.max("_gap"), F.lit(0)).alias("max_gap_buckets"),
    )
    span = ((F.col("_hi") - F.col("_lo")) / bucket_seconds + 1).cast("long")
    return (
        agg.withColumn("n_span", span)
        .select(
            *keys,
            F.col("n_present").cast("long").alias("n_present"),
            "n_span",
            (F.col("n_present") / F.col("n_span")).alias("completeness"),
            F.col("max_gap_buckets").cast("long").alias("max_gap_buckets"),
        )
    )


def offset_compare(
    tier: DataFrame,
    offset_seconds: int,
    value_cols: list[str] = ["cnt", "sum"],
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """PromQL ``offset`` analog: each tier bucket joined against the
    same series' bucket ``offset_seconds`` earlier (week-over-week /
    day-over-day deltas).  A lag window would silently compare against
    the PREVIOUS ROW when buckets are missing; the equi-join on the
    shifted bucket key is gap-correct — a missing baseline bucket yields
    NULL prev columns, not a wrong neighbor.

    Scale shape: one shuffle of the (already tiny) tier on
    (keys, bucket); the self-join is an equi-join on that same key so
    both sides co-partition — no broadcast needed and no extra exchange
    for the second side beyond its own scan.
    """
    cur = tier
    prev = tier.select(
        *keys,
        F.timestamp_seconds(
            F.unix_timestamp(F.col(bucket_col)) + F.lit(offset_seconds)
        ).alias(bucket_col),
        *[F.col(c).alias(f"prev_{c}") for c in value_cols],
    )
    out = cur.join(prev, [*keys, bucket_col], "left")
    for c in value_cols:
        out = out.withColumn(f"d_{c}", F.col(c) - F.col(f"prev_{c}"))
    return out


def classical_decompose(
    points: DataFrame,
    bucket_seconds: int,
    period_buckets: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Classical additive seasonal decomposition over the bucketed tier:
    value = trend + seasonal + remainder, per (series, bucket) — the
    moving-average family behind every "STL-style" dashboard panel.
    Same decomposition identity as statsmodels' seasonal_decompose but
    NOT the same estimator; the two deliberate deviations are below.

    trend is the ``period_buckets``-wide centered moving mean on the
    bucket INDEX (offset-centered for even periods: [-p/2, p/2-1], the
    1xM moving average — statsmodels uses the symmetric 2xM average for
    even p, so trends differ by half a bucket of smoothing there; for
    odd p the estimators coincide); the RANGE frame is indexed by bucket
    number and the window must be FULL (count == p) — calendar gaps
    disqualify a window instead of silently shrinking it, so edges and
    sparse spans yield no trend row.  seasonal is the per-(series,
    phase) mean of the detrended values over full-window rows, with the
    phase taken from the bucket's CALENDAR position (idx % p); it is
    NOT re-normalized to zero mean (statsmodels subtracts the
    period-average), so any nonzero seasonal mean stays in ``seasonal``
    rather than being shifted into trend/remainder — the additive
    identity still holds exactly.

    Exactness: on cents-integer inputs the window sum S_w and the scaled
    detrended d = v*p - S_w are exact int64s, so trend = S_w/p,
    seasonal = (Σd / n)/p and remainder = d/p - seasonal are each ONE
    identical float expression per engine — bit-stable across engines
    and partitionings.

    Scale shape: tier aggregate (map-side combined), one series-keyed
    window over tier rows (bounded by retention — the documented tier
    window bound), a tiny (series x p) seasonal aggregate joined back
    broadcast.  No Python anywhere.

    Output: keys + bucket_ts, value (tier sum), trend, seasonal,
    remainder — rows where the trend window is full.
    """
    p = int(period_buckets)
    be = (F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
          * bucket_seconds).cast("long")
    tier = (
        points.select(*keys, be.alias("_be"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "_be")
        .agg(F.sum("_v").alias("_sv"))
        .withColumn("_idx", (F.col("_be") / bucket_seconds).cast("long"))
    )
    win = (
        W.partitionBy(*keys).orderBy("_idx")
        .rangeBetween(-(p // 2), p - p // 2 - 1)
    )
    full = (
        tier.withColumn("_sw", F.sum("_sv").over(win))
        .withColumn("_cw", F.count(F.lit(1)).over(win))
        .filter(F.col("_cw") == p)
        .withColumn("_d", F.col("_sv") * p - F.col("_sw"))
        .withColumn("_phase", F.col("_idx") % p)
    )
    seas = full.groupBy(*keys, "_phase").agg(
        ((F.sum("_d").cast("double") / F.count(F.lit(1))) / F.lit(float(p)))
        .alias("_seas")
    )
    out = full.join(F.broadcast(seas), [*keys, "_phase"])
    return out.select(
        *keys,
        F.timestamp_seconds(F.col("_be")).alias("bucket_ts"),
        F.col("_sv").alias(value_col),
        (F.col("_sw") / F.lit(float(p))).alias("trend"),
        F.col("_seas").alias("seasonal"),
        (F.col("_d").cast("double") / F.lit(float(p)) - F.col("_seas"))
        .alias("remainder"),
    )


def vector_binop(
    left: DataFrame,
    right: DataFrame,
    op: str,
    on: list[str],
    left_value: str = "value",
    right_value: str = "value",
    out_col: str = "value",
    broadcast_right: bool = False,
    check_right_unique: bool = False,
) -> DataFrame:
    """PromQL-style binary operation between two instant vectors.

    Matches ``left`` and ``right`` rows on the label/bucket columns
    ``on`` and applies ``op`` ∈ {add, sub, mul, div} to their values —
    PromQL's ``l <op> r`` vector matching.  One-to-one when ``on`` is
    the full shared label set; MANY-TO-ONE (PromQL ``group_left``) when
    ``on`` is a subset of left's labels — e.g. a per-series vector
    against a per-bucket global aggregate keyed by bucket only.  As in
    PromQL, unmatched left rows drop (inner join); ``div`` by zero
    yields NULL (the row is kept, value absent) rather than relying on
    engine-specific x/0 behavior — Spark 4 ANSI mode would throw.

    Scale shape: a single equi-join on ``on``.  In the many-to-one case
    the "one" side is an aggregate over the match keys — cardinality
    == bucket count (tiny) — so pass ``broadcast_right=True`` and the
    join is a broadcast hash join with NO shuffle of the big side; the
    one-to-one case co-partitions both tiers on the same keys (one
    shuffle each, AQE-planned).  All columns of ``left`` pass through
    (PromQL keeps the left vector's labels).

    PRECONDITION: ``right`` must have at most ONE row per ``on`` key —
    PromQL rejects many-to-many match groups at query time; a duplicate
    right key here would silently fan out left rows and double-count
    downstream.  Aggregates (``groupBy(on).agg``) satisfy this by
    construction; for untrusted inputs pass ``check_right_unique=True``
    to fail the job on the first duplicate (one extra window count over
    the small side — keep it off in hot paths fed by aggregates).
    """
    if op not in ("add", "sub", "mul", "div"):
        raise ValueError(f"op must be add|sub|mul|div, got {op!r}")
    r = right.select(*on, F.col(right_value).alias("_rv"))
    if check_right_unique:
        r = (
            r.withColumn("_rn", F.count(F.lit(1)).over(W.partitionBy(*on)))
            .withColumn(
                "_rv",
                F.when(
                    F.col("_rn") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit("vector_binop: duplicate right series for "
                                  "match group ("),
                            F.concat_ws(",", *[F.col(c).cast("string") for c in on]),
                            F.lit(")"),
                        )
                    ),
                ).otherwise(F.col("_rv")),
            )
            .drop("_rn")
        )
    if broadcast_right:
        r = F.broadcast(r)
    j = left.join(r, on, "inner")
    lv, rv = F.col(left_value), F.col("_rv")
    expr = {
        "add": lv + rv,
        "sub": lv - rv,
        "mul": lv * rv,
        "div": F.when(rv != 0, lv / rv),
    }[op]
    return j.withColumn(out_col, expr).drop("_rv")
