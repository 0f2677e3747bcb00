"""Cohort analytics over the distinct tier: retention and funnels.

The classic product-analytics pair every event-timeseries store grows:

* **Retention matrix** (`retention_matrix`): for each activity day d and
  lag L, the fraction of day-d actives also active on day d+L.  Built on
  the EXACT DISTINCT TIER (operators/distinct.py) — the self-join runs
  over deduped (day, entity) tuples, i.e. the distinct set, not the raw
  stream, and joins ON THE ENTITY (well-distributed key), so the shuffle
  is |actives| rows per side regardless of event volume.
* **Funnel conversion** (`funnel_conversion`): users reaching ordered
  steps A -> B -> C, each step's first qualifying timestamp strictly
  bounded by the previous step's, grouped by the day of the first step
  (the cohort).  Three per-entity aggregates + two joins on the entity
  key — every aggregate is algebraic (min), map-side combined; there is
  no per-user event-list materialization.

Both are engine-layer extensions of SURVEY.md §2.9's tier semantics (the
reference has no engine layer), expressible as plain SQL for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def retention_matrix(
    tier_1d: DataFrame,
    max_lag_days: int = 7,
    entity_col: str = "user_id",
    bucket_col: str = "bucket_ts",
) -> DataFrame:
    """(day, lag) -> retained fraction, from a daily distinct tier.

    ``tier_1d`` rows are distinct (bucket_ts, entity) tuples (e.g.
    ``distinct_rollup(events, 86400, keys=[])``).  For each base day and
    lag 1..max_lag_days: n_active = |actives(day)|, n_retained =
    |actives(day) ∩ actives(day+lag)|, retention = retained/active.

    One self-join keyed on the ENTITY (not the day — day keys would put
    every pair of one day in one task); the lag filter is applied to the
    joined day delta, and the counts are algebraic.
    """
    a = tier_1d.select(
        F.col(entity_col).alias("_e"),
        F.unix_timestamp(bucket_col).alias("_d0"),
    )
    b = tier_1d.select(
        F.col(entity_col).alias("_e"),
        F.unix_timestamp(bucket_col).alias("_d1"),
    )
    lag = ((F.col("_d1") - F.col("_d0")) / 86400).cast("long")
    retained = (
        a.join(b, "_e")
        .withColumn("lag", lag)
        .filter((F.col("lag") >= 1) & (F.col("lag") <= max_lag_days))
        .groupBy("_d0", "lag")
        .agg(F.count(F.lit(1)).alias("n_retained"))
    )
    base = a.groupBy("_d0").agg(F.count(F.lit(1)).alias("n_active"))
    return (
        base.join(retained, "_d0")
        .select(
            F.col("_d0").alias("day_epoch"),
            "lag",
            "n_active",
            "n_retained",
            (F.col("n_retained") / F.col("n_active")).alias("retention"),
        )
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    horizon_seconds: int | None = None,
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-step funnel: per cohort day, users reaching each step.

    A user reaches step k when an event of type steps[k] exists at
    ``ts >= t_{k-1}`` (first qualifying time, ties allowed — the oracle
    expresses the identical >= bound), optionally within
    ``horizon_seconds`` of the step-1 time.  The cohort is the calendar
    day of the user's first step-1 event.

    Output: cohort_epoch, n_s1..n_sK (distinct users reaching each
    step).  Each stage is one algebraic min-aggregate per entity plus an
    entity-keyed join — no event-list collection, no windows.
    """
    if len(steps) < 2:
        raise ValueError("need at least 2 steps")
    ev = events.select(
        F.col(entity_col).alias("_e"),
        F.col(type_col).alias("_t"),
        F.unix_timestamp(F.col(ts_col)).alias("_ts"),
    )
    reached = (
        ev.filter(F.col("_t") == steps[0])
        .groupBy("_e")
        .agg(F.min("_ts").alias("t1"))
    )
    times = reached
    for k, step in enumerate(steps[1:], start=2):
        prev = f"t{k - 1}"
        cand = ev.filter(F.col("_t") == step).join(times, "_e")
        cond = F.col("_ts") >= F.col(prev)
        if horizon_seconds is not None:
            cond = cond & (F.col("_ts") <= F.col("t1") + horizon_seconds)
        times = (
            cand.filter(cond)
            .groupBy("_e")
            .agg(
                *[F.min(f"t{j}").alias(f"t{j}") for j in range(1, k)],
                F.min("_ts").alias(f"t{k}"),
            )
        )
        reached = reached.join(
            times.select("_e", f"t{k}"), "_e", "left"
        )
    cohort = (F.floor(F.col("t1") / 86400) * 86400).cast("long")
    aggs = [F.count(F.lit(1)).alias("n_s1")] + [
        F.count(F.col(f"t{k}")).alias(f"n_s{k}") for k in range(2, len(steps) + 1)
    ]
    return reached.withColumn("cohort_epoch", cohort).groupBy("cohort_epoch").agg(*aggs)


def transition_entropy(
    events: DataFrame,
    keys: list[str] = ["user_id"],
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: list[str] = ["event_id"],
) -> DataFrame:
    """Per-entity behavioral predictability: Shannon entropy (bits) of
    the first-order transition-pair distribution of the event-type
    sequence.  Low entropy = scripted/bot-like repetition; high entropy
    approaching log2(n_pair_kinds) = diffuse behavior — the standard
    sequence-structure screen next to the repetition/quality text
    filters.

    H = -Σ_{(u,v)} p_uv log2 p_uv over observed consecutive pairs, with
    p from exact-integer pair counts.  Each term is rounded to integer
    nanos BEFORE the per-entity sum (the psi_drift checksum pattern), so
    the float sum is order-independent across engines.

    Scale shape: one lag window ordered within entity (the per-series
    sort task inherent to sequence semantics — frame is the entity's
    events, bounded by per-user activity), then two keyed aggregations.

    Output: keys + n_transitions, n_pair_kinds, entropy_nanos (bits in
    1e-9 units, exact integer), entropy_bits.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(ts_col, *order_cols)
    seq = events.select(
        *keys,
        F.lag(type_col).over(w).alias("_prev"),
        F.col(type_col).alias("_cur"),
    ).filter(F.col("_prev").isNotNull())
    pairs = seq.groupBy(*keys, "_prev", "_cur").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # totals via a window over the pair-kind rows (per-key cardinality
    # |types|², far below the event count) — no self-join, no lineage
    # ambiguity
    wk = W.partitionBy(*keys)
    pairs = pairs.withColumn("_tot", F.sum("_n").over(wk))
    p = F.col("_n") / F.col("_tot")
    term = -p * F.log2(p)
    out = (
        pairs.select(
            *keys, "_tot",
            F.floor(term * 1e9 + 0.5).cast("long").alias("_t"),
        )
        .groupBy(*keys)
        .agg(
            F.first("_tot").alias("n_transitions"),
            F.count(F.lit(1)).alias("n_pair_kinds"),
            F.sum("_t").alias("entropy_nanos"),
        )
    )
    return out.select(
        *keys,
        F.col("n_transitions").cast("long").alias("n_transitions"),
        F.col("n_pair_kinds").cast("long").alias("n_pair_kinds"),
        "entropy_nanos",
        (F.col("entropy_nanos") / 1e9).alias("entropy_bits"),
    )
