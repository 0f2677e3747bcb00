"""Gap-fill over rollup buckets: dense spine + LOCF / linear interpolation.

north_rule requirement (no reference analog — SURVEY.md §2.6):

* spine  — per series, every bucket between its first and last observed
  bucket, built with explode(sequence(...)) on epoch longs (no driver
  loop, no Python).
* locf   — last non-null value at or before the bucket.
* linear — straight line between the neighboring observed buckets;
  leading gaps stay null, trailing gaps fall back to LOCF.

Everything is window functions over (series, bucket) — a single sort per
series partition, no self-joins; at scale the spine join co-partitions
with the rollup on series_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def bucket_spine(
    rolled: DataFrame, tier_seconds: int, keys: list[str] = ["series_id"]
) -> DataFrame:
    """Dense per-series bucket spine spanning [min(bucket), max(bucket)]."""
    bounds = rolled.groupBy(*keys).agg(
        F.unix_timestamp(F.min("bucket_ts")).alias("_lo"),
        F.unix_timestamp(F.max("bucket_ts")).alias("_hi"),
    )
    return bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.lit(tier_seconds))
        ).alias("_e"),
    ).select(*keys, F.timestamp_seconds(F.col("_e")).alias("bucket_ts"))


def gapfill(
    rolled: DataFrame,
    tier_seconds: int,
    value_col: str = "avg",
    keys: list[str] = ["series_id"],
    method: str = "linear",
    max_gap: int | None = None,
) -> DataFrame:
    """Dense (keys, bucket_ts, value, is_gap) with gaps filled.

    ``method``: 'locf' or 'linear'.  ``max_gap`` (locf only): fill at
    most that many buckets past the last observation — beyond the
    horizon a gap stays null, so a dead sensor reads as ABSENT instead
    of freezing its last value forever (the standard staleness bound,
    cf. Prometheus's 5-minute staleness).
    """
    spine = bucket_spine(rolled, tier_seconds, keys)
    joined = spine.join(
        rolled.select(*keys, "bucket_ts", F.col(value_col).alias("_v")),
        on=[*keys, "bucket_ts"],
        how="left",
    )
    w = W.partitionBy(*keys).orderBy("bucket_ts")
    prev_w = w.rowsBetween(W.unboundedPreceding, 0)
    next_w = w.rowsBetween(0, W.unboundedFollowing)
    t = F.unix_timestamp("bucket_ts")
    with_nbrs = (
        joined.withColumn("_pv", F.last("_v", ignorenulls=True).over(prev_w))
        .withColumn(
            "_pt",
            F.last(F.when(F.col("_v").isNotNull(), t), ignorenulls=True).over(prev_w),
        )
        .withColumn("_nv", F.first("_v", ignorenulls=True).over(next_w))
        .withColumn(
            "_nt",
            F.first(F.when(F.col("_v").isNotNull(), t), ignorenulls=True).over(next_w),
        )
    )
    if method == "locf":
        filled = F.col("_pv")
        if max_gap is not None:
            filled = F.when(
                (t - F.col("_pt")) <= max_gap * tier_seconds, F.col("_pv")
            )
    elif method == "linear":
        if max_gap is not None:
            raise ValueError("max_gap is only defined for method='locf'")
        interp = F.col("_pv") + (F.col("_nv") - F.col("_pv")) * (
            (t - F.col("_pt")) / (F.col("_nt") - F.col("_pt"))
        )
        filled = (
            F.when(F.col("_v").isNotNull(), F.col("_v"))
            .when(F.col("_pv").isNull(), F.lit(None))
            .when(F.col("_nv").isNull(), F.col("_pv"))  # trailing gap -> LOCF
            .otherwise(interp)
        )
    else:
        raise ValueError(f"unknown gapfill method: {method}")
    return with_nbrs.select(
        *keys,
        "bucket_ts",
        filled.alias("value"),
        F.col("_v").isNull().alias("is_gap"),
    )
