"""Distinct-count rollup tiers: exact (mergeable-by-construction) + HLL sketch.

COUNT(DISTINCT) is the one classic rollup aggregate that is NOT algebraic
— you cannot merge two hourly distinct counts into a daily one.  Every
production TSDB/OLAP engine therefore keeps one of two tier shapes, and
this module implements both Spark-first:

* **Exact tier** (`distinct_rollup`): the 1h tier stores the distinct
  (keys, bucket, entity) TUPLES, not counts.  That tier is mergeable by
  construction — rolling 1h→1d is re-bucket + distinct over far fewer
  rows than the raw stream (the hourly dedup already collapsed repeats),
  and counts fall out of any tier level with one algebraic count.  Both
  stages are plain groupBys: map-side partial dedup (Spark's
  HashAggregate dedups within each task before the shuffle), one shuffle
  keyed on (keys, bucket, entity) whose volume is the DISTINCT set, not
  the raw stream.
* **Sketch tier** (`hll_rollup` / `hll_merge_rollup`): Apache DataSketches
  HLL via Spark's built-in `hll_sketch_agg` / `hll_union_agg` (JVM-side,
  map-side combined, fixed ~2^lgK bytes per group).  At 100 TB the exact
  tier's shuffle is proportional to the true cardinality; the sketch
  tier's shuffle is O(groups × sketch_size) regardless of cardinality —
  the scale path when entities are high-cardinality (users, IPs, URLs).

The reference (AcousticFeatures.jl) has no engine layer; these extend the
SURVEY.md §2.9 tier semantics the way a metrics store's unique-counts
feature does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import bucket_ts


def distinct_rollup(
    points: DataFrame,
    tier_seconds: int,
    entity_col: str = "user_id",
    keys: list[str] = ["event_type"],
    ts_col: str = "ts",
) -> DataFrame:
    """First-level exact distinct tier: distinct (keys, bucket, entity) rows.

    One groupBy-keyed dedup; Spark's HashAggregate performs map-side
    partial dedup, so the shuffle carries each distinct tuple once per
    input partition at worst (the distinct set, not the raw stream).
    """
    return (
        points.withColumn("bucket_ts", bucket_ts(F.col(ts_col), tier_seconds))
        .select(*keys, "bucket_ts", entity_col)
        .distinct()
    )


def distinct_tier_rollup(
    tier: DataFrame,
    to_seconds: int,
    entity_col: str = "user_id",
    keys: list[str] = ["event_type"],
) -> DataFrame:
    """Roll an exact distinct tier to a coarser one: re-bucket + distinct.

    Input rows are already hourly-distinct, so this reads the (small)
    tier, never the raw stream — the incremental-refresh property that
    makes the exact tier viable.
    """
    return (
        tier.withColumn("bucket_ts", bucket_ts(F.col("bucket_ts"), to_seconds))
        .select(*keys, "bucket_ts", entity_col)
        .distinct()
    )


def distinct_counts(
    tier: DataFrame, keys: list[str] = ["event_type"]
) -> DataFrame:
    """Counts from an exact distinct tier: one algebraic count per group."""
    return tier.groupBy(*keys, "bucket_ts").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )


def hll_rollup(
    points: DataFrame,
    tier_seconds: int,
    entity_col: str = "user_id",
    keys: list[str] = ["event_type"],
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """First-level HLL sketch tier: one mergeable binary sketch per group.

    `hll_sketch_agg` is a JVM aggregate with map-side partials — shuffle
    volume is O(groups × 2^lg_k bytes) independent of entity cardinality.
    Output: keys + bucket_ts + `hll` (binary, mergeable downstream).
    """
    src = points.withColumn("bucket_ts", bucket_ts(F.col(ts_col), tier_seconds))
    return src.groupBy(*keys, "bucket_ts").agg(
        F.hll_sketch_agg(F.col(entity_col).cast("string"), F.lit(lg_k)).alias("hll")
    )


def hll_merge_rollup(
    tier: DataFrame,
    to_seconds: int,
    keys: list[str] = ["event_type"],
) -> DataFrame:
    """Merge an HLL tier to a coarser granularity: union the sketches.

    The merge never touches raw data — sketches are unioned with
    `hll_union_agg`, again map-side combined.  `n_estimate` is the
    rounded HLL estimate for the merged group.
    """
    merged = (
        tier.withColumn("bucket_ts", bucket_ts(F.col("bucket_ts"), to_seconds))
        .groupBy(*keys, "bucket_ts")
        .agg(F.hll_union_agg("hll").alias("hll"))
    )
    return merged.withColumn(
        "n_estimate", F.hll_sketch_estimate("hll").cast("long")
    )


def sliding_distinct(
    df: DataFrame,
    window_seconds: int,
    hop_seconds: int,
    entity_col: str = "user_id",
    keys: list[str] = [],
    ts_col: str = "ts",
) -> DataFrame:
    """Exact distinct-entity counts over SLIDING windows (window > hop),
    e.g. rolling 6h uniques reported hourly — the monitoring twin of the
    tumbling tiers above, via Spark's native sliding
    ``F.window(ts, windowDuration, slideDuration)``.

    Plan shape: the window generator EXPLODES each row into
    window/hop copies (the generate operator Catalyst emits for sliding
    windows), then one groupBy(keys, window, entity) dedup + one
    algebraic count — the exact-tier strategy of distinct_rollup applied
    to overlapping windows.  The replication factor is the fixed ratio
    window/hop (6 here, NOT data-dependent), and the dedup's map-side
    partial aggregation collapses repeats before the shuffle, so shuffle
    volume is ≤ ratio × the distinct set.  At 100 TB with
    high-cardinality entities, swap the inner dedup for
    ``hll_sketch_agg`` per (keys, window) and union hourly sketches —
    same plan, fixed-size state (hll_merge_rollup shows the pattern).

    Windows are epoch-aligned (Spark aligns to 1970-01-01 in the session
    zone; tests pin UTC), matching floor(epoch/hop)*hop arithmetic.
    Output: keys + window_start epoch, n_distinct.
    """
    ratio = window_seconds // hop_seconds
    assert window_seconds % hop_seconds == 0 and ratio >= 1
    win = F.window(
        F.col(ts_col), f"{window_seconds} seconds", f"{hop_seconds} seconds"
    )
    dedup = (
        df.select(*keys, entity_col, win.alias("_w"))
        .select(*keys, entity_col,
                F.unix_timestamp("_w.start").alias("window_start"))
        .groupBy(*keys, "window_start", entity_col)
        .agg(F.lit(1).alias("_one"))
    )
    return (
        dedup.groupBy(*keys, "window_start")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
