"""Gap-based sessionization: assign rows to sessions that close after
``gap_seconds`` of per-series inactivity, then aggregate per session.

The reference has no session concept (SURVEY.md §2.9 lists session
windows as not-needed for parity); this is the engine-side operator a
web-pages/events table needs (visit reconstruction, burst detection).

Pure Catalyst: lag() flags gap-openers, a running sum over the flags
numbers the sessions.  The default path chunks both passes by time (the
EWMA/counter_increase two-level decomposition) so a hot series never
serializes into one sort task; ``chunk_seconds=None`` keeps the single
per-series window form, whose identical SQL runs in DuckDB for the
driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    points: DataFrame,
    gap_seconds: int,
    series_col: str = "series_id",
    ts_col: str = "ts",
    chunk_seconds: int | None = 86_400,
) -> DataFrame:
    """Add ``session_id`` (1-based per series, by time order).

    Default path: two-level chunk decomposition.  Within each (series,
    time-chunk) window, rows get a local opener flag (a chunk's first row
    provisionally counts as an opener) and a local running sum — parallel
    across series AND time.  The cross-chunk correction runs on the tiny
    one-row-per-chunk aggregate: whether a chunk's first row REALLY opens
    a session depends only on the previous chunk's last timestamp
    (lag over chunk rows), and every row's session id shifts by the
    cumulative corrected opener count of prior chunks plus the first-row
    correction of its own chunk.  Chunk grouping preserves global ts
    order (floor-bucketing is monotone); equal timestamps always land in
    the same chunk, so the boundary carry (max ts) is exact under ties.
    All Catalyst: one data-sized shuffle on (series, chunk); the carry
    table is one row per series-chunk and joins broadcast-side.
    """
    us = F.unix_timestamp
    if chunk_seconds is None:
        w = W.partitionBy(series_col).orderBy(ts_col)
        prev = F.lag(ts_col).over(w)
        opener = (
            prev.isNull()
            | ((us(F.col(ts_col)) - us(prev)) > gap_seconds)
        ).cast("long")
        return points.withColumn(
            "session_id",
            F.sum(opener).over(w.rowsBetween(W.unboundedPreceding, 0)),
        )

    from .rollup import bucket_ts

    p = points.withColumn("_chunk", bucket_ts(F.col(ts_col), chunk_seconds))
    wloc = W.partitionBy(series_col, "_chunk").orderBy(ts_col)
    prev_loc = F.lag(ts_col).over(wloc)
    opener_loc = (
        prev_loc.isNull()
        | ((us(F.col(ts_col)) - us(prev_loc)) > gap_seconds)
    ).cast("long")
    p = p.withColumn("_open", opener_loc).withColumn(
        "_run", F.sum("_open").over(wloc.rowsBetween(W.unboundedPreceding, 0))
    )
    agg = p.groupBy(series_col, "_chunk").agg(
        F.max(ts_col).alias("_last_ts"),
        F.min(ts_col).alias("_first_ts"),
        F.sum("_open").alias("_n_open"),
    )
    wser = W.partitionBy(series_col).orderBy("_chunk")
    prev_last = F.lag("_last_ts").over(wser)
    actual_first = (
        prev_last.isNull()
        | ((us(F.col("_first_ts")) - us(prev_last)) > gap_seconds)
    ).cast("long")
    carr = agg.withColumn("_af", actual_first).withColumn(
        "_corr", F.col("_n_open") - 1 + F.col("_af")
    )
    base = (
        F.coalesce(
            F.sum("_corr").over(wser.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        + F.col("_af")
        - 1
    )
    carr = carr.select(series_col, "_chunk", base.alias("_base"))
    return (
        p.join(carr, [series_col, "_chunk"])
        .withColumn("session_id", F.col("_run") + F.col("_base"))
        .drop("_chunk", "_open", "_run", "_base")
    )


def session_stats(
    points: DataFrame,
    gap_seconds: int,
    series_col: str = "series_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-session aggregates: n, start/end, duration, value sum."""
    s = sessionize(points, gap_seconds, series_col, ts_col)
    return s.groupBy(series_col, "session_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_s"),
        F.sum(value_col).alias("value_sum"),
    )


def coalesce_intervals(
    intervals: DataFrame,
    series_col: str = "series_id",
    start_col: str = "start_es",
    end_col: str = "end_es",
    order_col: str = "seq",
) -> DataFrame:
    """Merge overlapping/adjacent intervals per series (range_agg /
    interval-union: the classic gaps-and-islands merge).

    An interval starts a new island iff its start is strictly greater
    than the running max end of all PRECEDING intervals (adjacent
    [a,b) + [b,c) merge).  Running-max-over-preceding + running sum of
    the island flags — two Catalyst window aggregates over one sort,
    whole-stage codegen, no UDF.  ``order_col`` breaks start-ts ties so
    the preceding frame is a total order both engines agree on.

    Output: series + island_start/island_end (epoch seconds) + n_events,
    exact integers throughout.

    Scale: one shuffle on series_col; like sessionize, the sort task
    holds one series' history (inherent to ordered-island semantics —
    the skew bound is the hottest series, same as every production
    engine's gaps-and-islands).  The final groupBy adds no exchange:
    island keys are a prefix-function of the window partitioning.
    """
    w = W.partitionBy(series_col).orderBy(start_col, order_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(W.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end), 1
    ).otherwise(0)
    src = intervals.withColumn("_isl", F.sum(new_island).over(w))
    return src.groupBy(series_col, "_isl").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_events"),
    ).withColumnRenamed("_isl", "island_id")
