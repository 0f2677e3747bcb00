"""Gap-based sessionization: assign rows to sessions that close after
``gap_seconds`` of per-series inactivity, then aggregate per session.

The reference has no session concept (SURVEY.md §2.9 lists session
windows as not-needed for parity); this is the engine-side operator a
web-pages/events table needs (visit reconstruction, burst detection).

Pure Catalyst: lag() flags gap-openers, a running sum over the flags
numbers the sessions — two window passes over ONE shuffle on series_id,
all inside whole-stage codegen; the session aggregate is a normal
hash agg.  Identical SQL runs in DuckDB for the driver oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def sessionize(
    points: DataFrame,
    gap_seconds: int,
    series_col: str = "series_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Add ``session_id`` (1-based per series, by time order)."""
    w = W.partitionBy(series_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    opener = (
        prev.isNull()
        | ((F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)) > gap_seconds)
    ).cast("long")
    return points.withColumn(
        "session_id",
        F.sum(opener).over(w.rowsBetween(W.unboundedPreceding, 0)),
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
