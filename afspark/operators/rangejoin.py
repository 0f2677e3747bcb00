"""Range (interval-containment) join: points x intervals, at scale.

A naive ``p.ts BETWEEN i.start AND i.end`` join compiles to a broadcast
nested-loop / cartesian filter — quadratic and a 100TB killer.  The
standard scale rewrite turns it into an EQUI-join: explode each interval
into the fixed-width time buckets it spans, bucket each point once, join
on (series, bucket), then post-filter the exact bounds.  Replication is
span/bucket_seconds per interval (choose the bucket near the median
interval length); points are never replicated.

The driver oracle (`range_join_sessions`) runs DuckDB's plain inequality
join against this bucketed plan — two independent implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    bucket_seconds: int = 3600,
    series_col: str = "series_id",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
) -> DataFrame:
    """Inner join: each point row + the interval rows containing its ts.

    Inclusive bounds ([start, end]).  Intervals with end < start are
    dropped (the sequence would DESCEND otherwise).
    """
    pb = points.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
    )
    lo = F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds)
    hi = F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds)
    ib = intervals.filter(F.col(end_col) >= F.col(start_col)).withColumn(
        "_b", F.explode(F.sequence(lo, hi))
    )
    return (
        pb.join(ib, [series_col, "_b"])
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )
