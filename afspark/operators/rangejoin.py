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


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_seconds: int = 86400,
    keys: list[str] = [],
    left_bounds: tuple[str, str] = ("l_start_s", "l_end_s"),
    right_bounds: tuple[str, str] = ("r_start_s", "r_end_s"),
) -> DataFrame:
    """Interval x interval overlap join (closed epoch-second bounds).

    The inequality predicate ``l.start <= r.end AND r.start <= l.end``
    compiles to a nested-loop join in every engine — quadratic per key
    group.  Scale rewrite: explode BOTH sides into the fixed-width
    buckets they span, equi-join on (keys, bucket), post-filter the
    exact overlap, and keep each pair only in its CLAIM bucket — the
    first bucket both intervals occupy, ``floor(max(starts)/bucket)`` —
    so overlapping pairs that share several buckets emit exactly once
    without a distinct shuffle.  Replication is span/bucket per row
    (pick the bucket near the median span); hot keys split across
    buckets instead of one nested-loop task.

    Bounds columns must be pre-projected epoch-second longs with
    distinct names on the two sides; zero-length intervals (end ==
    start) participate (closed semantics).  Rows with end < start are
    dropped — Spark's sequence() DESCENDS for hi < lo.
    """
    ls, le = left_bounds
    rs, re_ = right_bounds
    lb = left.filter(F.col(le) >= F.col(ls)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(ls) / bucket_seconds),
                F.floor(F.col(le) / bucket_seconds),
            )
        ),
    )
    rb = right.filter(F.col(re_) >= F.col(rs)).withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(rs) / bucket_seconds),
                F.floor(F.col(re_) / bucket_seconds),
            )
        ),
    )
    claim = F.floor(F.greatest(F.col(ls), F.col(rs)) / bucket_seconds)
    return (
        lb.join(rb, keys + ["_b"])
        .filter(
            (F.col(ls) <= F.col(re_))
            & (F.col(rs) <= F.col(le))
            & (F.col("_b") == claim)
        )
        .withColumn(
            "overlap_s",
            F.least(F.col(le), F.col(re_)) - F.greatest(F.col(ls), F.col(rs)),
        )
        .drop("_b")
    )
