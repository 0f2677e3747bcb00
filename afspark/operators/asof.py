"""As-of join: match each left row to the most recent right row at or
before its timestamp, per series.

Classic timeseries-engine operator (the reference has no joins at all —
SURVEY.md §2.6 — but every TSDB pairs rollups/events against the latest
reading).  Implemented as a UNION + single window pass instead of a
range join: both sides are tagged and interleaved, sorted by
(ts, side) within each series partition, and ``last(value,
ignorenulls)`` carries the right side's columns forward onto left rows.

Scale notes: ONE shuffle on series_id (same key both sides), no
replication, no range-join quadratic blow-up; the window is a running
carry, so whole-stage codegen handles it.  Skewed series fall back to
the same salting machinery as every other per-series op.  Right rows at
exactly the left timestamp match (inclusive), mirroring DuckDB/kdb
ASOF semantics — the driver oracle runs DuckDB's native ASOF JOIN
against this composition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    series_col: str = "series_id",
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_asof",
    chunk_seconds: int | None = 86_400,
) -> DataFrame:
    """left rows + the most recent right ``value_cols`` at-or-before ts.

    ``tolerance_seconds``: when set, matches older than the tolerance
    are nulled out (standard as-of tolerance).  Right-side duplicates at
    the same (series, ts) must be resolved by the caller (e.g. max_by) —
    as-of is otherwise ambiguous, in any engine.

    Default path: the carry (last-non-null right struct, a decomposable
    prefix op like EWMA/counter/sessionize) runs two-level — a local
    last-ignorenulls within each (series, time-chunk) window, plus a
    cross-chunk carry computed on the tiny one-row-per-chunk aggregate
    (max_by over right rows only, then last-ignorenulls over chunk rows)
    joined back broadcast-side — so one hot series' full history never
    lands in a single sort task.  ``chunk_seconds=None`` keeps the
    single per-series window (the oracle-twin form).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (series_col, ts_col)]
    lcols = [c for c in left.columns if c not in (series_col, ts_col)]
    # The right side is carried as ONE struct with a single
    # last(ignorenulls) — per-column carries would mix values (and
    # ts_asof) from DIFFERENT right rows whenever right value columns
    # contain legitimate NULLs.  A struct is null only when the whole
    # row is the left-side placeholder, so each left row receives one
    # coherent right row.
    l_tagged = left.select(
        series_col,
        ts_col,
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast(
            f"struct<_r_ts:timestamp,{','.join(f'`_r_{c}`:{right.schema[c].dataType.simpleString()}' for c in value_cols)}>"
        ).alias("_r"),
    )
    r_tagged = right.select(
        series_col,
        ts_col,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).alias("_r_ts"),
            *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        ).alias("_r"),
    )
    u = l_tagged.unionByName(r_tagged)
    if chunk_seconds is None:
        # right rows sort BEFORE left rows at equal ts -> inclusive match
        w = (
            W.partitionBy(series_col)
            .orderBy(ts_col, "_side")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        carry = F.last("_r", ignorenulls=True).over(w)
    else:
        from .rollup import bucket_ts

        u = u.withColumn("_chunk", bucket_ts(F.col(ts_col), chunk_seconds))
        wloc = (
            W.partitionBy(series_col, "_chunk")
            .orderBy(ts_col, "_side")
            .rowsBetween(W.unboundedPreceding, 0)
        )
        # per-chunk last right struct: max_by over right rows only (the
        # when() nulls the ordering key for left rows, which max_by
        # skips); chunks holding no right rows yield a null that the
        # cross-chunk last-ignorenulls carries over
        summaries = u.groupBy(series_col, "_chunk").agg(
            F.max_by(
                "_r", F.when(F.col("_side") == 0, F.col(ts_col))
            ).alias("_last_r")
        )
        wser = (
            W.partitionBy(series_col)
            .orderBy("_chunk")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        carr = summaries.select(
            series_col,
            "_chunk",
            F.last("_last_r", ignorenulls=True).over(wser).alias("_carry"),
        )
        u = u.withColumn(
            "_rloc", F.last("_r", ignorenulls=True).over(wloc)
        ).join(carr, [series_col, "_chunk"])
        carry = F.coalesce(F.col("_rloc"), F.col("_carry"))
    carried = (
        u.select(
            series_col,
            ts_col,
            *lcols,
            "_side",
            carry.alias("_c"),
        )
        .filter(F.col("_side") == 1)
        .select(
            series_col,
            ts_col,
            *lcols,
            "_side",
            *[F.col(f"_c._r_{c}").alias(f"_c_{c}") for c in value_cols],
            F.col("_c._r_ts").alias("_c_ts"),
        )
    )

    def _gate(col: Column) -> Column:
        if tolerance_seconds is None:
            return col
        fresh = (
            F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp("_c_ts")
        ) <= tolerance_seconds
        return F.when(fresh, col)

    return carried.select(
        series_col,
        ts_col,
        *lcols,
        *[_gate(F.col(f"_c_{c}")).alias(f"{c}{suffix}") for c in value_cols],
        _gate(F.col("_c_ts")).alias(f"ts{suffix}"),
    )
