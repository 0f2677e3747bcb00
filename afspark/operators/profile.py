"""Single-pass table profiling (data-quality audit, Deequ-style).

The reference has no profiling surface (SURVEY.md §2 covers feature
kernels, not table audits); this is the engine-side stage a web-pages
ingest pipeline runs FIRST — null fractions, cardinalities, ranges and
length stats per column — to gate a 100-TB batch before the expensive
dedup/score stages touch it.

Scale shape: every metric is an algebraic aggregate computed in ONE
``df.agg`` over one scan — map-side combined, no per-column jobs, no
collect.  Exact multi-column ``count(distinct)`` makes Catalyst plan a
single Expand (rows × #distinct-columns) feeding one partial-aggregate
pass; at 100 TB pass ``exact_distinct=False`` to swap in
``approx_count_distinct`` (HLL++, no Expand, mergeable) — the operator
keeps one scan either way.  The wide 1-row aggregate is reshaped to the
long per-column report with an explode of struct literals (pure
Catalyst on one row).

Determinism contract: sums/means are emitted only for INTEGRAL columns
(exact in float64 up to 2^53, hence summation-order independent); float
columns should be pre-scaled to integer units (see cents trick,
entry_queries.events_samples) by the caller when bit-stable output
matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_COLUMNS = [
    "col", "n", "n_null", "n_distinct",
    "min_num", "max_num", "mean",
    "min_str", "max_str", "avg_len",
]


def _round6(c: F.Column) -> F.Column:
    # floor(x*1e6+0.5)/1e6 — same IEEE expression the SQL twins use
    # (see entry_queries._r for why not round()).
    return F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``df`` in one scan; returns one row per profiled column.

    Output (long format, fixed schema PROFILE_COLUMNS):
      col         column name
      n           table row count (same for every row)
      n_null      NULL count in the column
      n_distinct  exact (default) or HLL++ approximate distinct count
      min_num / max_num / mean   for numeric columns (mean = sum/cnt,
                  rounded to 6 digits; exact when the column is integral)
      min_str / max_str / avg_len  for string columns (binary collation
                  min/max; avg_len = sum(length)/cnt rounded to 6)
    """
    ndist = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            ndist(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__mn"),
            F.max(c).cast("double").alias(f"{c}__mx"),
            F.sum(F.col(c).cast("double")).alias(f"{c}__sm"),
        ]
    for c in string_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            ndist(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mns"),
            F.max(c).alias(f"{c}__mxs"),
            F.sum(F.length(c)).alias(f"{c}__sl"),
        ]
    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in numeric_cols:
        nn = F.col(f"{c}__nn")
        structs.append(F.struct(
            F.lit(c).alias("col"),
            F.col("__n").alias("n"),
            (F.col("__n") - nn).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_num"),
            F.col(f"{c}__mx").alias("max_num"),
            F.when(nn > 0, _round6(F.col(f"{c}__sm") / nn))
             .otherwise(null_d).alias("mean"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
            null_d.alias("avg_len"),
        ))
    for c in string_cols:
        nn = F.col(f"{c}__nn")
        structs.append(F.struct(
            F.lit(c).alias("col"),
            F.col("__n").alias("n"),
            (F.col("__n") - nn).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            null_d.alias("mean"),
            F.col(f"{c}__mns").alias("min_str"),
            F.col(f"{c}__mxs").alias("max_str"),
            F.when(nn > 0, _round6(F.col(f"{c}__sl").cast("double") / nn))
             .otherwise(null_d).alias("avg_len"),
        ))
    return (
        wide.select(F.explode(F.array(*structs)).alias("m"))
        .select(*[F.col(f"m.{f}") for f in PROFILE_COLUMNS])
    )
