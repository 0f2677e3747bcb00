"""Count-Min sketch heavy hitters — fixed-size mergeable frequency sketch.

The scale story COUNT(*) GROUP BY key cannot tell: at 100 TB the key
space (URLs, shingles, user agents) is unbounded, so an exact global
count shuffles the full distinct key set.  A Count-Min sketch (Cormode &
Muthukrishnan 2005) is d x w COUNTERS regardless of cardinality:

* build  = one groupBy over (row, bucket) pairs — map-side combined, the
  shuffle carries at most d*w cells per input partition, and two cell
  tables MERGE by cell-wise addition (tiers/days/clusters compose);
* query  = est(key) = min over rows r of cell[r][h_r(key)], an
  overestimate with eps = e/w error at delta = e^-d confidence.

Hashes are the repo's portable md5-head32 lanes (row-salted), so the
DuckDB oracle reproduces every cell and estimate bit-for-bit — the
sketch itself is certified through the driver hash gate, not just its
outputs (cf. entry_queries._md5_head32_sql; text._id_hash_head32).

Candidate enumeration: the sketch answers point queries only.  Here the
candidate set is the exact vocabulary (bounded for the synthetic corpus);
at scale candidates come from the same two-phase per-partition local
top-k that text.top_terms uses — the sketch then serves the global
estimate without a full-cardinality shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _lane_hash(key, row: int, width: int):
    """First 32 bits of md5("cms{row}:" + key) mod width — one
    independent hash lane per sketch row (portable DuckDB twin)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{row}:"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def cms_build(
    items: DataFrame,
    depth: int = 4,
    width: int = 64,
    key_col: str = "term",
) -> DataFrame:
    """Build the d x w cell table (row, bucket, cnt) from an item stream.

    One explode (each occurrence -> d (row, bucket) pairs) + one
    groupBy: Spark's HashAggregate collapses each task to <= d*w partial
    cells before the shuffle, so shuffle volume is O(d*w*partitions) —
    independent of both stream length and key cardinality.
    """
    lanes = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    _lane_hash(F.col(key_col), r, width).alias("bucket"),
                )
                for r in range(depth)
            ]
        )
    ).alias("lane")
    return (
        items.select(lanes)
        .groupBy(F.col("lane.row").alias("row"), F.col("lane.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(cells_a: DataFrame, cells_b: DataFrame) -> DataFrame:
    """Merge two cell tables (same d, w) by cell-wise addition — how
    per-day / per-cluster sketches compose into larger spans."""
    return (
        cells_a.unionByName(cells_b)
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    candidates: DataFrame,
    cells: DataFrame,
    depth: int = 4,
    width: int = 64,
    key_col: str = "term",
) -> DataFrame:
    """Point-query each candidate key: est = min over rows of its cell.

    The cell table is <= d*w rows — broadcast; the candidate frame never
    shuffles (explode d lanes, broadcast-join, groupBy the candidate key
    which is already the partitioning of the local aggregation).
    Missing cells (bucket never touched) read as 0.
    """
    lanes = candidates.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _lane_hash(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("lane"),
    ).select("*", F.col("lane.row").alias("row"), F.col("lane.bucket").alias("bucket"))
    joined = lanes.join(F.broadcast(cells), ["row", "bucket"], "left").na.fill(
        {"cnt": 0}
    )
    others = [c for c in candidates.columns if c != key_col]
    return joined.groupBy(key_col).agg(
        *[F.first(c).alias(c) for c in others],
        F.min("cnt").alias("est_count"),
    )


def cms_heavy_hitters(
    docs: DataFrame,
    depth: int = 4,
    width: int = 64,
    text_col: str = "text",
    min_len: int = 3,
) -> DataFrame:
    """Term-frequency heavy hitters with CMS estimates vs exact truth.

    Returns (term, true_count, est_count): est_count >= true_count
    always (CMS never underestimates); the gap is the collision load at
    the chosen width.  Tokenization matches text.top_terms.
    """
    toks = docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term")
    ).filter(F.length("term") >= min_len)
    cells = cms_build(toks, depth, width, key_col="term")
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("true_count"))
    return cms_estimate(exact, cells, depth, width, key_col="term").select(
        "term",
        F.col("true_count").cast("long").alias("true_count"),
        F.col("est_count").cast("long").alias("est_count"),
    )
