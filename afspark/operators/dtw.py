"""Dynamic time warping distance between series over rollup tiers.

DTW aligns two value sequences allowing local time stretching — the
standard elastic similarity for series whose shapes match but whose
timing drifts (daily load curves shifted by deploy hour, seasonal
patterns offset across regions).  Euclidean/Pearson operators
(tsanalytics.lagged_cross_correlation) only see fixed-lag alignment;
DTW completes the similarity family.

``dtw_local`` is the single numpy source of truth (the kernels.py
pattern): an anti-diagonal DP — every cell on an anti-diagonal depends
only on the two previous diagonals, so each step is one vectorized
minimum over the diagonal, no Python-level cell loop.  With the
Sakoe-Chiba ``radius`` the band is applied around the length-scaled
diagonal, bounding work to O((n+m)·r) and ruling out degenerate
alignments.  On integer inputs (cents) every cost is an exact integer
sum, so distances are bit-identical across engines and partitionings —
that is what lets the VALUES-golden oracle hash the distributed result.

Scale shape of ``dtw_pairs``: sequences are assembled once per series
with an algebraic sort-collapsed aggregate (array_sort over (epoch,
value) structs — deterministic under any partitioning; length is
bounded by tier retention, e.g. 30d of 1h buckets = 720 points, NOT by
raw data volume).  The candidate pair table joins each side against
that collapsed table — two co-keyed hash joins shuffling only
(pair × bounded vector).  DTW itself runs in one Arrow-batched
mapInPandas pass, one DP per candidate pair.  At 100 TB you never run
all-pairs: candidates come from the cheap pre-filters (SAX words,
correlation, LSH buckets) and this operator runs unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def dtw_local(
    x: np.ndarray, y: np.ndarray, radius: int | None = None
) -> float:
    """DTW distance with |a-b| local cost; exact on integer inputs.

    Anti-diagonal DP: diagonal d holds cells (i, j) with i+j = d; the
    three predecessors of every cell live on diagonals d-1 and d-2, so
    the whole diagonal updates in one vectorized minimum.  ``radius``
    (Sakoe-Chiba) keeps only cells with |i - j·n/m| <= r (length-scaled
    diagonal); None = unconstrained.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n, m = len(x), len(y)
    if n == 0 or m == 0:
        return float("nan")
    INF = np.inf
    # prev2/prev hold diagonals d-2 and d-1 indexed by i
    prev2 = np.full(n, INF)
    prev = np.full(n, INF)
    scale = n / m
    for d in range(n + m - 1):
        lo = max(0, d - (m - 1))
        hi = min(n - 1, d)
        i = np.arange(lo, hi + 1)
        j = d - i
        cur = np.full(n, INF)
        cost = np.abs(x[i] - y[j])
        up = np.where(j > 0, prev[i], INF)                  # (i, j-1)
        left = np.where(i > 0, prev[i - 1], INF)            # (i-1, j)
        diag = np.where((i > 0) & (j > 0), prev2[i - 1], INF)  # (i-1, j-1)
        best = np.minimum(np.minimum(up, left), diag)
        best = np.where((i == 0) & (j == 0), 0.0, best)
        val = cost + best
        if radius is not None:
            val = np.where(np.abs(i - j * scale) <= radius, val, INF)
        cur[i] = val
        prev2, prev = prev, cur
    out = prev[n - 1]
    return float(out)


def _collapse(tier, keys, bucket_col, value_col, prefix):
    be = F.unix_timestamp(F.col(bucket_col))
    return tier.groupBy(
        *[F.col(k).alias(f"{prefix}{k}") for k in keys]
    ).agg(
        F.array_sort(
            F.collect_list(F.struct(be.alias("e"), F.col(value_col).alias("v")))
        ).alias(f"{prefix}seq")
    )


def dtw_pairs(
    tier: DataFrame,
    candidates: DataFrame,
    radius: int | None = None,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
) -> DataFrame:
    """DTW distance for every candidate pair.

    ``candidates`` carries columns a_<key>... and b_<key>...; the output
    appends n_a, n_b (sequence lengths) and dtw.
    """
    a = _collapse(tier, keys, bucket_col, value_col, "a_")
    b = _collapse(tier, keys, bucket_col, value_col, "b_")
    j = candidates.join(a, [f"a_{k}" for k in keys]).join(
        b, [f"b_{k}" for k in keys]
    )
    out_fields = [
        *[StructField(f"a_{k}", StringType()) for k in keys],
        *[StructField(f"b_{k}", StringType()) for k in keys],
        StructField("n_a", LongType()),
        StructField("n_b", LongType()),
        StructField("dtw", DoubleType()),
    ]
    schema = StructType(out_fields)
    key_cols = [f"a_{k}" for k in keys] + [f"b_{k}" for k in keys]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for _, r in pdf.iterrows():
                xs = np.array([e["v"] for e in r["a_seq"]], dtype=np.float64)
                ys = np.array([e["v"] for e in r["b_seq"]], dtype=np.float64)
                rows.append(
                    (*[r[c] for c in key_cols], len(xs), len(ys),
                     dtw_local(xs, ys, radius))
                )
            yield pd.DataFrame(rows, columns=[f.name for f in out_fields])

    return j.mapInPandas(run, schema=schema)
