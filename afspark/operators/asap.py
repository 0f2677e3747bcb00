"""ASAP-style automatic smoothing over rollup tiers (Rong & Bailis,
VLDB 2017): pick, per series, the moving-average window that minimizes
ROUGHNESS (std of the smoothed series' first differences) subject to
PRESERVING KURTOSIS (the smoothed series must keep at least the raw
series' outlier structure, kurt_w >= kurt_1) — the dashboard "smooth
this chart as much as honesty allows" knob.

This is the exhaustive variant of the ASAP objective: every window
1..max_w is scored.  The paper prunes candidates with ACF peaks to hit
interactive latency on ONE core and ONE long series; here the axis of
scale is series COUNT (millions of url-domains), each series a tier
vector bounded by retention (30d of 1h buckets = 720 points), so the
O(n * max_w) cumsum sweep per series is microseconds inside an Arrow
batch and the exhaustive search is strictly better than the pruned one.
The distributed pass runs through operators/_grouped.py (one
explicit-count shuffle, in-process series grouping — no per-group
Arrow batches).

Determinism: the ONE local kernel below is the single source of truth —
the Spark path and tools/gen_goldens.py's VALUES oracle both call it on
identical float64 inputs (exact-integer cent sums), so outputs are
bit-identical; stats are emitted as floor(x*1e6+0.5) micros BIGINTs.

Conventions (fixed, engine-independent): population moments throughout
(ddof=0); kurtosis = m4/m2^2 (Pearson, no -3), 0.0 when m2 == 0;
roughness = population std of np.diff(SMA_w), 0.0 when the smoothed
series has < 2 points; ties on roughness resolve to the SMALLEST
window; max_w = max(1, n // 5) so the smoothed series keeps >= 5
points of shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _kurtosis(x: np.ndarray) -> float:
    m = x.mean()
    d = x - m
    m2 = float((d * d).mean())
    if m2 <= 0.0:
        return 0.0
    m4 = float((d * d * d * d).mean())
    return m4 / (m2 * m2)


def _roughness(x: np.ndarray) -> float:
    if x.size < 2:
        return 0.0
    d = np.diff(x)
    return float(d.std())  # ddof=0


def asap_smooth_local(x: np.ndarray, max_w: int | None = None):
    """Exhaustive ASAP window pick for one series.

    Returns (w_opt, kurt_raw, rough_raw, kurt_opt, rough_opt,
    sma_checksum) where sma_checksum = sum(floor(sma*1e6+0.5)) as int —
    a value-sensitive fingerprint of the chosen smoothed series — or
    None for series too short to smooth (n < 8).
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < 8:
        return None
    if max_w is None:
        max_w = max(1, n // 5)
    kurt_raw = _kurtosis(x)
    rough_raw = _roughness(x)
    # prefix sums once; SMA_w = (c[w:] - c[:-w]) / w for every w
    c = np.concatenate([[0.0], np.cumsum(x)])
    best = (rough_raw, 1, kurt_raw, x)
    for w in range(2, max_w + 1):
        sma = (c[w:] - c[:-w]) / w
        k = _kurtosis(sma)
        if k < kurt_raw:
            continue
        r = _roughness(sma)
        if r < best[0]:
            best = (r, w, k, sma)
    rough_opt, w_opt, kurt_opt, sma = best
    checksum = int(np.floor(sma * 1e6 + 0.5).sum())
    return w_opt, kurt_raw, rough_raw, kurt_opt, rough_opt, checksum


def asap_smooth(
    points: DataFrame,
    bucket_seconds: int,
    keys: list[str] = ["series_id"],
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-series ASAP pick over the bucketed tier (one row per series).

    The tier series is the ORDERED bucket-sum vector (missing buckets
    compress out, as in matrixprofile.matrix_profile_discord; gap-fill
    upstream when calendar spacing matters).

    Output: keys + n_buckets, w_opt, kurt_raw_u, rough_raw_u,
    kurt_opt_u, rough_opt_u (micros), sma_checksum.
    """
    from ._grouped import grouped_map_in_pandas

    be = (F.floor(F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
          * bucket_seconds).cast("long")
    tier = (
        points.select(*keys, be.alias("_be"), F.col(value_col).alias("_v"))
        .groupBy(*keys, "_be")
        .agg(F.sum("_v").alias("_sv"))
    )
    key_schema = ", ".join(f"{k} string" for k in keys)
    out_schema = (
        f"{key_schema}, n_buckets long, w_opt long, kurt_raw_u long, "
        "rough_raw_u long, kurt_opt_u long, rough_opt_u long, "
        "sma_checksum long"
    )

    def per_series(pdf: pd.DataFrame) -> pd.DataFrame | None:
        got = asap_smooth_local(pdf["_sv"].to_numpy(np.float64))
        if got is None:
            return None
        w, kr, rr, ko, ro, cs = got
        head = pdf.iloc[:1][keys].reset_index(drop=True)
        head["n_buckets"] = np.int64(len(pdf))
        head["w_opt"] = np.int64(w)
        head["kurt_raw_u"] = np.int64(np.floor(kr * 1e6 + 0.5))
        head["rough_raw_u"] = np.int64(np.floor(rr * 1e6 + 0.5))
        head["kurt_opt_u"] = np.int64(np.floor(ko * 1e6 + 0.5))
        head["rough_opt_u"] = np.int64(np.floor(ro * 1e6 + 0.5))
        head["sma_checksum"] = np.int64(cs)
        return head

    return grouped_map_in_pandas(tier, keys, ["_be"], per_series, out_schema)
