"""Dominant-period detection per series via the FFT periodogram.

Answers "what is this series' seasonality?" — the ``m`` that the
seasonal operators (rollup seasonal_zscore, tsanalytics holt_winters /
seasonal Holt) take as an input.  Reference parity: AcousticFeatures.jl
computes spectra via the same rFFT machinery (src/utils.jl spectrum
helpers); this operator applies it to rolled-up tiers instead of raw
audio frames.

``dominant_period_local`` is the numpy single source of truth (the
kernels.py pattern): regularize the bucket series onto its full
[min, max] epoch spine, fill gaps with the series mean (spectrally
neutral: adds only DC, which is excluded), mean-center, rFFT, and take
the peak power bin over k = 1..n/2 (ties -> smallest k, deterministic).
Outputs are rounded to integer micros so the driver can hash them.

Scale shape: one algebraic collapse per series (array_sort struct
aggregate — bounded by tier retention, e.g. 720 points for 30d of 1h,
NOT by raw volume), then one Arrow-batched mapInPandas pass with one
rFFT per series.  No driver collect, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def dominant_period_local(
    epochs: np.ndarray, values: np.ndarray, tier_seconds: int
) -> tuple[int, int, int, int] | None:
    """(n_grid, k_peak, period_s, ratio_micros) or None if undefined.

    n_grid is the regular spine length; k_peak the winning frequency
    bin; period_s = n_grid*tier_seconds/k_peak floored to seconds;
    ratio_micros = floor(peak_power/total_power * 1e6 + 0.5).
    """
    order = np.argsort(epochs, kind="stable")
    e = np.asarray(epochs, dtype=np.int64)[order]
    v = np.asarray(values, dtype=np.float64)[order]
    if len(e) < 4:
        return None
    n = int((e[-1] - e[0]) // tier_seconds) + 1
    grid = np.full(n, np.nan)
    grid[(e - e[0]) // tier_seconds] = v
    mean = np.nanmean(grid)
    grid = np.where(np.isnan(grid), mean, grid) - mean
    if not np.any(grid):
        return None  # flat series: no spectrum
    p = np.abs(np.fft.rfft(grid)) ** 2
    p[0] = 0.0
    if len(p) < 2:
        return None
    total = float(p.sum())
    if total <= 0.0:
        return None
    k = int(np.argmax(p))  # argmax takes the FIRST max -> smallest k
    ratio = float(p[k]) / total
    period = (n * tier_seconds) // k
    return n, k, int(period), int(np.floor(ratio * 1e6 + 0.5))


def dominant_period(
    tier: DataFrame,
    tier_seconds: int,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
) -> DataFrame:
    """Dominant period per series off a rollup tier.

    Output: keys + n_grid, k_peak, period_s, ratio_micros.  Series too
    short or flat for a spectrum emit no row.
    """
    be = F.unix_timestamp(F.col(bucket_col))
    collapsed = tier.groupBy(*keys).agg(
        F.array_sort(
            F.collect_list(F.struct(be.alias("e"), F.col(value_col).alias("v")))
        ).alias("_seq")
    )
    schema = StructType(
        [StructField(k, StringType()) for k in keys]
        + [
            StructField("n_grid", LongType()),
            StructField("k_peak", LongType()),
            StructField("period_s", LongType()),
            StructField("ratio_micros", LongType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                e = np.array([s["e"] for s in r["_seq"]], dtype=np.int64)
                v = np.array([s["v"] for s in r["_seq"]], dtype=np.float64)
                got = dominant_period_local(e, v, tier_seconds)
                if got is not None:
                    rows.append((*[r[k] for k in keys], *got))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return collapsed.mapInPandas(run, schema=schema)
