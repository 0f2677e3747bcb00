"""Distributed Score: windowed feature kernels over a samples DataFrame.

Spark twin of the reference's ``Score(f, x; winlen, noverlap)``
(/root/reference/src/AcousticFeatures.jl:864-890).  The 3-D AxisArray
(sample x feature x channel) becomes a long result table
``(series_id, win_start, feature, value)`` — axes are materialized data.

Dataflow (one shuffle + one Arrow hop):

  samples(series_id, seq, value)
    -> assign_chunks            (narrow; halo rows replicated via explode)
    -> groupBy(series_id,chunk) (the shuffle; key cardinality = series*chunks,
                                 so hot series still spread across chunks)
    -> applyInPandas            (Arrow batches -> numpy kernels -> Arrow)

Inside each chunk the kernel input windows are zero-copy numpy stride
views; every float reduction happens in the same numpy code as the local
golden path (functions/kernels.py), which is what makes distributed ==
local bit-for-bit (tests/test_score_spark.py).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Feature
from .windows import ChunkSpec, assign_chunks, make_chunk_spec

RESULT_SCHEMA = "series_id string, win_start long, feature string, value double"


def _make_evaluator(
    features: Sequence[Feature],
    spec: ChunkSpec,
    fs: float,
    preprocess: Callable[[np.ndarray], np.ndarray] | None,
):
    """Per-(series, chunk) kernel evaluator for applyInPandas."""
    winlen, step, span = spec.winlen, spec.step, spec.chunk_span
    feat_names = [(f, f.names()) for f in features]

    def evaluate(key, pdf):
        series_id, chunk = key
        pdf = pdf.sort_values("seq")
        seqs = pdf["seq"].to_numpy()
        vals = pdf["value"].to_numpy(dtype=np.float64)
        seq0 = int(seqs[0])
        seq_last = int(seqs[-1])
        if seq_last - seq0 + 1 != len(seqs):
            raise ValueError(
                f"samples not dense for series={series_id} chunk={chunk}: "
                f"[{seq0},{seq_last}] has {len(seqs)} rows"
            )
        chunk_start = int(chunk) * span + 1
        # global window starts owned by this chunk (aligned to the 1-based
        # hop grid), restricted to fully-available windows (flush=false)
        first = chunk_start
        n_starts = span // step
        starts = first + step * np.arange(n_starts, dtype=np.int64)
        starts = starts[(starts >= seq0) & (starts + winlen - 1 <= seq_last)]
        if len(starts) == 0 or len(vals) < winlen:
            return pd.DataFrame(
                {"series_id": [], "win_start": [], "feature": [], "value": []}
            ).astype({"series_id": str, "win_start": "int64", "value": "float64"})
        W = np.lib.stride_tricks.sliding_window_view(vals, winlen)[starts - seq0]
        if preprocess is not None:
            W = np.stack([np.asarray(preprocess(w), dtype=np.float64) for w in W])
        out_frames = []
        for feat, names in feat_names:
            m = np.asarray(feat.compute_batch(W, fs), dtype=np.float64)
            nwin, arity = m.shape
            out_frames.append(
                pd.DataFrame(
                    {
                        "series_id": np.repeat(series_id, nwin * arity),
                        "win_start": np.repeat(starts, arity),
                        "feature": np.tile(np.asarray(names, dtype=object), nwin),
                        "value": m.ravel(),
                    }
                )
            )
        return pd.concat(out_frames, ignore_index=True)

    return evaluate


def score(
    samples: DataFrame,
    features: Sequence[Feature] | Feature,
    winlen: int,
    noverlap: int = 0,
    fs: float = 1.0,
    preprocess: Callable[[np.ndarray], np.ndarray] | None = None,
    target_chunk_samples: int = 65_536,
    series_col: str = "series_id",
    seq_col: str = "seq",
    value_col: str = "value",
) -> DataFrame:
    """Windowed feature scores, long format.

    Args mirror the reference Score; ``features`` may be a list — all are
    evaluated in a single shuffle + single Python pass per chunk.
    Validation mirrors reference :870 (noverlap >= 0, step > 0); the
    reference's ``winlen <= xlen`` check (:876) happens naturally per
    series (short series simply emit no windows).
    """
    if isinstance(features, Feature):
        features = [features]
    spec = make_chunk_spec(winlen, noverlap, target_chunk_samples)
    sdf = samples.select(
        F.col(series_col).cast("string").alias("series_id"),
        F.col(seq_col).cast("long").alias("seq"),
        F.col(value_col).cast("double").alias("value"),
    )
    chunked = assign_chunks(sdf, spec)
    return chunked.groupBy("series_id", "chunk").applyInPandas(
        _make_evaluator(list(features), spec, fs, preprocess), RESULT_SCHEMA
    )


def score_wide(score_long: DataFrame) -> DataFrame:
    """Pivot the long score table to one column per feature label."""
    return (
        score_long.groupBy("series_id", "win_start")
        .pivot("feature")
        .agg(F.first("value"))
    )
