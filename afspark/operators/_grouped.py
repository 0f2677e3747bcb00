"""In-process grouped Arrow execution — the engine-wide replacement for
``groupBy().applyInPandas()`` on many-small-group data.

``applyInPandas`` ships ONE Arrow batch per group; with historian-shaped
data (millions of short series, or series x day chunk grids) the
per-group Python/Arrow round-trip dominates the kernel — measured 5.4 s
for a 1500-group identity pass over 100k rows at sf0.1
(operators/sdt.py, where the pattern was first established).  This
helper keeps the exact grouped semantics but runs ONE explicit-count
shuffle on the group columns (explicit so AQE byte-coalescing cannot
serialize a CPU-bound stage — the score.py gotcha), sorts within
partitions, and splits each Arrow batch on group boundaries in-process,
carrying the tail group into the next batch.  Group count per task is
unbounded; memory is bounded by one group's rows (the same documented
skew bound as the per-group task shape it replaces).

Scale shape at 100 TB: the shuffle volume equals the input (same as
applyInPandas), but the task count follows ``n_partitions`` instead of
exploding with group count, and the Python worker sees large Arrow
batches instead of millions of tiny ones.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def default_grouped_partitions(spark) -> int:
    """Partition count for grouped Arrow stages, from session conf only.

    max(defaultParallelism, spark.sql.shuffle.partitions): every core
    gets work locally, and on a cluster the deployment's shuffle-
    partition sizing (the standard scale knob) carries over.  Never
    derived from ``df.rdd`` — under AQE that *executes* the upstream
    shuffle stages as a real job just to read a partition count.
    """
    sc = spark.sparkContext
    try:
        shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:  # noqa: BLE001 — e.g. "auto" on some platforms
        shuffle_parts = 0
    return max(sc.defaultParallelism, shuffle_parts)


def grouped_map_in_pandas(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    segment_fn: Callable[[pd.DataFrame], pd.DataFrame | None],
    schema: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Apply ``segment_fn`` to each group of ``df``, grouped in-process.

    ``segment_fn`` receives one group's rows as a pandas slice, already
    sorted by ``order_cols`` (Spark's sort — ties beyond the listed
    columns are arbitrary, exactly as with applyInPandas + an in-group
    sort); its index is NOT reset.  Return a DataFrame matching
    ``schema`` (or None/empty to emit nothing for the group).

    Group columns must be non-null (the tail-carry equality test does
    not match NaN/None); every caller here groups on series keys or
    bucketed timestamps, which satisfy that.
    """
    def _run(pdf: pd.DataFrame):
        change = np.zeros(len(pdf), dtype=bool)
        for k in group_cols:
            ka = pdf[k].to_numpy()
            change[1:] |= ka[1:] != ka[:-1]
        bounds = [0, *np.flatnonzero(change).tolist(), len(pdf)]
        outs = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e > s:
                out = segment_fn(pdf.iloc[s:e])
                if out is not None and len(out):
                    outs.append(out)
        if not outs:
            return None
        return pd.concat(outs, ignore_index=True)

    return grouped_batch_in_pandas(
        df, group_cols, order_cols, _run, schema, n_partitions
    )


def grouped_batch_in_pandas(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str],
    batch_fn: Callable[[pd.DataFrame], pd.DataFrame | None],
    schema: str,
    n_partitions: int | None = None,
) -> DataFrame:
    """Whole-batch variant of :func:`grouped_map_in_pandas`.

    ``batch_fn`` receives a reset-index pandas batch that contains only
    COMPLETE groups (the trailing group of each Arrow batch is carried
    into the next one by the shared generator below), sorted by
    ``group_cols + order_cols``.  Use this instead of the per-group
    ``segment_fn`` form when per-group pandas slice construction would
    dominate the kernel (measured ~40x on historian-shaped short
    series — operators/sdt.py); the batch_fn then does its own numpy
    boundary split via the same change-point scan.
    """
    if not group_cols:
        # repartition(n) with no columns is round-robin and the is_last
        # scan is all-True: every partition would emit its own "result"
        # for the single global group instead of one.  No caller needs a
        # global group; fail loudly instead of degenerating silently.
        raise ValueError("group_cols must be non-empty")
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism

    def _gen(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            # the last group may continue in the next Arrow batch
            is_last = np.ones(len(pdf), dtype=bool)
            for k in group_cols:
                is_last &= (pdf[k] == pdf[k].iloc[-1]).to_numpy()
            carry = pdf.loc[is_last]
            body = pdf.loc[~is_last]
            if len(body):
                out = batch_fn(body.reset_index(drop=True))
                if out is not None and len(out):
                    yield out
        if carry is not None and len(carry):
            out = batch_fn(carry.reset_index(drop=True))
            if out is not None and len(out):
                yield out

    return (
        df.repartition(n, *[F.col(k) for k in group_cols])
        .sortWithinPartitions(*group_cols, *order_cols)
        .mapInPandas(_gen, schema=schema)
    )
