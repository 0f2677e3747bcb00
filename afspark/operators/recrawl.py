"""Recrawl change detection: content-change time series per url.

A Common-Crawl-style corpus re-fetches the same url across crawls
(rows share ``url`` and differ in ``warc_ts``).  The operators here turn
those snapshots into a change signal: per url, the Hamming distance
between consecutive crawls' content fingerprints (SimHash — see
dedup.py:329 for the fingerprint itself), flagged as "changed" when the
distance clears a threshold, then rolled up to per-domain change rates
per time bucket — the freshness/volatility metric crawl schedulers
consume (see also crawl-frontier scheduling in linkgraph.py).

Scale shape (100 TB): ``recrawl_deltas`` is one shuffle keyed by url;
per-url history is the crawl count (tens), so the lag window's sort is
over tiny groups — no hot-series risk by construction (unlike
per-series sample windows, documented in sessions.py).  ``change_rate``
is a plain algebraic rollup on (domain, bucket): map-side combined,
tier-chainable like every other rollup.  The fingerprint itself is
computed upstream (Catalyst md5 path or the vectorized FNV path in
dedup.py) — this module never touches the text.

No reference analog (AcousticFeatures.jl processes immutable signals);
semantics follow the standard recrawl-policy literature (change-rate
estimation for crawl scheduling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .rollup import bucket_ts


def recrawl_deltas(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    sim_col: str = "simhash",
) -> DataFrame:
    """Per url ordered by crawl time: Hamming distance between this
    crawl's fingerprint and the previous one (null on the first crawl).

    Adds ``prev_sim`` and ``hamming`` (= bit_count(sim XOR prev_sim)).
    One shuffle on ``url_col``; the within-url sort is over the crawl
    count, which is small and bounded for every url.
    """
    w = W.partitionBy(url_col).orderBy(ts_col)
    prev = F.lag(F.col(sim_col)).over(w)
    ham = F.when(
        prev.isNotNull(),
        F.expr(f"bit_count(CAST({sim_col} AS BIGINT) ^ CAST(prev_sim AS BIGINT))"),
    )
    return pages.withColumn("prev_sim", prev).withColumn("hamming", ham)


def change_rate(
    deltas: DataFrame,
    tier_seconds: int,
    keys: list[str] = ["domain"],
    ts_col: str = "warc_ts",
    changed_if_hamming_gt: int = 3,
) -> DataFrame:
    """Per (keys, bucket): crawl pairs seen, pairs whose content changed
    (hamming > threshold), and total Hamming drift.  All-integer outputs
    (cross-engine exact); algebraic, so coarser tiers re-aggregate finer
    ones by summing the three counters."""
    isw = F.col("hamming").isNotNull()
    return (
        deltas.withColumn("bucket_ts", bucket_ts(F.col(ts_col), tier_seconds))
        .groupBy(*keys, "bucket_ts")
        .agg(
            F.sum(isw.cast("long")).alias("pairs"),
            F.sum(
                (isw & (F.col("hamming") > changed_if_hamming_gt)).cast("long")
            ).alias("changed"),
            F.sum(F.coalesce(F.col("hamming"), F.lit(0)).cast("long")).alias(
                "sum_hamming"
            ),
        )
        .filter(F.col("pairs") > 0)
    )
