"""SAX symbolization: PAA frames + Gaussian-breakpoint letters.

Symbolic Aggregate approXimation (Lin, Keogh et al., DMKD 2007): each
series is z-normalized, averaged over fixed time frames (PAA), and each
frame mean is mapped to a letter by the equiprobable N(0,1) breakpoints.
The letter strings are the standard representation for time-series
indexing, motif/discord mining, and cheap shape matching — the symbolic
sibling of this repo's numeric downsamplers (lttb.py: LTTB, M4).

Scale shape: per-series stats and per-frame means are algebraic
aggregates sharing the series shuffle key; their join is co-keyed (no
extra shuffle beyond the two aggregates' own).  No windows, no UDFs —
letters come from a chained CASE on the z-score.  Engine-exact: all
sums are exact integers on a cents tier, and mean/variance/z flow
through the same IEEE expressions in the SQL twin, so letter boundaries
land identically (breakpoints are irrational — exact ties have measure
zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# equiprobable N(0,1) quantile breakpoints per alphabet size
BREAKPOINTS: dict[int, list[float]] = {
    2: [0.0],
    3: [-0.4307272992954576, 0.4307272992954576],
    4: [-0.6744897501960817, 0.0, 0.6744897501960817],
    5: [-0.8416212335729142, -0.2533471031357997,
        0.2533471031357997, 0.8416212335729142],
    6: [-0.9674215661017014, -0.4307272992954576, 0.0,
        0.4307272992954576, 0.9674215661017014],
    8: [-1.1503493803760079, -0.6744897501960817, -0.3186393639643751,
        0.0, 0.3186393639643751, 0.6744897501960817, 1.1503493803760079],
}

_LETTERS = "abcdefgh"


def sax_symbolize(
    tier: DataFrame,
    frame_seconds: int,
    alphabet: int = 4,
    keys: list[str] = ["series_id"],
    bucket_col: str = "bucket_ts",
    value_col: str = "sum",
) -> DataFrame:
    """Symbolize each series: one row per (series, PAA frame).

    Frames are absolute epoch-aligned windows of ``frame_seconds``
    (floor(bucket_epoch / frame)), so frames are stable under data
    growth and across engines.  z-normalization uses the per-series
    POPULATION variance over all tier buckets.  Flat series (zero
    variance) emit NULL letters — symbolizing them is undefined.

    Output: keys + frame_epoch, n_buckets, paa, z, letter.
    """
    if alphabet not in BREAKPOINTS:
        raise ValueError(f"alphabet must be one of {sorted(BREAKPOINTS)}")
    be = F.unix_timestamp(F.col(bucket_col))
    v = F.col(value_col)
    base = tier.select(*keys, be.alias("_be"), v.alias("_v"))
    stats = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").alias("_sx"),
        F.sum(F.col("_v") * F.col("_v")).alias("_sxx"),
    )
    frames = (
        base.withColumn(
            "frame_epoch",
            (F.floor(F.col("_be") / frame_seconds) * frame_seconds).cast("long"),
        )
        .groupBy(*keys, "frame_epoch")
        .agg(F.count(F.lit(1)).alias("n_buckets"), F.sum("_v").alias("_fs"))
    )
    j = frames.join(stats, keys)
    # cast the exact-integer sums to double BEFORE combining: n*sxx can
    # overflow int64 on long high-magnitude series, and the SQL twin
    # casts at the same points so the float expressions stay identical
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sxx = F.col("_sxx").cast("double")
    mu = sx / n
    var = (n * sxx - sx * sx) / (n * n)
    paa = F.col("_fs").cast("double") / F.col("n_buckets").cast("double")
    z = (paa - mu) / F.sqrt(var)
    letter = F.lit(_LETTERS[len(BREAKPOINTS[alphabet])])
    for i in reversed(range(len(BREAKPOINTS[alphabet]))):
        letter = F.when(z < F.lit(BREAKPOINTS[alphabet][i]),
                        F.lit(_LETTERS[i])).otherwise(letter)
    return j.select(
        *keys,
        "frame_epoch",
        "n_buckets",
        paa.alias("paa"),
        F.when(var > 0, z).alias("z"),
        F.when(var > 0, letter).alias("letter"),
    )


def sax_words(sax: DataFrame, keys: list[str] = ["series_id"]) -> DataFrame:
    """Collapse per-frame letters into one SAX word per series.

    Frame order is restored with array_sort over (frame_epoch, letter)
    structs — deterministic under any partitioning.  Frames with NULL
    letters (flat series) produce a NULL word.

    Output: keys + n_frames, word.
    """
    return (
        sax.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.array_sort(
                F.collect_list(F.struct("frame_epoch", "letter"))
            ).alias("_fs"),
            F.max(F.col("letter").isNull().cast("int")).alias("_has_null"),
        )
        .select(
            *keys,
            "n_frames",
            F.when(
                F.col("_has_null") == 0,
                F.concat_ws(
                    "", F.transform(F.col("_fs"), lambda x: x["letter"])
                ),
            ).alias("word"),
        )
    )
