"""Z-order clustering: bit-exact key math, domain guard, and REAL parquet
footer pruning — the skipping claim is measured on written files' min/max
statistics, not asserted in prose."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from afspark.sources.zorder import (
    cluster_zorder,
    file_envelopes,
    quantize,
    skipping_fraction,
    zvalue,
)


def _spread_np(x):
    x = x.astype(np.uint64)
    for sh, m in [(8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)]:
        x = (x | (x << np.uint64(sh))) & np.uint64(m)
    return x


def _z_np(a, b):
    return _spread_np(a) | (_spread_np(b) << np.uint64(1))


def test_zvalue_matches_numpy_reference(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 61).alias("a"), ((F.col("id") * 7) % 53).alias("b")
    )
    out = df.select("a", "b", zvalue(F.col("a"), F.col("b"), 6).alias("z")).toPandas()
    zref = _z_np(out.a.to_numpy(), out.b.to_numpy())
    assert (out.z.to_numpy().astype(np.uint64) == zref).all()


def test_zvalue_full_16_bit_domain_corners(spark):
    corners = [(0, 0), (65535, 65535), (65535, 0), (0, 65535), (1, 2), (32768, 1)]
    df = spark.createDataFrame(corners, "a long, b long")
    out = {(r.a, r.b): r.z for r in df.select(
        "a", "b", zvalue(F.col("a"), F.col("b")).alias("z")).collect()}
    for a, b in corners:
        assert out[(a, b)] == int(_z_np(np.array([a]), np.array([b]))[0])


def test_zvalue_is_bijective_on_domain(spark):
    df = spark.range(0, 64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    n = df.select(zvalue(F.col("a"), F.col("b"), 6).alias("z")).distinct().count()
    assert n == 64 * 64


def test_zvalue_domain_guard_raises(spark):
    df = spark.range(0, 4).select(F.col("id").alias("a"), F.lit(64).alias("b"))
    with pytest.raises(Exception, match="out of"):
        df.select(zvalue(F.col("a"), F.col("b"), 6)).collect()
    with pytest.raises(ValueError, match="bits"):
        zvalue(F.col("a"), F.col("b"), 17)


def test_quantize_clamps_and_spans(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], "v double"
    )
    out = [r.q for r in df.select(
        quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q")).collect()]
    assert out[0] == 0          # clamped below
    assert out[1] == 0
    assert out[2] == 128        # midpoint -> half the range
    assert out[3] == 255        # hi -> top bucket (clamped from 256)
    assert out[4] == 255        # clamped above


def test_clustered_files_prune_on_both_dims(spark, tmp_path):
    """The point of z-order: a box predicate on EITHER dimension skips a
    large fraction of files via footer min/max, where a linear sort by
    ``a`` skips nothing for ``b`` predicates."""
    # b must be statistically independent of a (hash, not an affine map of
    # id — an affine b mod 64 is CONSTANT within each a residue class, which
    # would gift the linear layout tight b envelopes it doesn't deserve)
    df = spark.range(0, 20_000).select(
        (F.col("id") % 64).alias("a"),
        F.pmod(F.xxhash64("id"), F.lit(64)).alias("b"),
        F.col("id").alias("payload"),
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    cluster_zorder(df, "a", "b", bits=6, n_files=16).write.parquet(zdir)
    (
        df.repartitionByRange(16, F.col("a"))
        .sortWithinPartitions("a")
        .write.parquet(ldir)
    )
    envz = file_envelopes(zdir, ["a", "b"])
    envl = file_envelopes(ldir, ["a", "b"])
    assert len(envz) == 16 and len(envl) == 16

    box_b = {"b": (16, 23)}  # 1/8 of the b domain
    assert skipping_fraction(envl, box_b) == 0.0  # linear layout: no help
    assert skipping_fraction(envz, box_b) >= 0.5  # z layout: real pruning

    box_a = {"a": (8, 15)}
    assert skipping_fraction(envz, box_a) >= 0.5  # ...and still prunes on a

    # correctness of the pruning verdict: files the pruner keeps contain
    # every row matching the box
    import pyarrow.parquet as pq
    import os

    keep = envz[(envz.b_max >= 16) & (envz.b_min <= 23)]
    got = 0
    for f in keep.file:
        t = pq.read_table(os.path.join(zdir, f), columns=["b"])
        bb = t.column("b").to_numpy()
        got += int(((bb >= 16) & (bb <= 23)).sum())
    expected = df.filter((F.col("b") >= 16) & (F.col("b") <= 23)).count()
    assert got == expected


def test_cluster_zorder_preserves_rows(spark):
    df = spark.range(0, 5_000).select(
        (F.col("id") % 64).alias("a"), ((F.col("id") * 13) % 64).alias("b"),
        F.col("id").alias("payload"),
    )
    out = cluster_zorder(df, "a", "b", bits=6, n_files=8)
    assert out.count() == 5_000
    assert out.select(F.sum("payload")).first()[0] == 5_000 * 4_999 // 2


def test_quantize_null_nan_propagate(spark):
    df = spark.createDataFrame([(None,), (float("nan"),), (50.0,)], "v double")
    out = [r.q for r in df.select(
        quantize(F.col("v"), 0.0, 100.0, bits=8).alias("q")).collect()]
    assert out == [None, None, 128]  # missing never aliases into a bucket


def test_skipping_fraction_keeps_statless_files():
    import pandas as pd

    env = pd.DataFrame({
        "file": ["nostats", "stats"],
        "b_min": [None, 10], "b_max": [None, 20],
        "s_min": [None, "aa"], "s_max": [None, "bb"],
    })
    # numeric: only the stats-bearing file is skippable
    assert skipping_fraction(env, {"b": (100, 200)}) == 0.5
    # string stats with None must not raise; same keep rule
    assert skipping_fraction(env, {"s": ("zz", "zz")}) == 0.5
