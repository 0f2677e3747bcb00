"""The spark-submit rollup job (jobs/rollup_job.py): unit-partitioned
scoring equals the fused pipeline, and resume skips committed units."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from afspark.functions import kernels as K
from afspark.operators.rollup import TIERS, score_pages_to_tiers
from afspark.sources.pages import generate_pages, with_series_offsets
from afspark.streaming.checkpoint import CheckpointLog, run_resumable
from jobs.rollup_job import score_unit

WINLEN, NOVERLAP, FS = 256, 128, 1000.0
ORIGIN = 1_699_999_980  # minute-aligned: buckets nest in units
FEATURES = [K.Energy(), K.ZeroCrossingRate()]


def _tier_key(r):
    return (r.series_id, r.bucket_ts)


def _tier_val(r):
    return (r.cnt, r.sum, r.min, r.max, r.first, r.last)


@pytest.fixture(scope="module")
def offs(spark):
    df = with_series_offsets(generate_pages(spark, 300)).persist()
    df.count()
    yield df
    df.unpersist()


def test_unit_scoring_equals_fused_pipeline(spark, offs):
    """Union of per-unit 1m tiers == the single-pass fused pipeline —
    boundary-straddling windows are computed exactly once."""
    n_samples = int(offs.agg(F.sum(F.octet_length("text"))).first()[0])
    unit_samples = 60_000  # 60 s at fs=1000: minute-aligned units
    n_units = -(-n_samples // unit_samples)
    assert n_units >= 3  # the test must actually cross unit boundaries

    parts = [
        score_unit(offs, u, unit_samples, FEATURES, WINLEN, NOVERLAP, FS, ORIGIN)
        for u in range(n_units)
    ]
    got = parts[0]
    for p in parts[1:]:
        got = got.unionByName(p)
    want = score_pages_to_tiers(
        offs, FEATURES, WINLEN, NOVERLAP, fs=FS, origin_epoch=ORIGIN
    )["1m"]
    g = {_tier_key(r): _tier_val(r) for r in got.collect()}
    w = {_tier_key(r): _tier_val(r) for r in want.collect()}
    assert set(g) == set(w)
    for k in w:
        assert g[k][0] == w[k][0], k
        assert g[k][1:] == pytest.approx(w[k][1:], rel=1e-12)


def test_resume_skips_committed_units(spark, offs, tmpdir):
    """Second run processes nothing and the store bytes are untouched."""
    out = str(tmpdir.join("store"))
    ckpt = str(tmpdir.join("ckpt"))
    log = CheckpointLog(spark, ckpt)
    keys = ["u0", "u1", "u2"]

    def process(key):
        return score_unit(
            offs, int(key[1:]), 60_000, FEATURES, WINLEN, NOVERLAP, FS, ORIGIN
        )

    s1 = run_resumable(spark, "score_1m", keys, process, out, log)
    assert s1["processed"] == keys and s1["skipped"] == []

    def listing(root):
        got = {}
        for dp, _dn, fn in os.walk(root):
            for f in fn:
                p = os.path.join(dp, f)
                got[os.path.relpath(p, root)] = os.path.getmtime(p)
        return got

    before = listing(out)
    s2 = run_resumable(spark, "score_1m", keys, process, out, log)
    assert s2["processed"] == [] and s2["skipped"] == keys
    assert listing(out) == before  # bytes untouched: no recompute, no rewrite

    # lineage rows carry metrics for every committed unit
    m = log.metrics().filter(F.col("stage") == "score_1m").collect()
    assert {r.partition_key for r in m} == set(keys)
    assert all(r.rows >= 0 and r.wall_ms >= 0 for r in m)
