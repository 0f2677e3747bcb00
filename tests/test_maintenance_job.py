"""jobs/maintenance_job.py: retention + clustering compaction + snapshot
expiry as one schedulable pass, idempotent on re-run."""

import datetime as dtm
import json
import os
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from afspark.sources.chunkstore import read_points, write_chunk_store
from afspark.sources.manifest import commit_append, read_snapshot
from jobs.maintenance_job import main


def _run(capsys, argv):
    main(argv)
    return [json.loads(l) for l in capsys.readouterr().out.splitlines()
            if l.startswith("{")]


def test_maintenance_passes_and_idempotence(spark, tmp_path, capsys):
    store = str(tmp_path / "tiers")
    rows = [
        (f"s{i:02d}", dtm.datetime(2024, 1, d, h, 0, 0), float(i + d * 10 + h))
        for i in range(12)
        for d in (1, 2, 10)
        for h in range(4)
    ]
    pts = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    # streaming-shaped ingest: appends -> many small files per partition
    write_chunk_store(pts.filter(F.col("series_id") < "s06"), store,
                      mode="overwrite", n_buckets=1)
    write_chunk_store(pts.filter(F.col("series_id") >= "s06"), store,
                      mode="append", n_buckets=1)

    snap = str(tmp_path / "snapstore")
    for day in (1, 2, 3):
        commit_append(
            spark, spark.createDataFrame([(day, float(day))], "k int, v double"), snap
        )

    argv = [
        "--store", store, "--retention-days", "7", "--today", "2024-01-10",
        "--target-files", "2", "--cluster", "series",
        "--snapshot-store", snap, "--keep-snapshots", "2",
        "--orphan-grace-seconds", "0",
    ]
    out = {o["pass"]: o for o in _run(capsys, argv)}

    # retention dropped the two expired dates (keep 2024-01-03 onward)
    assert out["retention"]["partitions_removed"] == 2
    dates = sorted(p.name for p in Path(store).glob("chunk_date=*"))
    assert dates == ["chunk_date=2024-01-10"]

    # compaction hit the surviving partition and clustered it
    assert out["compaction"]["partitions_rewritten"] == 1
    bdir = next(Path(store).glob("chunk_date=*/bucket=*"))
    files = list(bdir.glob("*.parquet"))
    assert 1 <= len(files) <= 2
    # surviving points intact: every series' 2024-01-10 rows, values exact
    got = sorted(
        (r.series_id, r.ts, r.value) for r in read_points(spark, store).collect()
    )
    want = sorted((s, t, v) for s, t, v in rows if t.day == 10)
    assert got == want

    # snapshot expiry kept the newest 2 manifests; pinned read still works
    assert out["snapshot_expiry"]["manifests_removed"] == 1
    assert read_snapshot(spark, snap).count() == 3  # appends accumulate

    # idempotence: the re-run is a no-op on every pass
    out2 = {o["pass"]: o for o in _run(capsys, argv)}
    assert out2["retention"]["partitions_removed"] == 0
    assert out2["compaction"]["partitions_rewritten"] == 0
    assert out2["snapshot_expiry"]["manifests_removed"] == 0


def test_maintenance_zorder_cluster_mode(spark, tmp_path, capsys):
    store = str(tmp_path / "ztiers")
    rows = [
        (f"s{i:02d}", dtm.datetime(2024, 1, 1, h, 0, 0), float(i * 100 + h))
        for i in range(8)
        for h in range(8)
    ]
    pts = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    write_chunk_store(pts.filter(F.col("series_id") < "s04"), store,
                      mode="overwrite", n_buckets=1)
    write_chunk_store(pts.filter(F.col("series_id") >= "s04"), store,
                      mode="append", n_buckets=1)

    before = sorted(
        (r.series_id, r.ts, r.value) for r in read_points(spark, store).collect()
    )
    out = {o["pass"]: o for o in _run(
        capsys, ["--store", store, "--target-files", "2", "--cluster", "zorder"]
    )}
    assert out["compaction"]["partitions_rewritten"] >= 1
    after = sorted(
        (r.series_id, r.ts, r.value) for r in read_points(spark, store).collect()
    )
    assert after == before


def test_cluster_without_compaction_fails_fast(tmp_path):
    import pytest

    with pytest.raises(SystemExit):
        main(["--store", str(tmp_path), "--cluster", "zorder"])
