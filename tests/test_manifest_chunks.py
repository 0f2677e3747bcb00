"""End-to-end: Gorilla chunk store ON the manifest snapshot store.

The full production write path composed — points -> encode_chunks
(Gorilla XOR + delta-of-delta blobs) -> manifest commit partitioned by
chunk_date -> a LATE batch repairs only its touched dates via a
snapshot overwrite -> decode of the latest snapshot is byte-identical
to a clean recompute over all points, while a reader pinned to the
pre-repair snapshot still decodes the old state.  This is the Iceberg
MERGE-INTO OoO story on plain parquet.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from afspark.sources.chunkstore import decode_chunks, encode_chunks
from afspark.sources.manifest import (
    commit_append,
    commit_overwrite_partitions,
    read_snapshot,
)

UTC = dt.timezone.utc


def _points(spark, rows):
    return spark.createDataFrame(
        rows, "series_id string, ts timestamp, value double"
    )


def _decoded(spark, store, snapshot_id=None):
    chunks = read_snapshot(spark, store, snapshot_id=snapshot_id).drop(
        "chunk_date"
    )
    return {
        (r.series_id, r.ts, r.value)
        for r in decode_chunks(chunks).collect()
    }


def test_chunk_store_snapshot_repair_roundtrip(spark, tmpdir):
    store = str(tmpdir.join("chunks"))
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    on_time = [
        ("s", t0 + dt.timedelta(hours=h, minutes=m), float(h * 100 + m))
        for h in range(48)  # two days
        for m in (0, 17, 41)
    ]
    late = [  # lands inside day 1 only
        ("s", t0 + dt.timedelta(hours=5, minutes=29), 7.25),
        ("s", t0 + dt.timedelta(hours=9, minutes=3), -1.5),
    ]

    def encoded(points):
        c = encode_chunks(points, chunk_seconds=86_400)
        return c.withColumn(
            "chunk_date",
            F.to_date(F.timestamp_seconds("chunk_start")).cast("string"),
        )

    s1 = commit_append(spark, encoded(_points(spark, on_time)), store,
                       ["chunk_date"])

    # OoO repair: recompute ONLY the chunk dates the late batch touches
    allp = _points(spark, on_time + late)
    touched = ["2024-01-01"]
    repaired = encoded(
        allp.filter(F.to_date("ts").cast("string").isin(touched))
    )
    assert set(
        r.chunk_date for r in repaired.select("chunk_date").distinct().collect()
    ) == set(touched)
    commit_overwrite_partitions(spark, repaired, store, ["chunk_date"])

    # latest snapshot decodes byte-identically to a clean full recompute
    clean = {
        (r.series_id, r.ts, r.value)
        for r in decode_chunks(
            encode_chunks(allp, chunk_seconds=86_400)
        ).collect()
    }
    assert _decoded(spark, store) == clean
    assert len(clean) == len(on_time) + len(late)

    # a reader pinned pre-repair still sees exactly the on-time state
    assert _decoded(spark, store, snapshot_id=s1) == {
        (r.series_id, r.ts, r.value)
        for r in decode_chunks(
            encode_chunks(_points(spark, on_time), chunk_seconds=86_400)
        ).collect()
    }


def test_repair_is_idempotent(spark, tmpdir):
    """Re-applying the same repair produces the same decoded state."""
    store = str(tmpdir.join("chunks"))
    t0 = dt.datetime(2024, 1, 1, tzinfo=UTC)
    pts = _points(
        spark,
        [("s", t0 + dt.timedelta(minutes=i * 7), float(i)) for i in range(40)],
    )
    enc = encode_chunks(pts, chunk_seconds=3600).withColumn(
        "chunk_date",
        F.to_date(F.timestamp_seconds("chunk_start")).cast("string"),
    )
    commit_append(spark, enc, store, ["chunk_date"])
    before = _decoded(spark, store)
    commit_overwrite_partitions(spark, enc, store, ["chunk_date"])
    commit_overwrite_partitions(spark, enc, store, ["chunk_date"])
    assert _decoded(spark, store) == before
