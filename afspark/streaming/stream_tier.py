"""Streaming-maintained tier store: foreachBatch + incremental refresh.

stream_rollup_1m (stream_rollup.py) is the pure watermarked-aggregation
twin, but it cannot carry order-dependent aggregates (first/last) and its
complete-mode state grows with the tier.  This module is the production
shape instead: each micro-batch runs BATCH code (foreachBatch), merging
the batch's partial aggregates into a persistent, date-partitioned tier
store with refresh_tier_incremental — full tier schema including
first/last, bounded state (the store is on disk, not in the stream), and
arbitrarily late data handled by the same algebra as the batch OoO path.

Exactly-once: foreachBatch may redeliver a batch after a failure; the
merge is NOT idempotent (counts would double), so applied batch ids are
recorded in the store (`_applied_batches.json`) and redeliveries are
skipped — the standard idempotent-sink recipe, tested with a forced
redelivery.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TIER_SCHEMA = (
    "series_id string, bucket_ts timestamp, cnt bigint, sum double, "
    "min double, max double, avg double, first double, last double, "
    "first_ts timestamp, last_ts timestamp"
)


def read_tier_store(spark: SparkSession, path: str) -> DataFrame:
    p = Path(path)
    if not any(p.glob("bucket_date=*")):
        return spark.createDataFrame([], TIER_SCHEMA + ", bucket_date date")
    return spark.read.schema(TIER_SCHEMA + ", bucket_date date").parquet(path)


def refresh_tier_store(
    spark: SparkSession,
    path: str,
    new_points: DataFrame,
    tier_seconds: int,
    keys: list[str] = ["series_id"],
) -> int:
    """Merge a batch of raw points into the date-partitioned tier store.

    Touched dates are derived from the batch (tiny collect of distinct
    bucket dates); the committed read is partition-pruned to those dates;
    the refreshed subset replaces exactly those partitions via dynamic
    overwrite.  Untouched date partitions are never read or written.
    Returns the number of touched date partitions.
    """
    from ..operators.rollup import bucket_ts, refresh_tier_incremental

    new_points = new_points.persist()
    try:
        dates = [
            r.d
            for r in new_points.select(
                F.to_date(bucket_ts(F.col("ts"), tier_seconds)).alias("d")
            )
            .distinct()
            .collect()
        ]
        if not dates:
            return 0
        committed = read_tier_store(spark, path).filter(
            F.col("bucket_date").isin(dates)
        ).drop("bucket_date")
        refreshed = refresh_tier_incremental(
            committed, new_points, tier_seconds, keys
        ).withColumn("bucket_date", F.to_date("bucket_ts"))
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                refreshed.repartition(max(1, len(dates)), "bucket_date")
                .write.mode("overwrite")
                .partitionBy("bucket_date")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        return len(dates)
    finally:
        new_points.unpersist()


def _applied_path(path: str) -> Path:
    return Path(path) / "_applied_batches.json"


def _applied_ids(path: str) -> set[int]:
    p = _applied_path(path)
    if not p.exists():
        return set()
    return set(json.loads(p.read_text()))


def apply_batch_once(
    spark: SparkSession,
    path: str,
    batch_df: DataFrame,
    batch_id: int,
    tier_seconds: int,
    keys: list[str] = ["series_id"],
) -> bool:
    """foreachBatch body: merge the batch unless its id was already
    applied (exactly-once under redelivery).  Returns True if applied."""
    applied = _applied_ids(path)
    if batch_id in applied:
        return False
    refresh_tier_store(spark, path, batch_df, tier_seconds, keys)
    applied.add(batch_id)
    _applied_path(path).write_text(json.dumps(sorted(applied)))
    return True


def stream_to_tier_store(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    store_path: str,
    tier_seconds: int = 3600,
    checkpoint_dir: str | None = None,
):
    """File-source stream -> incremental tier store via foreachBatch."""
    stream = spark.readStream.schema(schema).parquet(source_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        apply_batch_once(spark, store_path, batch_df, batch_id, tier_seconds)

    writer = stream.writeStream.foreachBatch(sink)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
