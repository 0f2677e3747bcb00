"""Out-of-order merge into the committed chunk store.

north_rule: late-arriving rows (warc_ts older than already-committed
chunks) must not force a recompute of the whole store — only the chunks
they touch are re-opened.  Dataflow:

1. late batch -> distinct (series_id, chunk_start) keys (tiny),
2. broadcast-semi-join those keys against the store scan so only the
   affected chunk rows are decoded (everything else is untouched on disk),
3. decoded old points UNION late points -> re-encode those chunks,
4. dynamic-partition overwrite of ONLY the (chunk_date, bucket)
   partitions those chunks live in (bucket = hash(series) % n_buckets,
   the store's write layout) — repair write volume is proportional to
   touched bucket-days, not whole days.  With Iceberg this would be a
   MERGE/RewriteFiles commit at file grain; the bucketed dynamic
   overwrite is the plain-parquet equivalent.

Equivalence contract (tested): merge(store, late) == encode(all points at
once), bit-for-bit on blobs after decode; rewrite proportionality is
asserted by tests/test_chunkstore.py (untouched partition directories
keep byte-identical files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.chunkstore import (
    bucket_expr,
    decode_chunks,
    encode_chunks,
    read_store_meta,
)


def chunk_key(ts_col, chunk_seconds: int):
    return (F.floor(F.unix_timestamp(ts_col) / chunk_seconds) * chunk_seconds).cast(
        "long"
    )


# Above this many touched partition keys the repair falls back to an
# unpruned scan: the OR-of-equalities predicate would bloat the plan, and
# a late batch touching that many bucket-days is a backfill, not a repair.
MAX_PRUNE_KEYS = 10_000
# Above this many keys the predicate degrades from exact OR-of-ANDs to
# the isin×isin superset (still pruned, slightly over-selected).
MAX_EXACT_KEYS = 1_024


def pruned_store_scan(
    spark: SparkSession,
    store_path: str,
    affected: DataFrame,
    n_buckets: int | None,
) -> DataFrame:
    """Store scan restricted to the partitions a late batch can touch.

    The locating semi-join keys (series_id, chunk_start) are NOT the
    store's partition columns, so the join alone reads every chunk row in
    the store (column-pruned but not partition-pruned).  Deriving the
    (chunk_date, bucket) predicate from the late batch FIRST turns the
    locating read into a partition-pruned scan — repair read volume
    becomes proportional to touched bucket-days, matching the write side.
    """
    store = spark.read.parquet(store_path)
    if n_buckets is not None:
        keys = (
            affected.select(
                F.to_date(F.timestamp_seconds("chunk_start")).alias("chunk_date"),
                bucket_expr(F.col("series_id"), n_buckets).alias("bucket"),
            )
            .distinct()
            .limit(MAX_PRUNE_KEYS + 1)
            .collect()
        )
        if len(keys) > MAX_PRUNE_KEYS:
            return store  # backfill-sized batch: pruning predicate not worth it
        if len(keys) <= MAX_EXACT_KEYS:
            pred = F.lit(False)
            for r in keys:
                pred = pred | (
                    (F.col("chunk_date") == F.lit(r.chunk_date))
                    & (F.col("bucket") == F.lit(r.bucket))
                )
        else:
            pred = F.col("chunk_date").isin([r.chunk_date for r in keys]) & F.col(
                "bucket"
            ).isin([r.bucket for r in keys])
        return store.filter(pred)
    # legacy layout: prune on chunk_date if the store carries it as a
    # partition column, else push a min/max-stats filter on chunk_start
    dates = [
        r.d
        for r in affected.select(
            F.to_date(F.timestamp_seconds("chunk_start")).alias("d")
        )
        .distinct()
        .limit(MAX_PRUNE_KEYS + 1)
        .collect()
    ]
    if len(dates) > MAX_PRUNE_KEYS:
        return store
    if "chunk_date" in store.columns:
        return store.filter(F.col("chunk_date").isin(dates))
    return store.filter(
        F.to_date(F.timestamp_seconds("chunk_start")).isin(dates)
    )


def merge_out_of_order(
    spark: SparkSession,
    store_path: str,
    late_points: DataFrame,
    chunk_seconds: int = 3600,
) -> None:
    """Merge a late batch into an existing chunk store in place.

    Uses a temp-dir staging write for the repaired chunks, then selective
    overwrite of affected partitions only.  De-duplicates exact duplicate
    (series, ts, value) rows between late data and committed data, keeping
    one copy (idempotent re-delivery).
    """
    late = late_points.select(
        F.col("series_id").cast("string").alias("series_id"),
        "ts",
        F.col("value").cast("double").alias("value"),
    )
    affected = (
        late.select(
            "series_id", chunk_key(F.col("ts"), chunk_seconds).alias("chunk_start")
        )
        .distinct()
    )
    meta = read_store_meta(store_path)
    n_buckets = meta.get("n_buckets")
    # partition-pruned locating scan (see pruned_store_scan), then decode
    # only affected chunks; broadcast the (small) key set
    store = pruned_store_scan(spark, store_path, affected, n_buckets)
    touched = store.join(
        F.broadcast(affected), on=["series_id", "chunk_start"], how="left_semi"
    )
    old_points = decode_chunks(touched)
    merged_points = old_points.unionByName(late).dropDuplicates(
        ["series_id", "ts", "value"]
    )
    repaired = encode_chunks(merged_points, chunk_seconds).withColumn(
        "chunk_date", F.to_date(F.timestamp_seconds(F.col("chunk_start")))
    )
    if n_buckets is None:
        # legacy layout (partitioned by chunk_date only): rewrite whole
        # affected dates
        part_cols = ["chunk_date"]
        store_p = store.withColumn(
            "chunk_date", F.to_date(F.timestamp_seconds(F.col("chunk_start")))
        )
    else:
        part_cols = ["chunk_date", "bucket"]
        repaired = repaired.withColumn(
            "bucket", bucket_expr(F.col("series_id"), n_buckets)
        )
        store_p = store  # bucketed stores carry chunk_date+bucket columns
    # keep the untouched chunks that share a partition with a repaired
    # chunk, plus the repaired chunks; dynamic overwrite swaps ONLY those
    # partitions — everything else is never read or written.
    untouched_same_parts = store_p.join(
        F.broadcast(repaired.select(*part_cols).distinct()), part_cols, "left_semi"
    ).join(F.broadcast(affected), ["series_id", "chunk_start"], "left_anti")
    out = untouched_same_parts.select(repaired.columns).unionByName(repaired)
    out = out.cache()
    out.count()  # materialize before overwriting source partitions
    (
        out.write.mode("overwrite")
        .partitionBy(*part_cols)
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )
    out.unpersist()
