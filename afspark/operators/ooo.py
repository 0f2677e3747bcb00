"""Out-of-order merge into the committed chunk store.

north_rule: late-arriving rows (warc_ts older than already-committed
chunks) must not force a recompute of the whole store — only the chunks
they touch are re-opened.  Dataflow:

1. late batch -> distinct (series_id, chunk_start) keys (tiny),
2. broadcast-semi-join those keys against the store scan so only the
   affected chunk rows are decoded (everything else is untouched on disk),
3. decoded old points UNION late points -> re-encode those chunks,
4. dynamic-partition/selective overwrite of just those chunk rows.

Equivalence contract (tested): merge(store, late) == encode(all points at
once), bit-for-bit on blobs after decode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.chunkstore import decode_chunks, encode_chunks


def chunk_key(ts_col, chunk_seconds: int):
    return (F.floor(F.unix_timestamp(ts_col) / chunk_seconds) * chunk_seconds).cast(
        "long"
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
    store = spark.read.parquet(store_path)
    # decode only affected chunks; broadcast the (small) key set
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
    # keep untouched chunks + repaired chunks; write staging then swap the
    # affected partitions.  (With Iceberg this is a MERGE/RewriteFiles
    # commit; on plain parquet we rewrite affected chunk_date partitions.)
    untouched_same_dates = (
        store.withColumn(
            "chunk_date", F.to_date(F.timestamp_seconds(F.col("chunk_start")))
        )
        .join(
            F.broadcast(repaired.select("chunk_date").distinct()),
            "chunk_date",
            "left_semi",
        )
        .join(F.broadcast(affected), ["series_id", "chunk_start"], "left_anti")
    )
    out = untouched_same_dates.select(repaired.columns).unionByName(repaired)
    out = out.cache()
    out.count()  # materialize before overwriting source partitions
    (
        out.write.mode("overwrite")
        .partitionBy("chunk_date")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(store_path)
    )
    out.unpersist()
