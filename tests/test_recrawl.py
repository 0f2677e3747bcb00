"""Recrawl change detection: lag semantics, threshold, tier chaining."""

import datetime as dt

from pyspark.sql import functions as F

from afspark.operators.recrawl import change_rate, recrawl_deltas

UTC = dt.timezone.utc


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1 + day, tzinfo=UTC)


def test_deltas_and_threshold(spark):
    rows = [
        # url a: 0b0000 -> 0b0001 (ham 1, minor) -> 0b1111 (ham 3) -> 0b11110000 (ham 8, changed)
        ("a", _ts(0), 0b0000),
        ("a", _ts(1), 0b0001),
        ("a", _ts(2), 0b1111),
        ("a", _ts(3), 0b11110000),
        # url b: single crawl -> no pair
        ("b", _ts(1), 0b1010),
    ]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, simhash long")
    d = recrawl_deltas(pages)
    got = {
        (r.url, r.warc_ts.day): r.hamming
        for r in d.collect()
    }
    assert got[("a", 1)] is None and got[("b", 2)] is None
    assert got[("a", 2)] == 1
    assert got[("a", 3)] == 3
    assert got[("a", 4)] == 8

    cr = change_rate(
        d.withColumn("domain", F.lit("d")), 30 * 86400, keys=["domain"]
    ).collect()
    assert len(cr) == 1
    r = cr[0]
    assert (r.pairs, r.changed, r.sum_hamming) == (3, 1, 12)


def test_change_rate_chains_to_coarser_tier(spark):
    rows = [("u", _ts(d), d * 3) for d in range(6)]
    pages = spark.createDataFrame(rows, "url string, warc_ts timestamp, simhash long")
    d = recrawl_deltas(pages).withColumn("domain", F.lit("x"))
    fine = change_rate(d, 86400, keys=["domain"])
    # re-aggregating the fine tier == computing the coarse tier directly
    coarse_direct = change_rate(d, 30 * 86400, keys=["domain"]).collect()[0]
    re_agg = (
        fine.groupBy("domain")
        .agg(
            F.sum("pairs").alias("pairs"),
            F.sum("changed").alias("changed"),
            F.sum("sum_hamming").alias("sum_hamming"),
        )
        .collect()[0]
    )
    assert (re_agg.pairs, re_agg.changed, re_agg.sum_hamming) == (
        coarse_direct.pairs,
        coarse_direct.changed,
        coarse_direct.sum_hamming,
    )
