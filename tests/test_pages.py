"""Pages generator determinism + text->samples invariants."""

import numpy as np
from pyspark.sql import functions as F

from afspark.functions import kernels as K
from afspark.operators.score import score
from afspark.sources.pages import derive_samples, derive_samples_sql, generate_pages


def test_pages_deterministic_across_partitionings(spark):
    a = generate_pages(spark, 300, num_partitions=2).orderBy("url").collect()
    b = generate_pages(spark, 300, num_partitions=7).orderBy("url").collect()
    assert [r.url for r in a] == [r.url for r in b]
    assert [r.text for r in a] == [r.text for r in b]
    assert [r.warc_ts for r in a] == [r.warc_ts for r in b]


def test_pages_schema_and_skew(spark):
    pages = generate_pages(spark, 2000)
    assert dict(pages.dtypes) == {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    }
    counts = {
        r.series_id: r.n
        for r in pages.groupBy(
            F.parse_url("url", F.lit("HOST")).alias("series_id")
        ).agg(F.count("*").alias("n")).collect()
    }
    hot = counts["d000.example.com"]
    assert 0.2 < hot / 2000 < 0.4  # hot domain holds ~30%


def test_samples_roundtrip_text_byte_identity(spark):
    """Per-row invariant: text reconstructed from samples == original bytes."""
    pages = generate_pages(spark, 60)
    samples = derive_samples(pages)
    rows = samples.orderBy("series_id", "seq").collect()
    by_series = {}
    for r in rows:
        by_series.setdefault(r.series_id, []).append(r.value)
    page_rows = pages.collect()
    expected = {}
    for r in sorted(page_rows, key=lambda r: (r.warc_ts, r.url)):
        dom = r.url.split("/")[2]
        expected.setdefault(dom, b"")
        expected[dom] += r.text.encode()
    for dom, vals in by_series.items():
        rebuilt = bytes(int(round(v * 127.5 + 127.5)) for v in vals)
        assert rebuilt == expected[dom]


def test_samples_sql_twin_matches_arrow_path(spark):
    pages = generate_pages(spark, 40)
    a = derive_samples(pages).orderBy("series_id", "seq").collect()
    b = derive_samples_sql(pages).orderBy("series_id", "seq").collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert (ra.series_id, ra.seq) == (rb.series_id, rb.seq)
        assert ra.value == rb.value


def test_end_to_end_pages_to_scores(spark):
    """Flagship slice: pages -> samples -> windowed Energy == local numpy."""
    pages = generate_pages(spark, 120)
    samples = derive_samples(pages)
    got = {
        (r.series_id, r.win_start): r.value
        for r in score(samples, K.Energy(), winlen=512, noverlap=256).collect()
    }
    # local twin
    page_rows = sorted(pages.collect(), key=lambda r: (r.warc_ts, r.url))
    concat = {}
    for r in page_rows:
        dom = r.url.split("/")[2]
        concat.setdefault(dom, []).append(r.text.encode())
    n_checked = 0
    for dom, bufs in concat.items():
        x = (np.frombuffer(b"".join(bufs), dtype=np.uint8).astype(np.float64) - 127.5) / 127.5
        if len(x) < 512:
            continue
        starts, _, vals = K.score_local(K.Energy(), x, winlen=512, noverlap=256)
        for i, s in enumerate(starts):
            assert got[(dom, int(s))] == vals[i, 0]
            n_checked += 1
    assert n_checked > 50


def test_pages_table_layout_prunes(spark, tmp_path):
    """north_rule layout: days(warc_ts) x bucket(url_domain) partitioning."""
    from pyspark.sql import functions as F
    from afspark.sources.pages import read_pages_table, write_pages_table

    pages = generate_pages(spark, 400)
    path = str(tmp_path / "pages_tbl")
    write_pages_table(pages, path, n_buckets=8)
    back = read_pages_table(spark, path)
    assert back.count() == 400
    assert sorted(back.columns) == sorted(pages.columns)
    full = spark.read.parquet(path)
    total_files = full.select(F.input_file_name()).distinct().count()
    # day-scoped read prunes
    one_day = full.filter(F.col("day") == "2024-01-03")
    day_files = one_day.select(F.input_file_name()).distinct().count()
    assert 0 < day_files < total_files
    # domain-bucket-scoped read prunes
    one_bucket = full.filter(F.col("bucket") == 3)
    b_files = one_bucket.select(F.input_file_name()).distinct().count()
    assert 0 < b_files < total_files
    # byte identity through the layout
    a = {r.url: r.text for r in pages.collect()}
    b = {r.url: r.text for r in back.collect()}
    assert a == b
