"""URL canonicalization rules against hand-written expected forms."""

from pyspark.sql import functions as F

from afspark.operators.urlnorm import canonicalize_url

CASES = [
    # (input, canonical)
    ("http://www.Ex.COM/p/1", "http://ex.com/p/1"),
    ("HTTP://EX.com:80/p/1", "http://ex.com/p/1"),
    ("https://ex.com:443/p/1", "https://ex.com/p/1"),
    ("https://ex.com:8443/p/1", "https://ex.com:8443/p/1"),  # non-default kept
    ("http://ex.com", "http://ex.com/"),  # empty path -> /
    ("http://ex.com///", "http://ex.com/"),
    ("http://ex.com/a/b///", "http://ex.com/a/b"),
    ("http://ex.com/P/Q", "http://ex.com/P/Q"),  # path case preserved
    ("http://ex.com/p#frag", "http://ex.com/p"),
    ("http://ex.com/p?utm_source=x&utm_medium=y", "http://ex.com/p"),
    ("http://ex.com/p?b=2&a=1&fbclid=z", "http://ex.com/p?a=1&b=2"),
    ("http://ex.com/p?&&a=1", "http://ex.com/p?a=1"),  # empty pairs dropped
    ("http://www.ex.com/p/?gclid=g#f", "http://ex.com/p"),
]


def test_canonicalize_url_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = (
        df.select("url", canonicalize_url(F.col("url")).alias("c"))
        .toPandas()
        .set_index("url")["c"]
        .to_dict()
    )
    for u, want in CASES:
        assert got[u] == want, (u, got[u], want)


def test_canonical_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(
        F.col("c").alias("a"), canonicalize_url(F.col("c")).alias("b")
    ).collect()
    for r in twice:
        assert r.a == r.b
