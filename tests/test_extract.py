"""HTML->text extraction: byte identity over the real generated pages
table (binary html column), including angle-bracket-bearing text."""

from pyspark.sql import functions as F

from afspark.operators.extract import extract_text, verify_text_invariant
from afspark.sources.pages import generate_pages


def test_invariant_on_generated_pages(spark):
    pages = generate_pages(spark, 300, n_domains=10, num_partitions=4)
    audit = verify_text_invariant(pages, keys=["lang"]).collect()
    assert audit
    for r in audit:
        assert r.n_rows == r.n_identical, r
        assert r.ext_bytes == r.txt_bytes, r


def test_angle_brackets_in_text_survive(spark):
    tricky = "a <b> c </html> d </b>"
    df = spark.createDataFrame(
        [(f"<html>{tricky}</html>".encode(), tricky)], "html binary, text string"
    )
    row = extract_text(df).collect()[0]
    assert row.extracted == tricky


def test_mismatch_is_reported_not_hidden(spark):
    df = spark.createDataFrame(
        [
            ("u1", "<html>good</html>".encode(), "good"),
            ("u2", "<html>draft</html>".encode(), "final"),
        ],
        "url string, html binary, text string",
    )
    got = {r.url: r for r in verify_text_invariant(df).collect()}
    assert got["u1"].n_identical == 1
    assert got["u2"].n_identical == 0
