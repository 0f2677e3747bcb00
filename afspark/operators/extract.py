"""HTML -> text extraction with the byte-identity invariant.

The input contract (BASELINE.json input_hint) fixes the pages shape
``(url, warc_ts, html binary, text string, lang)`` and the per-row
invariant "byte-identical extracted text per url": whatever the engine
does, re-extracting text from the stored html bytes must reproduce the
``text`` column exactly.  This module is that extraction stage plus its
verifier.

The extractor matches the corpus's html shape (sources/pages.py wraps
text as ``<html>…</html>`` bytes — a stand-in for a real boilerplate
remover, which would be a vendored library call in production).  It is
a single Catalyst expression (decode + anchored regexp_extract), so the
stage is whole-stage-codegen'd, runs inside the scan, and adds no
shuffle; the verifier is a plain aggregate.  Swapping in a heavier
extractor later (e.g. a Pandas-UDF boilerplate pipeline) only changes
``extract_text`` — the invariant check and its driver-gate oracle stay.

The dotall ``(?s)`` anchored form strips exactly one wrapper pair and
nothing else — text containing literal ``<``/``>`` bytes (the synthetic
vocabulary does) survives untouched, which a naive ``<[^>]*>`` global
strip would corrupt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def extract_text(
    pages: DataFrame, html_col: str = "html", out_col: str = "extracted"
) -> DataFrame:
    """Decode html bytes and strip the document wrapper -> text."""
    decoded = F.decode(F.col(html_col), "UTF-8")
    return pages.withColumn(
        out_col, F.regexp_extract(decoded, r"(?s)^<html>(.*)</html>$", 1)
    )


def verify_text_invariant(
    pages: DataFrame,
    keys: list[str] = ["url"],
    html_col: str = "html",
    text_col: str = "text",
) -> DataFrame:
    """Per-key invariant audit: rows, rows whose re-extracted text is
    byte-identical to ``text_col``, and the byte volume compared.

    A healthy corpus has ``n_rows == n_identical`` everywhere; any
    mismatch row surfaces with its key for triage.  Byte identity is
    checked on the re-encoded bytes, not string equality alone, so
    encoding drift (lone surrogates, normalization) can't hide.
    """
    e = extract_text(pages, html_col=html_col, out_col="_ext")
    same = (
        F.col("_ext").isNotNull()
        & (F.encode(F.col("_ext"), "UTF-8") == F.encode(F.col(text_col), "UTF-8"))
    )
    return e.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(same.cast("long")).alias("n_identical"),
        F.sum(F.octet_length(F.encode(F.col("_ext"), "UTF-8"))).alias("ext_bytes"),
        F.sum(F.octet_length(F.encode(F.col(text_col), "UTF-8"))).alias("txt_bytes"),
    )
