"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementations live in afspark/entry_queries.py; SQL-inexpressible
kernel operators (spectral/ordinal kernels, codecs) have no oracle
entry and are bit-exactness-tested against local numpy twins in
tests/ instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from afspark.entry_queries import QUERIES, entry as _entry  # noqa: E402
from afspark.session import package_zip  # noqa: E402


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the afspark package to this session's Python workers.

    The driver hands us an externally-created SparkSession whose workers
    may not have /root/repo on their path; pandas-UDF closures reference
    afspark modules by name, so add the package zip to the live context
    (idempotent; addPyFile de-dups by filename)."""
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:  # noqa: BLE001 — already added / restricted context
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _ensure_shipped(spark)
    return _entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_shipped(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, (fn, _) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every SQL-expressible query."""
    return {name: sql for name, (_, sql) in QUERIES.items() if sql is not None}
