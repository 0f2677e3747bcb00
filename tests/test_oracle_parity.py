"""Driver-contract parity: every QUERIES entry vs its DuckDB oracle.

This is the same comparison the driver performs (row count + columns +
order-insensitive values); running it in CI keeps CORRECTNESS_r{N}.json
green by construction.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from afspark.entry_goldens import GOLDEN_SQL  # noqa: E402
from afspark.entry_queries import QUERIES  # noqa: E402
from tools.check_oracle import duck_connection, frames_equal, normalize  # noqa: E402

# VALUES-literal goldens are generated (tools/gen_goldens.py) at the
# driver's gate scale — they are only meaningful against that sf.
GOLDEN_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.fixture(scope="module")
def duck_golden():
    return duck_connection(GOLDEN_SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, duck, duck_golden, name):
    fn, sql = QUERIES[name]
    if name in GOLDEN_SQL:
        sf_dir, duck = GOLDEN_SF_DIR, duck_golden
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(sdf) > 0, f"{name}: kernel query returned no rows"
        return
    ddf = duck.sql(sql).df()
    ok, msg = frames_equal(normalize(sdf), normalize(ddf))
    assert ok, f"{name}: {msg}"
    assert len(sdf) > 0, f"{name}: empty result weakens the oracle"


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"series_id", "win_start", "feature", "value"}
    q = se.queries()
    o = se.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30
