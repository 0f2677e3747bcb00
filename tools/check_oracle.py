"""Self-check: run every QUERIES entry in Spark AND DuckDB and diff them.

Replicates the driver's CORRECTNESS gate locally (row count + schema +
order-insensitive values).  Usage:

    python tools/check_oracle.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_object_dtype(df[c]) or isinstance(
            df[c].dtype, pd.StringDtype
        ):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rowcount {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        # Dtype-strict: never silently coerce int<->float.  DuckDB returns
        # HUGEINT (e.g. un-cast window sums) as float64, which the driver's
        # value-hash treats as a mismatch against Spark's int64 — so must we.
        ak = "i" if av.dtype.kind in "iu" else av.dtype.kind
        bk = "i" if bv.dtype.kind in "iu" else bv.dtype.kind
        if ak != bk:
            return False, (
                f"col {c} dtype kind mismatch: spark={av.dtype} duck={bv.dtype}"
                " (cast the oracle SQL, e.g. ::BIGINT, to match)"
            )
        if ak == "f":
            ok = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            ok = av == bv
        if not np.all(ok):
            i = int(np.argmin(ok))
            return False, f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
    return True, "ok"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from afspark.entry_goldens import GOLDEN_SF, GOLDEN_SQL
    from afspark.entry_queries import QUERIES
    from afspark.session import get_session

    golden_ok = GOLDEN_SF in sf_dir.rstrip("/").split("/")[-1:]

    spark = get_session(shuffle_partitions=8)
    con = duck_connection(sf_dir)

    n_pass = n_fail = 0
    for name, (fn, sql) in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name in GOLDEN_SQL and not golden_ok:
            # VALUES-literal goldens are generated at GOLDEN_SF only
            print(f"ROWS {name}: {len(sdf)} rows (golden is {GOLDEN_SF}-only) "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        if sql is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            ddf = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok, msg = frames_equal(normalize(sdf), normalize(ddf))
        status = "PASS" if ok else "FAIL"
        print(f"{status} {name}: {len(sdf)} rows, {msg} [{time.time()-t0:.1f}s]")
        n_pass += ok
        n_fail += not ok
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
