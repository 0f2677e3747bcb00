"""A/B micro-bench for the r3 bench regressions (VERDICT r3 item 1).

q_chunk_encode (2.36 -> 3.82 s) and q_derive_samples (2.78 -> 3.98 s)
regressed between BENCH_r02 and BENCH_r03 even though neither code path
changed (git diff 89bebd6..9b1b117 touches only retention/compaction in
chunkstore.py; pages.py untouched).  Hypothesis: bench-ORDER artifact —
r3 added best-of-2 headline repeats before the secondary phases, doubling
heap pressure when these phases run — plus the documented host cold-fault
swings.  This script times ONLY the two phases, N reps each, in a fresh
session, with the host probe before every rep, so the phases are measured
without the headline's heap residue.

Usage: python tools/bench_ab.py [n_reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from afspark.session import get_session  # noqa: E402
from afspark.sources.chunkstore import encode_chunks  # noqa: E402
from afspark.sources.pages import derive_samples, generate_pages  # noqa: E402
from bench import host_memory_health, sf_of  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_of(sf_dir)
    n_pages = int(os.environ.get("AFSPARK_BENCH_PAGES", max(2000, int(200_000 * sf))))
    spark = get_session(app_name="afspark-bench-ab")

    pages = generate_pages(spark, n_pages).persist()
    pages.count()
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )

    out: dict = {"sf": sf, "reps": []}
    for _ in range(reps):
        rep: dict = {"host": host_memory_health()}
        t0 = time.time()
        s = derive_samples(pages)
        s.count()
        rep["q_derive_samples"] = round(time.time() - t0, 3)
        t0 = time.time()
        encode_chunks(events, chunk_seconds=86_400).agg(F.sum("n")).collect()
        rep["q_chunk_encode"] = round(time.time() - t0, 3)
        out["reps"].append(rep)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
