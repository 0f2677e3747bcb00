"""A/B the two round-3 bench regressions at matched host health.

Round-2 -> round-3 BENCH deltas flagged by the judge:
  q_chunk_encode     2.358 -> 3.824 s  (+62%)  suspect: encode repartition x4
  q_derive_samples   2.776 -> 3.983 s  (+43%)  no code change named

Both are shuffle/Arrow-heavy, i.e. dominated by cold-page-fault
bandwidth on this snapshot-restored sandbox.  This harness removes the
host-noise confound the round-3 single-probe bench could not: it
INTERLEAVES the variants (factor 1/2/4 for encode; derive repeated) for
R rounds with a cold-fault probe before every measurement, then reports
per-variant minima plus the probe range, so a variant comparison is
only believed when its probes overlap.

Usage: python tools/ab_regressions.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from afspark.session import get_session  # noqa: E402
from afspark.sources import chunkstore  # noqa: E402
from afspark.sources.pages import derive_samples, generate_pages  # noqa: E402
from bench import host_memory_health, sf_of  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf = sf_of(sf_dir)
    n_pages = max(2000, int(200_000 * sf))
    spark = get_session(app_name="afspark-ab")

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    events.count()  # warm the parquet cache outside every timed window
    pages = generate_pages(spark, n_pages).persist()
    pages.count()

    results: dict[str, list[dict]] = {}

    def run(name: str, fn) -> None:
        probe = host_memory_health()
        t0 = time.time()
        fn()
        dt = round(time.time() - t0, 3)
        results.setdefault(name, []).append(
            {"sec": dt, "cold_fault_mbps": probe["cold_fault_mbps"]}
        )
        print(f"  {name}: {dt}s  (probe {probe['cold_fault_mbps']} MB/s)")

    def encode_with_factor(factor: int):
        def _go():
            par = spark.sparkContext.defaultParallelism
            chunks = chunkstore.encode_chunks(
                events, chunk_seconds=86_400, n_partitions=par * factor
            )
            chunks.agg(F.sum("n")).collect()

        return _go

    def derive():
        s = derive_samples(pages).persist()
        s.count()
        s.unpersist(blocking=True)

    for r in range(rounds):
        print(f"round {r + 1}/{rounds}")
        run("encode_x1", encode_with_factor(1))
        run("encode_x2", encode_with_factor(2))
        run("encode_x4", encode_with_factor(4))
        run("derive_samples", derive)

    summary = {
        name: {
            "min_sec": min(x["sec"] for x in xs),
            "med_sec": sorted(x["sec"] for x in xs)[len(xs) // 2],
            "probes_mbps": [x["cold_fault_mbps"] for x in xs],
        }
        for name, xs in results.items()
    }
    print(json.dumps({"sf": sf, "summary": summary}, indent=2))


if __name__ == "__main__":
    main()
