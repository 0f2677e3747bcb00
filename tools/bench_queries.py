"""Per-query isolation bench + plan capture for the optimization rounds.

Times each bench.py query in isolation (same action as bench.py so the
numbers are comparable), optionally dumps .explain("formatted") to a
directory, and can run a noop-sink variant (guide §1.4) so the
computation is timed without the count()'s column pruning.

This file is SEPARATE from the frozen bench.py (driver contract);
numbers here feed OPTIMIZATION_r06.md only.

Usage:
  python tools/bench_queries.py [--queries q_a,q_b] [--plans plans/r06 --suffix before]
                                [--reps 2] [--noop] [--headline-breakdown]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from afspark.functions import kernels as K  # noqa: E402
from afspark.operators.gapfill import gapfill  # noqa: E402
from afspark.operators.rollup import (  # noqa: E402
    TIERS,
    rollup_points,
    score_pages_to_tiers,
)
from afspark.operators.windows import energy_agg, spl_agg, tumbling_agg  # noqa: E402
from afspark.operators import dedup  # noqa: E402
from afspark.session import get_session  # noqa: E402
from afspark.sources.chunkstore import encode_chunks  # noqa: E402
from afspark.sources.pages import (  # noqa: E402
    derive_samples,
    generate_pages,
    with_series_offsets,
)

WINLEN = 1024
NOVERLAP = 512
FEATURES = [
    K.Energy(),
    K.SoundPressureLevel(),
    K.ZeroCrossingRate(),
    K.PermutationEntropy(4),
    K.SpectralCentroid(),
]


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--plans", default="")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--headline-breakdown", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[1])
    n_pages = int(os.environ.get("AFSPARK_BENCH_PAGES", max(2000, int(200_000 * sf))))
    spark = get_session(app_name="afspark-bench-queries")
    sc = spark.sparkContext

    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.col("user_id").cast("string").alias("series_id"), "ts", "value"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pages = generate_pages(spark, n_pages).persist()
    pages.count()
    offs = with_series_offsets(pages).persist()
    offs.count()
    samples = derive_samples(pages).persist()
    samples.count()

    def q_score_rollup_fused():
        tiers = score_pages_to_tiers(offs, FEATURES, WINLEN, NOVERLAP, fs=1000.0)
        int(tiers["1m"].agg(F.sum("cnt")).first()[0])
        for name, df in tiers.items():
            df.count()
        for df in tiers.values():
            df.unpersist()
        return None

    def q_derive_samples():
        samples.unpersist(blocking=True)
        samples.persist()
        samples.count()
        return None

    def q_energy_catalyst_tumbling():
        return tumbling_agg(
            samples,
            WINLEN,
            {"energy": energy_agg(F.col("value")), "spl": spl_agg(F.col("value"))},
        )

    def q_gapfill_linear_1h():
        return gapfill(rollup_points(events, TIERS["1h"]), TIERS["1h"], method="linear")

    def q_chunk_encode():
        chunks = encode_chunks(events, chunk_seconds=86_400)
        chunks.agg(F.sum("n")).collect()
        return None

    def q_minhash_lsh_dedup():
        return dedup.minhash_lsh_dedup_pairs(docs, threshold=0.7)

    def q_simhash64():
        return dedup.simhash64(docs)

    def q_m4_downsample_1h():
        from afspark.operators.lttb import m4_downsample

        return m4_downsample(
            events.withColumn(
                "seq",
                F.row_number()
                .over(Window.partitionBy("series_id").orderBy("ts", "value"))
                .cast("long"),
            ),
            3600,
        )

    def q_bm25_topk():
        from afspark.operators.retrieval import bm25_topk

        return bm25_topk(docs, ["merge", "spark", "window"], k=100)

    def q_hdr_percentile_1h():
        from afspark.operators.hdrsketch import hdr_quantile, hdr_rollup

        cents = events.withColumn("value", F.floor(F.col("value") * 100 + 0.5))
        return hdr_quantile(hdr_rollup(cents, 3600), 99, 100)

    def q_sdt_downsample():
        from afspark.operators.sdt import sdt_downsample

        seqd = events.withColumn(
            "seq",
            F.row_number()
            .over(Window.partitionBy("series_id").orderBy("ts", "value"))
            .cast("long"),
        ).withColumn("value", F.floor(F.col("value") * 100 + 0.5))
        return sdt_downsample(seqd, dev=2000.0, order_col="seq")

    def q_matrix_profile_1h():
        from afspark.operators.matrixprofile import matrix_profile_discord

        return matrix_profile_discord(events, 3600, 24)

    def q_pagerank_3it():
        from afspark.operators.linkgraph import derive_links, pagerank_fixed

        return pagerank_fixed(docs, derive_links(docs), n_iter=3)

    def q_remove_dup_spans():
        from afspark.operators.text import remove_duplicate_spans

        remove_duplicate_spans(docs).agg(F.sum("n_tokens_removed")).collect()
        return None

    def q_corpus_manifest():
        from afspark.entry_queries import q_training_corpus_manifest

        return q_training_corpus_manifest(spark, sf_dir)

    # plan-capture builders for the queries whose timed form returns no
    # DataFrame (the .explain target is their core frame)
    def plan_score_rollup_fused():
        return score_pages_to_tiers(offs, FEATURES, WINLEN, NOVERLAP, fs=1000.0)["1m"]

    def plan_derive_samples():
        return derive_samples(pages)

    def plan_chunk_encode():
        return encode_chunks(events, chunk_seconds=86_400)

    def plan_remove_dup_spans():
        from afspark.operators.text import remove_duplicate_spans

        return remove_duplicate_spans(docs)

    def plan_minhash_lsh_dedup():
        return dedup.minhash_lsh_dedup_pairs(docs, threshold=0.7)

    plan_builders = {
        "q_score_rollup_fused": plan_score_rollup_fused,
        "q_derive_samples": plan_derive_samples,
        "q_chunk_encode": plan_chunk_encode,
        "q_remove_dup_spans": plan_remove_dup_spans,
        "q_minhash_lsh_dedup": plan_minhash_lsh_dedup,
    }
    if args.plans:
        # operators localCheckpoint intermediates/results (lifecycle),
        # which collapses a captured plan to an ExistingRDD scan; bypass
        # checkpoints during plan dumps ONLY so the full chain is
        # visible (no timing is taken from this path)
        _DF = type(docs)  # the runtime (classic) DataFrame class

        orig = _DF.localCheckpoint
        _DF.localCheckpoint = lambda self, eager=True: self
        try:
            os.makedirs(args.plans, exist_ok=True)
            for name, builder in plan_builders.items():
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan_of(builder()))
        finally:
            _DF.localCheckpoint = orig

    queries = {
        "q_score_rollup_fused": q_score_rollup_fused,
        "q_derive_samples": q_derive_samples,
        "q_energy_catalyst_tumbling": q_energy_catalyst_tumbling,
        "q_gapfill_linear_1h": q_gapfill_linear_1h,
        "q_chunk_encode": q_chunk_encode,
        "q_minhash_lsh_dedup": q_minhash_lsh_dedup,
        "q_simhash64": q_simhash64,
        "q_m4_downsample_1h": q_m4_downsample_1h,
        "q_bm25_topk": q_bm25_topk,
        "q_hdr_percentile_1h": q_hdr_percentile_1h,
        "q_sdt_downsample": q_sdt_downsample,
        "q_matrix_profile_1h": q_matrix_profile_1h,
        "q_pagerank_3it": q_pagerank_3it,
        "q_remove_dup_spans": q_remove_dup_spans,
        "q_corpus_manifest": q_corpus_manifest,
    }
    wanted = [q.strip() for q in args.queries.split(",") if q.strip()] or list(queries)
    if args.queries.strip() == "none":
        wanted = []

    if args.headline_breakdown:
        from afspark.operators.rollup import rollup_all_tiers, scores_to_points
        from afspark.operators.score import score_pages

        for label, builder in [
            ("scored_noop", lambda: score_pages(offs, FEATURES, WINLEN, NOVERLAP, fs=1000.0)),
            (
                "points_noop",
                lambda: scores_to_points(
                    score_pages(offs, FEATURES, WINLEN, NOVERLAP, fs=1000.0), 1000.0
                ),
            ),
            (
                "tier1m_noop",
                lambda: rollup_points(
                    scores_to_points(
                        score_pages(offs, FEATURES, WINLEN, NOVERLAP, fs=1000.0), 1000.0
                    ),
                    60,
                ),
            ),
        ]:
            for _ in range(args.reps):
                df = builder()
                sc.setJobDescription(f"breakdown:{label}")
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                print(json.dumps({"phase": label, "sec": round(time.time() - t0, 3)}))
        sc.setJobDescription(None)

    results: dict[str, list[float]] = {}
    for name in wanted:
        fn = queries[name]
        for rep in range(args.reps):
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn()
            if df is not None:
                if args.noop:
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
            results.setdefault(name, []).append(round(time.time() - t0, 3))
        if args.plans:
            df = fn()
            if df is not None:
                os.makedirs(args.plans, exist_ok=True)
                with open(
                    os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
                ) as fh:
                    fh.write(plan_of(df))
        sc.setJobDescription(None)
        print(json.dumps({name: results[name], "min": min(results[name])}))

    print(json.dumps({"all": {k: min(v) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
