"""Production corpus-build job — the webtext deployment twin of
jobs/rollup_job.py: documents -> quality gate -> exact dedup ->
benchmark decontamination -> temperature mixture sample, RESUMABLE.

Run it the way the north_rule says (any Spark cluster):

    PYFILES=$(python -c "from afspark.session import package_zip; print(package_zip())")
    spark-submit --py-files "$PYFILES" jobs/corpus_job.py \\
        --docs /data/documents.parquet --benchmark /data/eval.parquet \\
        --out /data/corpus --checkpoint /data/corpus_ckpt \\
        --units 256 --token-budget 1000000000

Resume-unit design: units are TEXT-HASH shards (md5 of the document
text, mod --units), not row ranges — every copy of a duplicated text
lands in the same shard, so exact dedup inside a shard is globally
complete with no cross-unit coordination, and a killed job redoes only
the shard in flight (the write + CheckpointLog row form an idempotent
pair, exactly rollup_job's contract).  Quality gating and
decontamination are per-doc (stateless), so they ride inside the same
shard pass; the benchmark gram set is eval-suite-sized and built once,
broadcast into every unit.  The mixture stage is one final unit: it
needs the GLOBAL per-source token mass (a sources-sized aggregate of
the committed kept-store — cheap), then the rate-based sample is again
a stateless map over the kept-store (operators/text.py
mixture_sample: no shuffle, no prefix-sum skew).

At 100 TB: shard count scales with the corpus (--units ~ corpus_bytes /
executor-comfortable-bytes); each shard pass reads only its hash slice
(one scan total across all units per run — resume re-reads only
uncommitted slices), and no stage ever materializes an unbounded
per-key state.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from afspark.operators.dedup import exact_dedup  # noqa: E402
from afspark.operators.text import (  # noqa: E402
    decontaminate,
    mixture_sample,
    quality_features,
    source_mixture_weights,
)
from afspark.streaming.checkpoint import CheckpointLog, run_resumable  # noqa: E402


def _text_shard(text_col: str, n_units: int):
    """Shard id from the TEXT hash: all copies of a text share a shard,
    so per-shard exact dedup is globally complete."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 8), 16, 10).cast("long"),
        F.lit(n_units),
    )


def build_kept_unit(
    docs: DataFrame,
    unit: int,
    n_units: int,
    benchmark: DataFrame | None,
    min_quality: float,
    ngram: int,
) -> DataFrame:
    """One shard's kept documents: gate -> dedup -> decontaminate."""
    shard = docs.filter(_text_shard("text", n_units) == unit)
    gate = (
        quality_features(shard)
        .filter(F.col("quality") >= min_quality)
        .select("doc_id")
    )
    kept = exact_dedup(shard.join(gate, "doc_id"))
    if benchmark is not None:
        flags = decontaminate(kept, benchmark, n=ngram)
        kept = kept.join(
            flags.filter(F.col("n_contaminated") == 0).select("doc_id"), "doc_id"
        )
    return kept


def mixture_stage(
    kept: DataFrame, alpha: float, token_budget: int
) -> tuple[DataFrame, DataFrame]:
    """(per-source manifest, per-doc sample) from the committed kept-store."""
    pieces = F.regexp_extract_all(
        F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    w = source_mixture_weights(kept, alpha=alpha, token_budget=token_budget)
    w6 = w.withColumn("rate", F.floor(F.col("rate") * 1e6 + F.lit(0.5)) / 1e6)
    sample = mixture_sample(
        kept.select("doc_id", "source", F.size(pieces).alias("nt")), w6
    )
    manifest = (
        sample.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("n_copies").cast("long").alias("n_rows_emitted"),
            F.sum(F.col("n_copies") * F.col("nt")).cast("long").alias(
                "tokens_emitted"
            ),
        )
        .join(w6.select("source", "n_docs", "n_tokens", "rate"), "source")
    )
    return manifest, sample.select("doc_id", "source", "n_copies")


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", required=True, help="parquet of documents")
    ap.add_argument("--benchmark", help="parquet of (bench_id, text) eval examples")
    ap.add_argument("--out", required=True, help="corpus store root directory")
    ap.add_argument("--checkpoint", required=True, help="lineage+metrics log dir")
    ap.add_argument("--units", type=int, default=64, help="text-hash shard count")
    ap.add_argument("--min-quality", type=float, default=0.6)
    ap.add_argument("--ngram", type=int, default=13, help="decontamination gram")
    ap.add_argument("--alpha", type=float, default=0.5, help="mixture temperature")
    ap.add_argument("--token-budget", type=int, default=None)
    args = ap.parse_args(argv)
    if args.units < 1:
        raise SystemExit("--units must be >= 1")

    from afspark.session import get_session

    spark: SparkSession = get_session(app_name="afspark-corpus-job")
    docs = spark.read.parquet(args.docs)
    bench = spark.read.parquet(args.benchmark) if args.benchmark else None
    log = CheckpointLog(spark, args.checkpoint)

    stats = run_resumable(
        spark,
        stage="kept",
        partition_keys=[f"u{u:06d}" for u in range(args.units)],
        process_fn=lambda key: build_kept_unit(
            docs, int(key[1:]), args.units, bench, args.min_quality, args.ngram
        ),
        out_path=f"{args.out}/kept",
        log=log,
    )
    print(f"kept: {len(stats['processed'])} units processed, "
          f"{len(stats['skipped'])} skipped (resume)")

    if args.token_budget is not None:
        kept = spark.read.parquet(f"{args.out}/kept")
        for name, frame in zip(
            ("manifest", "sample"),
            mixture_stage(kept, args.alpha, args.token_budget),
        ):
            s = run_resumable(
                spark,
                stage=name,
                partition_keys=["all"],
                process_fn=lambda _k, f=frame: f,
                out_path=f"{args.out}/{name}",
                log=log,
            )
            print(f"{name}: processed={s['processed']} skipped={s['skipped']}")

    log.metrics().orderBy("committed_at").show(50, truncate=False)


if __name__ == "__main__":
    main()
