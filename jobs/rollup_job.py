"""Production rollup job — the north_rule deployment contract, runnable.

Pages -> windowed kernel scores -> all retention tiers, written as a
date-partitionable tier store, RESUMABLE: the 1m stage is split into
sample-time units, each unit's completion is recorded with rows/timing/
fingerprint in the CheckpointLog (streaming/checkpoint.py), and a killed
or re-run job skips every committed unit — only the unit in flight at
the kill is redone (the data write + log row form an idempotent pair).

Run it the way the north_rule says (any Spark cluster):

    PYFILES=$(python -c "from afspark.session import package_zip; print(package_zip())")
    spark-submit --py-files "$PYFILES" jobs/rollup_job.py \\
        --pages /data/pages.parquet --out /data/tiers \\
        --checkpoint /data/tiers_ckpt --unit-seconds 86400

or locally against the synthetic generator: ``--synth 20000``.

Unit correctness: unit k owns the windows whose timestamp falls in
[origin + k*U, origin + (k+1)*U) seconds — with U a multiple of the 1m
bucket width and a minute-aligned origin (both asserted), every 1m
bucket lies entirely inside one unit, so the written store has exactly
one row per (series, bucket) and boundary-straddling WINDOWS are still
computed exactly once (a window needs samples [start, start+winlen-1],
so the unit reads the pages overlapping its sample range plus a
winlen-1 halo — an offset-range filter, partition-prunable on an
offset/date-laid-out page store; equivalence with the fused single-pass
pipeline is pytest-asserted, tests/test_rollup_job.py).  Coarser tiers
re-aggregate the committed 1m store (one unit each — they are ~60-3600x
smaller; partition them by date too if a deployment's 1m store outgrows
one task wave).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from afspark.functions import kernels as K  # noqa: E402
from afspark.operators.rollup import (  # noqa: E402
    TIERS,
    rollup_points,
    rollup_tier,
    scores_to_points,
)
from afspark.operators.score import score_pages  # noqa: E402
from afspark.streaming.checkpoint import CheckpointLog, run_resumable  # noqa: E402

DEFAULT_FEATURES = "energy,spl,zcr"


def build_features(names: str) -> list:
    feats = []
    for name in names.split(","):
        cls = K.FEATURES.get(name.strip())
        if cls is None:
            raise SystemExit(
                f"unknown feature {name!r}; available: {sorted(K.FEATURES)}"
            )
        feats.append(cls())
    return feats


def score_unit(
    offs: DataFrame,
    unit: int,
    unit_samples: int,
    features: list,
    winlen: int,
    noverlap: int,
    fs: float,
    origin_epoch: int,
) -> DataFrame:
    """1m-tier rows for the windows owned by sample-time unit ``unit``.

    Ownership is the half-open sample interval [unit*U, (unit+1)*U) of
    1-based window starts — with U a multiple of 60*fs and a
    minute-aligned origin, 1m buckets never straddle units.
    """
    lo = max(1, unit * unit_samples)  # first owned 1-based window start
    hi = (unit + 1) * unit_samples - 1  # last owned start
    ln = F.octet_length("text")
    # pages overlapping the sample range any owned window can touch
    need = offs.filter(
        (F.col("sample_offset") + ln >= lo)
        & (F.col("sample_offset") + 1 <= hi + winlen - 1)
    )
    scored = score_pages(need, features, winlen, noverlap, fs=fs).filter(
        (F.col("win_start") >= lo) & (F.col("win_start") <= hi)
    )
    return rollup_points(scores_to_points(scored, fs, origin_epoch), TIERS["1m"])


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet of (url, warc_ts, html, text, lang)")
    src.add_argument("--synth", type=int, help="synthesize N CC-style pages")
    ap.add_argument("--out", required=True, help="tier store root directory")
    ap.add_argument("--checkpoint", required=True, help="lineage+metrics log dir")
    ap.add_argument("--features", default=DEFAULT_FEATURES)
    ap.add_argument("--winlen", type=int, default=1024)
    ap.add_argument("--noverlap", type=int, default=512)
    ap.add_argument("--fs", type=float, default=1000.0)
    ap.add_argument("--origin-epoch", type=int, default=1_699_999_980)  # minute-aligned
    ap.add_argument(
        "--unit-seconds",
        type=int,
        default=86_400,
        help="resume-unit width in SAMPLE time (unit = this * fs samples)",
    )
    args = ap.parse_args()

    from afspark.session import get_session
    from afspark.sources.pages import generate_pages, with_series_offsets

    spark: SparkSession = get_session(app_name="afspark-rollup-job")
    pages = (
        generate_pages(spark, args.synth)
        if args.synth is not None
        else spark.read.parquet(args.pages)
    )
    offs = with_series_offsets(pages).persist()
    features = build_features(args.features)
    if args.unit_seconds % 60 != 0:
        raise SystemExit("--unit-seconds must be a multiple of 60 (the 1m "
                         "bucket width) so no bucket straddles a resume unit")
    if args.origin_epoch % 60 != 0:
        raise SystemExit("--origin-epoch must be minute-aligned")
    if (args.unit_seconds * args.fs) % 1 != 0:
        raise SystemExit("--unit-seconds * --fs must be an integer sample count")
    unit_samples = int(args.unit_seconds * args.fs)
    # units are per-series sample POSITIONS, so the unit count follows
    # the LONGEST series (every series shorter than one unit lands
    # entirely in unit 0), not the corpus total
    n_samples = offs.agg(
        F.max(F.col("sample_offset") + F.octet_length("text")).alias("n")
    ).first()["n"] or 0
    # last valid 1-based window start; its unit is floor(s_max/U) under
    # the half-open [u*U, (u+1)*U) ownership (ceil(n/U) would drop the
    # final window when winlen==1 and n is an exact unit multiple)
    s_max = max(0, int(n_samples) - args.winlen + 1)
    n_units = s_max // unit_samples + 1
    log = CheckpointLog(spark, args.checkpoint)

    stats = run_resumable(
        spark,
        stage="score_1m",
        partition_keys=[f"u{u:06d}" for u in range(n_units)],
        process_fn=lambda key: score_unit(
            offs,
            int(key[1:]),
            unit_samples,
            features,
            args.winlen,
            args.noverlap,
            args.fs,
            args.origin_epoch,
        ),
        out_path=f"{args.out}/tier=1m",
        log=log,
    )
    print(f"score_1m: {len(stats['processed'])} units processed, "
          f"{len(stats['skipped'])} skipped (resume)")

    # coarser tiers re-aggregate the COMMITTED 1m store (read back, so a
    # resumed job never recomputes scores), one resumable unit each
    t1m = spark.read.parquet(f"{args.out}/tier=1m")
    prev_name = "1m"
    for name in ("1h", "1d", "30d"):
        prev = t1m if prev_name == "1m" else spark.read.parquet(
            f"{args.out}/tier={prev_name}"
        )
        s = run_resumable(
            spark,
            stage=f"rollup_{name}",
            partition_keys=["all"],
            process_fn=lambda _k, p=prev, sec=TIERS[name]: rollup_tier(p, sec),
            out_path=f"{args.out}/tier={name}",
            log=log,
        )
        print(f"rollup_{name}: processed={s['processed']} skipped={s['skipped']}")
        prev_name = name

    # per-partition lineage + metrics, as the north_rule requires
    log.metrics().orderBy("committed_at").show(50, truncate=False)
    offs.unpersist()


if __name__ == "__main__":
    main()
