"""The spark-submit corpus-build job (jobs/corpus_job.py): text-hash
shard units equal the single-pass pipeline, resume skips committed
shards, and the mixture stage reproduces the certified operators."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from afspark.operators.dedup import exact_dedup
from afspark.operators.text import decontaminate, quality_features
from afspark.streaming.checkpoint import CheckpointLog, run_resumable
from jobs.corpus_job import _text_shard, build_kept_unit, mixture_stage

N_UNITS = 4
MIN_Q = 0.6


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def bench(spark, docs):
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    return docs.filter(F.col("doc_id") % 9 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(" ", F.slice(F.split(norm, " "), 3, 13)).alias("text"),
    )


def test_shard_units_equal_single_pass(spark, docs, bench):
    """Union of per-shard kept sets == gate->dedup->decontaminate run in
    one pass: text-hash sharding makes per-shard dedup globally
    complete, and duplicated texts land in exactly one shard."""
    # plant exact duplicates ACROSS the doc_id space: same text, new ids
    dup = docs.limit(12).withColumn("doc_id", F.col("doc_id") + 700_000)
    corpus = docs.unionByName(dup)

    parts = [
        build_kept_unit(corpus, u, N_UNITS, bench, MIN_Q, 13)
        for u in range(N_UNITS)
    ]
    got = parts[0]
    for p in parts[1:]:
        got = got.unionByName(p)

    gate = (
        quality_features(corpus).filter(F.col("quality") >= MIN_Q).select("doc_id")
    )
    kept = exact_dedup(corpus.join(gate, "doc_id"))
    flags = decontaminate(kept, bench, n=13)
    want = kept.join(
        flags.filter(F.col("n_contaminated") == 0).select("doc_id"), "doc_id"
    )

    g = {r.doc_id for r in got.select("doc_id").collect()}
    w = {r.doc_id for r in want.select("doc_id").collect()}
    assert g == w
    # every planted duplicate was deduped away (min-id keeper survives)
    assert not {d for d in g if d >= 700_000}
    # shards partition the kept set: no doc appears in two shards
    assert got.count() == len(g)


def test_shard_assignment_is_text_pure(spark):
    """Copies of one text always share a shard (the dedup-completeness
    invariant), regardless of id or row order."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["aa bb", "aa bb", "cc dd", "aa bb"])],
        "doc_id long, text string",
    ).withColumn("u", _text_shard("text", 5))
    by_text = {
        r.text: r.us
        for r in df.groupBy("text").agg(
            F.collect_set("u").alias("us")
        ).collect()
    }
    assert all(len(us) == 1 for us in by_text.values())


def test_resume_skips_committed_shards(spark, docs, bench, tmp_path):
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    log = CheckpointLog(spark, ckpt)
    keys = [f"u{u:06d}" for u in range(N_UNITS)]

    def run():
        return run_resumable(
            spark,
            stage="kept",
            partition_keys=keys,
            process_fn=lambda key: build_kept_unit(
                docs, int(key[1:]), N_UNITS, bench, MIN_Q, 13
            ),
            out_path=f"{out}/kept",
            log=log,
        )

    first = run()
    assert len(first["processed"]) == N_UNITS and not first["skipped"]
    again = run()
    assert not again["processed"] and len(again["skipped"]) == N_UNITS

    kept = spark.read.parquet(f"{out}/kept")
    manifest, sample = mixture_stage(kept, alpha=0.5, token_budget=20_000)
    m = manifest.toPandas()
    s = sample.toPandas()
    # manifest totals are consistent with the sample rows
    assert int(m["n_rows_emitted"].sum()) == int(s["n_copies"].sum())
    assert set(m["source"]) == set(s["source"].unique())
    assert (m["tokens_emitted"] > 0).all()
