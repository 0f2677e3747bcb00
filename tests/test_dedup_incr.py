"""Incremental (batch-vs-index) LSH dedup == the cross slice of the
full self-join pipeline, on planted near-dups over real corpus text."""

import pytest
from pyspark.sql import functions as F

from afspark.operators.dedup import (
    build_lsh_index,
    incremental_dedup_pairs,
    minhash_lsh_dedup_pairs,
)

PARAMS = dict(k=8, n_hashes=64, bands=4, band_rows=4, threshold=0.7)


@pytest.fixture(scope="module")
def corpus_and_batch(spark, sf_dir):
    corpus = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .persist()
    )
    # batch: near-copies of every 5th corpus doc (prefix perturbation
    # keeps jaccard high) + novel reversed texts that match nothing
    near = (
        corpus.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 100_000).alias("doc_id"),
            F.concat(F.lit("xq "), F.col("text")).alias("text"),
        )
    )
    novel = corpus.filter(F.col("doc_id") % 5 == 1).select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    return corpus, near.unionByName(novel).persist()


def test_incremental_equals_full_cross_slice(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    index = build_lsh_index(corpus, **{k: v for k, v in PARAMS.items()
                                       if k != "threshold"})
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in incremental_dedup_pairs(index, corpus, batch, **PARAMS).collect()
    }
    full = minhash_lsh_dedup_pairs(
        corpus.unionByName(batch), est_margin=None, **PARAMS
    )
    is_corpus_a = F.col("id_a") < 100_000
    is_corpus_b = F.col("id_b") < 100_000
    cross = full.filter(is_corpus_a != is_corpus_b)
    want = {
        (r.id_a, r.id_b): round(r.jaccard, 9) for r in cross.collect()
    }
    assert got == want
    assert got, "no cross near-dups found — fixture broken"


def test_incremental_finds_planted_neardups(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    index = build_lsh_index(corpus, **{k: v for k, v in PARAMS.items()
                                       if k != "threshold"})
    pairs = incremental_dedup_pairs(index, corpus, batch, **PARAMS).collect()
    found_sources = {r.id_a for r in pairs if r.id_b >= 100_000}
    planted = {
        r.doc_id for r in corpus.filter(F.col("doc_id") % 5 == 0).collect()
    }
    # banding recall at j~0.95 is ~1; allow a small miss margin anyway
    assert len(found_sources & planted) >= 0.9 * len(planted)
    # novel docs (reversed text) must not pair with anything
    assert all(r.id_b < 200_000 for r in pairs)
