"""PMI collocations: planted collocation ranks first; ratio matches the
closed form; single-token docs don't break the bigram explode."""

import pytest

from afspark.operators.text import pmi_bigrams


def test_planted_collocation_ranks_first(spark):
    # "new york" always adjacent; "the" everywhere (high-frequency, low PMI)
    docs = []
    for i in range(20):
        docs.append((i, "the quick fox saw new york and the dog"))
    docs.append((20, "lone"))  # single-token doc: must not explode sequence(1,0)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_bigrams(df, min_count=5, k=10).collect()
    assert out, "no bigrams returned"
    # every once-per-doc pair of once-per-doc words ties at the max PMI;
    # the planted collocation must be in that tie group, with the exact
    # closed-form ratio: c_ab=20, c_a=c_b=20, N=181, M=160
    n, m = 20 * 9 + 1, 20 * 8
    want = 20 * n * n / (m * 20 * 20)
    top_ratio = out[0].pmi_ratio
    assert top_ratio == pytest.approx(want, rel=1e-12)
    tied = {(r.w1, r.w2) for r in out if r.pmi_ratio == top_ratio}
    assert ("new", "york") in tied
    # pairs involving the doubled word "the" score strictly lower
    the_pairs = [r for r in out if r.w1 == "the" or r.w2 == "the"]
    assert the_pairs and all(r.pmi_ratio < top_ratio for r in the_pairs)
