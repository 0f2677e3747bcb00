"""Tests for dedup / similarity / text / multimodal / planner operators."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from afspark.operators import dedup, multimodal, similarity, text
from afspark.plans.planner import choose_assembly, hot_keys, salt_series


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- dedup -------------------------------------------------------------------

def test_exact_dedup_removes_planted_dupes(spark, docs):
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100_000)
    with_dupes = docs.unionByName(dup)
    out = dedup.exact_dedup(with_dupes)
    assert out.count() == docs.count()
    # keeper is the min doc_id (the original, not the planted copy)
    assert out.filter(F.col("doc_id") >= 100_000).count() == 0


def test_minhash_lsh_finds_planted_neardup(spark, docs):
    base = docs.limit(20)
    one = base.first()
    # plant a near-duplicate: same text with a tiny suffix
    near = spark.createDataFrame(
        [(999_999, one.text + " x", one.lang, one.source, one.n_chars)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    corpus = base.unionByName(near)
    pairs = dedup.minhash_lsh_dedup_pairs(corpus, threshold=0.8).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (one.doc_id, 999_999) in found
    for r in pairs:
        assert r.jaccard >= 0.8


def test_lsh_candidates_superset_verified(docs):
    sh = dedup.char_shingles(docs.limit(50))
    sig = dedup.minhash_signatures(sh, n_hashes=16)
    cand = dedup.lsh_candidate_pairs(sig, bands=4)
    ver = dedup.jaccard_verify(cand, sh, threshold=0.5)
    c = {(r.id_a, r.id_b) for r in cand.collect()}
    v = {(r.id_a, r.id_b) for r in ver.collect()}
    assert v <= c


def test_simhash_near_pairs_on_planted(spark, docs):
    base = docs.limit(15)
    one = base.first()
    near = spark.createDataFrame(
        [(888_888, one.text + " zzz", "en", "src0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sh = dedup.simhash64(base.unionByName(near))
    vals = {r.id: r.simhash for r in sh.collect()}
    assert len(vals) == 16
    ham = bin(vals[one.doc_id] ^ vals[888_888]).count("1")
    assert ham <= 3
    pairs = dedup.simhash_near_pairs(sh, max_hamming=3)
    assert (one.doc_id, 888_888) in {(r.id_a, r.id_b) for r in pairs.collect()}


def test_simhash_deterministic_across_partitionings(docs):
    a = {r.id: r.simhash for r in dedup.simhash64(docs.limit(30).repartition(1)).collect()}
    b = {r.id: r.simhash for r in dedup.simhash64(docs.limit(30).repartition(7)).collect()}
    assert a == b


def test_embedding_neardup_planted(spark, emb):
    base = emb.limit(30)
    one = base.first()
    twin = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [777_777],
                "embedding": [[float(x) * 1.0001 for x in one.embedding]],
                "label": [one.label],
            }
        )
    )
    pairs = dedup.embedding_neardup_pairs(
        base.unionByName(twin), threshold=0.999
    ).collect()
    assert (one.vec_id, 777_777) in {(r.id_a, r.id_b) for r in pairs}


# --- similarity ---------------------------------------------------------------

def test_brute_force_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = X[:3]
    queries = spark.createDataFrame(
        pd.DataFrame({"qid": ids[:3], "qvec": [list(map(float, v)) for v in q]})
    )
    got = similarity.brute_force_topk(emb, queries, k=5)
    got_map = {}
    for r in got.collect():
        got_map.setdefault(r.qid, []).append((r.rank, r.cid))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for qi in range(3):
        cos = Xn @ (q[qi] / np.linalg.norm(q[qi]))
        order = sorted(zip(-cos, ids))  # desc cos, asc id tiebreak
        want = [int(i) for _, i in order[:5]]
        have = [cid for _, cid in sorted(got_map[ids[qi]])]
        assert have == want


def test_ivf_topk_recall_vs_exact(spark, emb):
    cb = similarity.train_codebook(emb, n_cells=8, sample=500)
    cells = similarity.assign_cells(emb, cb).cache()
    pdf = emb.limit(5).toPandas()
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": pdf["vec_id"],
                "qvec": [list(map(float, v)) for v in pdf["embedding"]],
            }
        )
    )
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.ivf_topk(cells, cb, queries, k=5, n_probe=4)
    ex = {}
    for r in exact.collect():
        ex.setdefault(r.qid, set()).add(r.cid)
    ap = {}
    for r in approx.collect():
        ap.setdefault(r.qid, set()).add(r.cid)
    recalls = [len(ex[q] & ap.get(q, set())) / 5 for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5  # probing half the cells


# --- text ----------------------------------------------------------------------

def test_lang_id_and_quality(spark, docs):
    english = spark.createDataFrame(
        [(1, "the cat and the dog of the house is in that it for was the")],
        "doc_id long, text string",
    )
    out = text.lang_id(english).first()
    assert out.pred_lang == "en"
    q = text.quality_features(docs).filter(F.col("doc_id") == 0).first()
    assert q.n_chars > 0 and 0 <= q.quality <= 1.0


def test_token_stats_and_bpe_count(spark):
    d = spark.createDataFrame(
        [(1, "hello world hello 123 foo-bar!")], "doc_id long, text string"
    )
    ts = text.token_stats(d).first()
    assert ts.n_tokens == 5 and ts.n_distinct == 4
    bpe = text.bpe_ish_token_count(d).first()
    # hello, world, hello, 123, foo, -, bar, !
    assert bpe.n_bpe_tokens == 8


def test_fingerprint_whitespace_invariant(spark):
    d = spark.createDataFrame(
        [(1, "a  b\tc"), (2, "a b c"), (3, "a b d")], "doc_id long, text string"
    )
    fps = {r.doc_id: r.fingerprint for r in text.fingerprint(d).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_rolling_hash_fingerprints_detect_containment(spark, docs):
    one = docs.first()
    container = spark.createDataFrame(
        [(555_555, "prefix words here " + one.text + " suffix words")],
        "doc_id long, text string",
    )
    corpus = docs.limit(10).select("doc_id", "text").unionByName(container)
    fps = text.rolling_hash_fingerprints(corpus)
    overlap = (
        fps.filter(F.col("id") == one.doc_id)
        .select("fp")
        .intersect(fps.filter(F.col("id") == 555_555).select("fp"))
        .count()
    )
    assert overlap > 0


def test_rolling_fingerprints_edge_window_counts(spark):
    """Exactly-w-token docs must not crash (sequence(0,-1) descends) and
    the LAST window must be included: w tokens -> 1 window, w+1 -> 2."""
    d = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(8))),
            (2, " ".join(f"t{i}" for i in range(9))),
            (3, "short doc"),
        ],
        "doc_id long, text string",
    )
    fps = text.rolling_hash_fingerprints(d, keep_every=1)  # keep all windows
    counts = {
        r.id: r.n
        for r in fps.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {1: 1, 2: 2}
    # md5 portable twin: identical windowing
    fpm = text.rolling_hash_fingerprints(d, keep_every=1, hash_mode="md5")
    counts_m = {
        r.id: r.n
        for r in fpm.groupBy("id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts_m == counts
    # positions include the final window start (size - w)
    pos2 = sorted(r.pos for r in fps.filter(F.col("id") == 2).collect())
    assert pos2 == [0, 1]


def test_md5_hash_mode_matches_xxhash_windowing(spark, docs):
    """hash_mode only changes the fingerprint, never the window/pair set
    structure: minhash md5 signatures are deterministic and banded-LSH
    verified pairs are a subset of all >=threshold jaccard pairs."""
    base = docs.limit(30)
    out = dedup.minhash_lsh_dedup_pairs(
        base, n_hashes=4, bands=2, threshold=0.5, hash_mode="md5"
    )
    for r in out.collect():
        assert r.jaccard >= 0.5 and r.id_a < r.id_b


def test_plan_construction_launches_no_jobs(spark, docs, emb):
    """Operators with explicit n_hashes/dim must stay lazy — building the
    plan fires zero Spark jobs (VERDICT r1 #7)."""
    dim = len(emb.first().embedding)  # outside the tracked group
    sc = spark.sparkContext
    group = "lazy-plan-check"
    sc.setJobGroup(group, "plan construction must not run jobs")
    try:
        sh = dedup.char_shingles(docs.limit(20))
        sig = dedup.minhash_signatures(sh, n_hashes=8)
        dedup.lsh_candidate_pairs(sig, bands=4, n_hashes=8)
        dedup.embedding_neardup_pairs(emb.limit(10), dim=dim)
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup(group)
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == []


# --- multimodal ------------------------------------------------------------------

def test_multimodal_plumbing(spark):
    from afspark.sources.pages import generate_pages

    pages = generate_pages(spark, 40)
    media = multimodal.media_from_pages(pages)
    assert media.schema["meta"].dataType.fieldNames() == ["mime", "width", "height", "duration_ms"]
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(media).count()
    decoded = multimodal.decode_media(media, out_h=8, out_w=8, fake=True)
    rows = decoded.collect()
    assert len(rows) == 40 and all(len(r.pixels) == 64 for r in rows)
    feats = multimodal.media_features(decoded)
    f = feats.first()
    assert f.std_px >= 0 and 0 <= f.entropy_px <= 8.0
    # determinism across partitionings
    d2 = multimodal.decode_media(media.repartition(7), out_h=8, out_w=8, fake=True)
    assert {(r.media_id, tuple(r.pixels)) for r in d2.collect()} == {
        (r.media_id, tuple(r.pixels)) for r in rows
    }
    frames = multimodal.frame_sample(media, fake=True)
    assert frames.count() == 40  # duration 0 -> one frame each


# --- planner ----------------------------------------------------------------------

def test_choose_assembly():
    assert choose_assembly(1000, 0, algebraic=True).strategy == "tumbling"
    assert choose_assembly(1000, 500, algebraic=True).strategy == "sliding"
    assert choose_assembly(1000, 900, algebraic=True).strategy == "halo"
    assert choose_assembly(1000, 500, algebraic=False).strategy == "halo"
    assert choose_assembly(1000, 900, algebraic=False).replication < 1.02


def test_hot_keys_and_salting(spark):
    from afspark.sources.pages import generate_pages, derive_samples

    pages = generate_pages(spark, 400, hot_domain_frac=0.4)
    samples = derive_samples(pages)
    hot = hot_keys(samples, "series_id", frac_threshold=0.2)
    assert hot == ["d000.example.com"]
    salted = salt_series(samples, hot, n_salts=4, span=1000)
    per_salt = (
        salted.filter(F.col("series_id") == "d000.example.com")
        .groupBy("salt")
        .count()
        .collect()
    )
    assert len(per_salt) > 1  # hot series split across salts
    cold = salted.filter(F.col("series_id") != "d000.example.com")
    assert cold.filter(F.col("salt") != 0).count() == 0


def test_decode_media_real_path_gated_on_pil(spark):
    """fake=False decodes real bytes when Pillow is installed, and raises
    the documented NotImplementedError when it is not — the plumbing is
    identical either way."""
    from afspark.operators.multimodal import _pil_available
    from afspark.sources.pages import generate_pages

    media = multimodal.media_from_pages(generate_pages(spark, 5))
    if not _pil_available():
        with pytest.raises(NotImplementedError):
            multimodal.decode_media(media).count()
        pytest.skip("Pillow not installed in this container (stub verified)")
    # real path: encode a tiny PNG payload and round-trip the decode
    import io

    import pandas as pd
    from PIL import Image

    img = Image.fromarray(np.arange(64, dtype=np.uint8).reshape(8, 8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    real = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "kind": ["image"],
                "payload": [buf.getvalue()],
                "meta": [{"mime": "image/png", "width": 8, "height": 8, "duration_ms": 0}],
            }
        ),
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.decode_media(real, out_h=8, out_w=8).first()
    assert out.pixels == list(range(64))


def test_connected_components_chain_and_clumps(spark):
    """Min-label + pointer-jumping components: a long chain (worst case
    for pure neighbor propagation) and two clumps resolve to min-id
    labels in O(log n) rounds."""
    chain = [(i, i + 1) for i in range(100, 120)]  # 21-node chain
    clump = [(1, 2), (2, 3), (1, 3), (7, 9)]
    pairs = spark.createDataFrame(chain + clump, "id_a long, id_b long")
    got = {
        r.id: r.cluster_id
        for r in dedup.connected_components(pairs).collect()
    }
    assert all(got[i] == 100 for i in range(100, 121))
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[9] == 7
    assert len(got) == 21 + 5


def test_deterministic_sample_stable_and_monotone(spark, docs):
    base = docs.select("doc_id")
    s10 = {r.doc_id for r in text.deterministic_sample(base, 10).collect()}
    s20 = {r.doc_id for r in text.deterministic_sample(base, 20).collect()}
    # stable under repartitioning / re-runs
    again = {
        r.doc_id
        for r in text.deterministic_sample(base.repartition(13), 10).collect()
    }
    assert s10 == again
    # subset-monotone and roughly proportional
    assert s10 <= s20
    n = base.count()
    assert abs(len(s20) / n - 0.2) < 0.08
    assert text.deterministic_sample(base, 0).count() == 0
    assert text.deterministic_sample(base, 100).count() == n


def test_top_terms_deterministic_ranking(spark):
    d = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "banana date cherry"),
        ],
        "doc_id long, text string",
    )
    got = [(r.term, r.doc_freq) for r in text.top_terms(d, k=3).collect()]
    # doc frequency (not term frequency): apple appears twice in doc 1
    # but counts once; ties broken by term ascending
    assert got == [("banana", 3), ("cherry", 2), ("apple", 1)]


# --- connected components: adversarial chain --------------------------------

def test_star_cc_chain_bounded_rounds(spark):
    """A 10k-node chain is the adversarial case for neighbor propagation
    (diameter 10k).  Large-star/small-star must collapse it to one
    component in O(log n) rounds."""
    import math

    n = 10_000
    chain = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    labels, rounds = dedup.connected_components_star(
        chain, return_rounds=True
    )
    got = labels.select("cluster_id").distinct().collect()
    assert [r.cluster_id for r in got] == [0]
    assert labels.count() == n
    # +2: one round to detect the fixed point, one slack round
    assert rounds <= 2 * math.ceil(math.log2(n)) + 2


def test_star_cc_matches_propagation_on_random_graph(spark):
    """Star CC and the propagation loop must agree exactly on a random
    multi-component graph."""
    edges = (
        spark.range(500)
        .select(
            (F.xxhash64("id") % 300).alias("id_a"),
            (F.xxhash64("id", F.lit(1)) % 300).alias("id_b"),
        )
        .filter((F.col("id_a") >= 0) & (F.col("id_b") >= 0))
    )
    a = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components_star(edges).collect()
    }
    b = {
        (r.id, r.cluster_id)
        for r in dedup.connected_components(edges).collect()
    }
    assert a == b


def test_repetition_stats_goldens(spark):
    """Hand-computed Gopher repetition signals on tiny docs."""
    from afspark.operators.text import repetition_stats

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "x y x y x"), (3, "unique words only here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}

    r = out[1]  # words a,a,b; bigrams "a a","a b"
    assert (r.n_words, r.n_distinct_words, r.n_bigrams) == (3, 2, 2)
    assert r.top_word_frac == pytest.approx(2 / 3)
    assert r.dup_word_frac == pytest.approx(1 / 3)
    assert r.top_bigram_frac == pytest.approx(1 / 2)
    assert r.dup_bigram_frac == 0.0

    r = out[2]  # bigrams: "x y" x2, "y x" x2
    assert (r.n_words, r.n_distinct_words, r.n_bigrams) == (5, 2, 4)
    assert r.top_word_frac == pytest.approx(3 / 5)
    assert r.dup_word_frac == pytest.approx(3 / 5)
    assert r.top_bigram_frac == pytest.approx(1 / 2)
    assert r.dup_bigram_frac == pytest.approx(1 / 2)

    r = out[3]
    assert r.dup_word_frac == 0.0 and r.dup_bigram_frac == 0.0
    assert r.top_word_frac == pytest.approx(1 / 4)


def test_stratified_split_properties(spark, sf_dir):
    """Split is exhaustive, deterministic, and proportional per stratum."""
    from afspark.operators.text import stratified_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_split(docs)
    n = docs.count()
    # exhaustive: every row assigned, no nulls
    assert out.filter(F.col("split").isNull()).count() == 0
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert sum(counts.values()) == n
    # roughly proportional overall (hash-threshold: binomial tolerance)
    assert abs(counts.get("train", 0) / n - 0.8) < 0.1
    # deterministic: same assignment on recompute
    a = sorted((r.doc_id, r.split) for r in out.select("doc_id", "split").collect())
    b = sorted((r.doc_id, r.split) for r in stratified_split(docs).select("doc_id", "split").collect())
    assert a == b
    # weights must sum to 1000
    with pytest.raises(ValueError):
        stratified_split(docs, weights=[("a", 500), ("b", 400)])


def test_containment_pairs_planted_quote(spark):
    """Doc A fully quoted inside doc B at an arbitrary token offset ->
    containment ~= 1 for (A,B); unrelated doc stays below threshold."""
    from afspark.operators.text import containment_pairs

    import random

    rng = random.Random(3)
    words = lambda n: " ".join(f"w{rng.randrange(10_000)}" for _ in range(n))
    a_text = words(40)
    b_text = words(13) + " " + a_text + " " + words(9)   # quote at offset 13
    c_text = words(60)
    docs = spark.createDataFrame(
        [(1, a_text), (2, b_text), (3, c_text)], "doc_id long, text string"
    )
    out = {(r.id_a, r.id_b): r for r in containment_pairs(docs, min_shared=1).collect()}
    ab = out.get((1, 2))
    assert ab is not None, "quoted pair must be detected"
    assert ab.containment == 1.0          # every kept fp of A appears in B
    assert (1, 3) not in out and (2, 3) not in out


def test_distributed_kmeans_recovers_blobs(spark):
    """3 well-separated 8-dim blobs: distributed Lloyd's recovers one
    centroid per blob (within noise), invariant to partitioning."""
    import numpy as np

    from afspark.operators.similarity import (
        assign_cells,
        train_codebook_distributed,
    )

    rng = np.random.default_rng(11)
    centers = np.array([[10.0] * 8, [-10.0] * 8, [10.0, -10.0] * 4])
    X = np.concatenate([c + rng.normal(0, 0.5, size=(50, 8)) for c in centers])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(X)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cb = train_codebook_distributed(emb, n_cells=3, iters=6)
    # each learned centroid sits within 0.5 of exactly one true center
    d = ((cb[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2) ** 0.5
    matched = d.min(axis=1)
    assert (matched < 0.5).all(), matched
    assert set(d.argmin(axis=1)) == {0, 1, 2}

    # assignment purity: every vector lands with its blob's centroid
    cells = assign_cells(emb, cb).toPandas()
    blob = cells["id"].to_numpy() // 50
    by_blob = {b: set(cells["cell"][blob == b]) for b in (0, 1, 2)}
    assert all(len(s) == 1 for s in by_blob.values())

    # partitioning invariance of the deterministic init + result
    cb2 = train_codebook_distributed(emb.repartition(13), n_cells=3, iters=6)
    d2 = ((cb2[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2) ** 0.5
    assert (d2.min(axis=1) < 0.5).all()


def test_kmeans_parallel_seeding_pass_count_independent_of_ncells(spark, monkeypatch):
    """k-means|| contract (VERDICT r3): seeding runs a FIXED number of
    corpus passes (rounds + 3), independent of n_cells — the maximin init
    it replaced ran one full scan per seed.  Passes are counted as
    toPandas() materializations inside _kmeans_parallel_seeds."""
    import numpy as np
    from pyspark.sql import DataFrame

    from afspark.operators.similarity import _kmeans_parallel_seeds

    rng = np.random.default_rng(7)
    X = rng.normal(size=(200, 4)) * 5.0
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(X)]
    emb = spark.createDataFrame(rows, "id long, v array<double>")

    counts = {}
    orig = DataFrame.toPandas
    for k in (4, 16):
        n_calls = [0]

        def counted(self, _n=n_calls):
            _n[0] += 1
            return orig(self)

        monkeypatch.setattr(DataFrame, "toPandas", counted)
        seeds = _kmeans_parallel_seeds(emb, n_cells=k, seed=3, rounds=5)
        monkeypatch.setattr(DataFrame, "toPandas", orig)
        counts[k] = n_calls[0]
        assert seeds.shape == (k, 4)

    assert counts[4] == counts[16], counts
    assert counts[4] <= 8, counts


def test_simhash64_unicode_and_edge_tokens(spark):
    """Regression: the round-3 simhash sized its pad matrix by CHARACTER
    length but filled it with UTF-8 BYTES — any doc whose longest token
    was multibyte crashed the Arrow pass.  The byte-buffer rewrite must
    handle unicode, NUL bytes, empty and whitespace-only docs, and a
    pathological no-space token without error, deterministically."""
    from afspark.operators import dedup

    texts = [
        "héllo wörld", "ünïcodé " * 10, "", "   ", "nul\x00tok here",
        "x" * 50000, "plain ascii text",
    ]
    sdf = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    a = {r.id: r.simhash for r in dedup.simhash64(sdf).collect()}
    b = {r.id: r.simhash for r in dedup.simhash64(sdf.repartition(5)).collect()}
    assert a == b
    assert a[2] == 0 and a[3] == 0  # empty / whitespace-only -> 0
    assert len(a) == len(texts)


def test_jaccard_verify_big_doc_fallback_identical(spark, docs):
    """Docs exceeding max_array_shingles route through the row-join
    fallback; the combined result must equal the pure array path."""
    sub = docs.limit(40)
    sh = dedup.char_shingles(sub)
    cand = dedup.lsh_candidate_pairs(
        dedup.minhash_signatures(sh, 16), bands=4, n_hashes=16
    )
    full = {(r.id_a, r.id_b): r.jaccard
            for r in dedup.jaccard_verify(cand, sh, threshold=0.2).collect()}
    # force EVERY doc through the fallback, then a mixed split
    for cap in (1, 500):
        mixed = {(r.id_a, r.id_b): r.jaccard
                 for r in dedup.jaccard_verify(
                     cand, sh, threshold=0.2, max_array_shingles=cap
                 ).collect()}
        assert mixed == full, cap


def test_ivf_topk_distributed_equals_driver_variant(spark, emb):
    """The no-driver-collect IVF variant must return exactly the rows of
    ivf_topk for the same codebook/queries (same argsort probe order,
    same two-phase top-k tie rules)."""
    from afspark.operators.similarity import (
        assign_cells,
        ivf_topk,
        ivf_topk_distributed,
        train_codebook,
    )

    cb = train_codebook(emb.orderBy("vec_id"), n_cells=8, sample=400)
    cells = assign_cells(emb, cb)
    qpdf = emb.orderBy("vec_id").limit(5).toPandas()
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": qpdf["vec_id"],
                "qvec": [list(map(float, v)) for v in qpdf["embedding"]],
            }
        )
    )
    key = lambda r: (r.qid, r.rank)  # noqa: E731
    a = sorted(ivf_topk(cells, cb, queries, k=5, n_probe=3).collect(), key=key)
    b = sorted(
        ivf_topk_distributed(cells, cb, queries, k=5, n_probe=3).collect(), key=key
    )
    assert [(r.qid, r.cid, r.rank) for r in a] == [(r.qid, r.cid, r.rank) for r in b]
    for x, y in zip(a, b):
        assert x.cos_sim == pytest.approx(y.cos_sim, rel=1e-12)


def test_embedding_neardup_banded_recall(spark):
    """Banded hyperplane LSH: planted near-dup pairs at cos ~0.9 that the
    single 16-bit signature usually misses are recovered by 4x8 banding;
    output pairs are unique (multi-band matches dedup) and every emitted
    pair clears the exact-cosine threshold."""
    rng = np.random.default_rng(31)
    dim = 32
    base = rng.normal(size=(20, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # planted near-dup: small perturbation -> cos ~ 0.97-0.99
        rows.append((100 + i, [float(x) for x in v + rng.normal(0, 0.07, dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    banded = dedup.embedding_neardup_pairs(
        emb, threshold=0.9, n_planes=8, bands=4, dim=dim
    ).collect()
    pairs = {(r.id_a, r.id_b) for r in banded}
    assert len(pairs) == len(banded)  # multi-band matches dedup
    planted = {(i, 100 + i) for i in range(20)}
    found = planted & pairs
    assert len(found) >= 18, f"banding should recover ~all planted pairs: {len(found)}"
    for r in banded:
        assert r.cos_sim >= 0.9


def test_pq_adc_matches_numpy_twin(spark, emb):
    """Spark PQ pipeline (train -> encode -> ADC top-k) reproduces a
    single-process numpy twin exactly: same codebooks, same codes, same
    approximate-cosine ranking."""
    m, n_codes = 8, 16
    cb = similarity.train_pq_codebooks(emb, m=m, n_codes=n_codes, sample=2048)
    codes = similarity.pq_encode(emb, cb).cache()
    pdf = emb.orderBy("vec_id").toPandas()
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy(np.int64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    dsub = X.shape[1] // m

    # codes parity
    got_codes = {r.id: list(r.code) for r in codes.collect()}
    for i, vid in enumerate(ids):
        want = [
            int(((Xn[i, j * dsub:(j + 1) * dsub][None, :] - cb[j]) ** 2)
                .sum(axis=1).argmin())
            for j in range(m)
        ]
        assert got_codes[int(vid)] == want

    # ADC ranking parity for 3 queries
    queries = spark.createDataFrame(
        pd.DataFrame(
            {"qid": ids[:3], "qvec": [list(map(float, v)) for v in X[:3]]}
        )
    )
    got = {}
    for r in similarity.pq_topk(codes, cb, queries, k=5).collect():
        got.setdefault(r.qid, []).append((r.rank, r.cid))
    C = np.stack([got_codes[int(v)] for v in ids])
    jj = np.arange(m)
    for qi in range(3):
        lut = np.stack(
            [((cb[j] - Xn[qi, j * dsub:(j + 1) * dsub][None, :]) ** 2).sum(axis=1)
             for j in range(m)]
        )
        approx = 1.0 - lut[jj[None, :], C].sum(axis=1) / 2.0
        order = sorted(zip(-approx, ids))
        want = [int(i) for _, i in order[:5]]
        have = [cid for _, cid in sorted(got[ids[qi]])]
        assert have == want


def test_pq_recall_beats_chance(spark, emb):
    """ADC recall on random gaussians is far above the ~0.01 chance
    level, and self-query always ranks the query itself by construction
    of the quantizer (its own code is its nearest)."""
    cb = similarity.train_pq_codebooks(emb, m=8, n_codes=16)
    codes = similarity.pq_encode(emb, cb).cache()
    pdf = emb.orderBy("vec_id").limit(5).toPandas()
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": pdf["vec_id"],
                "qvec": [list(map(float, v)) for v in pdf["embedding"]],
            }
        )
    )
    exact = similarity.brute_force_topk(emb, queries, k=5)
    approx = similarity.pq_topk(codes, cb, queries, k=5)
    ex, ap = {}, {}
    for r in exact.collect():
        ex.setdefault(r.qid, set()).add(r.cid)
    for r in approx.collect():
        ap.setdefault(r.qid, set()).add(r.cid)
    total_hits = sum(len(ex[q] & ap[q]) for q in ex)
    assert total_hits >= 5  # chance level is 5 queries * 5*5/500 = 0.25


def test_pq_topk_rejects_oversized_query_set(spark, emb):
    """pq_topk's driver-side query collect fails fast past
    max_driver_queries (mirrors ivf_topk's guard) instead of pulling an
    unbounded DataFrame to the driver."""
    cb = similarity.train_pq_codebooks(emb, m=8, n_codes=16)
    codes = similarity.pq_encode(emb, cb)
    queries = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    with pytest.raises(ValueError, match="max_driver_queries"):
        similarity.pq_topk(codes, cb, queries, k=5, max_driver_queries=10)


def test_ivfpq_composition_prunes_then_adc(spark, emb):
    """IVF-PQ: codes carry the IVF cell, the probed-cell filter prunes
    the ADC scan, and results equal running ADC over only those cells."""
    ivf_cb = similarity.train_codebook(emb.orderBy("vec_id"), n_cells=8, sample=500)
    cells = similarity.assign_cells(emb, ivf_cb)
    pq_cb = similarity.train_pq_codebooks(emb, m=8, n_codes=16)
    codes = similarity.pq_encode(emb, pq_cb).join(
        cells.select(F.col("id"), "cell"), "id"
    ).cache()
    pdf = emb.orderBy("vec_id").limit(2).toPandas()
    queries = spark.createDataFrame(
        pd.DataFrame(
            {
                "qid": pdf["vec_id"],
                "qvec": [list(map(float, v)) for v in pdf["embedding"]],
            }
        )
    )
    # probe the 4 closest cells of query 0's vector for both queries
    qv = np.asarray(pdf["embedding"][0], np.float64)
    d2 = ((ivf_cb - qv[None, :]) ** 2).sum(axis=1)
    probed = [int(c) for c in np.argsort(d2)[:4]]
    pruned = codes.filter(F.col("cell").isin(probed))
    got = similarity.pq_topk(pruned, pq_cb, queries, k=5)
    allowed = {r.id for r in pruned.select("id").collect()}
    rows = got.collect()
    assert rows and all(r.cid in allowed for r in rows)
    # parity with ADC over the same subset materialized independently
    subset = codes.filter(F.col("cell").isin(probed)).select("id", "code")
    want = {
        (r.qid, r.rank): r.cid
        for r in similarity.pq_topk(subset, pq_cb, queries, k=5).collect()
    }
    assert {(r.qid, r.rank): r.cid for r in rows} == want


def test_duplicated_span_stats_planted_duplicate(spark):
    """Two docs sharing an 8-token passage mark exactly the shared
    windows duplicated; a unique doc reports zero; same-doc repeats do
    NOT count (cross-document requires >= 2 distinct docs)."""
    from afspark.operators.text import duplicated_span_stats

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    uniq_a = "one two three four five six seven"
    uniq_b = "red orange yellow green blue indigo violet"
    docs = spark.createDataFrame(
        [
            (1, f"{uniq_a} {shared}"),
            (2, f"{shared} {uniq_b}"),
            (3, "solo tokens that repeat repeat repeat nothing shared here ok"),
            # same-doc repetition of an n-gram, no second doc
            (4, "x1 x2 x3 x4 x5 x6 x7 x8 pad x1 x2 x3 x4 x5 x6 x7 x8"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in duplicated_span_stats(docs).collect()}
    # doc1: 15 tokens -> 8 windows, only the last (the shared passage) dups
    assert (out[1].n_windows, out[1].n_dup_windows) == (8, 1)
    assert (out[2].n_windows, out[2].n_dup_windows) == (8, 1)
    assert out[3].n_dup_windows == 0
    assert out[4].n_dup_windows == 0  # 2 occurrences but 1 distinct doc
    assert out[1].dup_frac == pytest.approx(1 / 8)


def test_remove_duplicate_spans_byte_exact_remainder(spark):
    """Planted duplicated paragraph is removed from BOTH docs; the
    untouched remainder is byte-exact; unique docs pass through
    unchanged; a fully-duplicated doc becomes ''."""
    from afspark.operators.text import remove_duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8
    uniq_a = "one two three four five six seven"
    uniq_b = "red orange yellow green blue indigo violet"
    docs = spark.createDataFrame(
        [
            (1, f"{uniq_a} {shared}"),
            (2, f"{shared} {uniq_b}"),
            (3, "solo text with nothing shared across documents at all"),
            (4, shared),  # nothing but the duplicated span
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(docs).collect()}
    assert out[1].text_dedup == uniq_a  # byte-exact untouched prefix
    assert out[2].text_dedup == uniq_b  # byte-exact untouched suffix
    assert out[1].n_tokens_removed == 8 and out[2].n_tokens_removed == 8
    assert out[1].n_tokens == 15
    assert out[3].text_dedup == docs.collect()[2].text  # pass-through
    assert out[3].n_tokens_removed == 0
    assert out[4].text_dedup == "" and out[4].n_tokens_removed == 8


def test_remove_duplicate_spans_idempotent(spark):
    """Applying the rewrite to its own output is a no-op (fixed point):
    all duplicated windows were removed, so the second pass finds none."""
    from afspark.operators.text import remove_duplicate_spans

    passage = " ".join(f"p{i}" for i in range(20))
    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd ee ff gg hh ii " + passage),
            (2, passage + " zz yy xx ww vv uu tt ss rr"),
            (3, "totally unrelated words live here without any duplication"),
        ],
        "doc_id long, text string",
    )
    once = remove_duplicate_spans(docs)
    again = remove_duplicate_spans(
        once.select("doc_id", F.col("text_dedup").alias("text"))
    )
    first = {r.doc_id: r.text_dedup for r in once.collect()}
    second = {r.doc_id: (r.text_dedup, r.n_tokens_removed) for r in again.collect()}
    for did, txt in first.items():
        assert second[did] == (txt, 0)


def test_remove_duplicate_spans_interior_span_and_overlap(spark):
    """An interior duplicated run longer than one window masks the whole
    covered run (union of overlapping windows), splitting the doc into a
    byte-exact head + tail joined by a single space."""
    from afspark.operators.text import remove_duplicate_spans

    run = " ".join(f"d{i}" for i in range(12))  # 12 tokens -> 5 windows
    docs = spark.createDataFrame(
        [
            (1, f"head1 head2 head3 {run} tail1 tail2 tail3"),
            (2, f"other lead in {run} and some close"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in remove_duplicate_spans(docs).collect()}
    assert out[1].text_dedup == "head1 head2 head3 tail1 tail2 tail3"
    assert out[2].text_dedup == "other lead in and some close"
    assert out[1].n_tokens_removed == 12


def test_duplicated_span_sampling_is_offset_invariant(spark):
    """With keep_every>1, a shared passage at different offsets still
    yields identical kept fingerprints (content-keyed selection), so
    every kept shared window is flagged in both docs."""
    from afspark.operators.text import duplicated_span_stats, rolling_hash_fingerprints

    passage = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [
            (1, "lead tokens here " + passage),
            (2, passage + " trail bits"),
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in duplicated_span_stats(docs, keep_every=4).collect()}
    fps = rolling_hash_fingerprints(docs.select("doc_id", "text"), keep_every=4)
    kept = {}
    for r in fps.collect():
        kept.setdefault(r.fp, set()).add(r.id)
    n_shared = sum(1 for ids in kept.values() if len(ids) == 2)
    assert n_shared > 0
    assert out[1].n_dup_windows == n_shared
    assert out[2].n_dup_windows == n_shared


def test_tfidf_by_source_hand_golden(spark):
    """3 docs / 2 sources: a source-exclusive term outranks a ubiquitous
    one (idf of an everywhere-term is ln(1)=0), and the df/N broadcast
    plan never shuffles the tf side by term twice."""
    import math

    from afspark.operators.text import tfidf_by_source

    docs = spark.createDataFrame(
        [
            (1, "spark spark rows common", "s1"),
            (2, "rows common tables", "s1"),
            (3, "common tables tables", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    out = {(r.source, r.term): r for r in tfidf_by_source(docs).collect()}
    assert ("s1", "spark") in out
    r = out[("s1", "spark")]
    assert (r.tf_docs, r.df_global, r.n_docs) == (1, 1, 3)
    assert r.tfidf == pytest.approx(math.log(3.0))
    assert out[("s1", "common")].tfidf == pytest.approx(0.0)  # df == N
    assert out[("s2", "tables")].tfidf == pytest.approx(math.log(3 / 2))
    # exclusive term appears for its source only
    assert ("s2", "spark") not in out
    plan = tfidf_by_source(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "BroadcastNestedLoopJoin" in plan


def test_pii_stats_and_redact(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org twice a@b.io done"),
            (2, "server at 10.0.255.3 and bad 999.999.999.999 still counted"),
            (3, "call +44 207 946 0958 or +1 555 010 2222"),
            (4, "clean document, no pii at all"),
            (5, "not an ip 1.2.3 nor email a@b nor phone +44 20"),
        ],
        "doc_id long, text string",
    )
    stats = {r.doc_id: r for r in text.pii_stats(docs).collect()}
    assert (stats[1].n_email, stats[1].n_pii) == (2, 2)
    # the regex counts dotted quads syntactically (999... included) —
    # it is a scrub pattern, not a validator
    assert stats[2].n_ipv4 == 2
    assert stats[3].n_phone == 2
    assert stats[4].n_pii == 0
    assert stats[5].n_pii == 0
    red = {r.doc_id: r for r in text.pii_redact(docs).collect()}
    assert "<PII>" not in red[4].text_redacted
    assert red[1].text_redacted.count("<PII>") == 2
    assert "bob.smith" not in red[1].text_redacted
    assert red[4].len_raw == red[4].len_redacted
    assert red[3].len_redacted == red[3].len_raw - len("+44 207 946 0958") - len(
        "+1 555 010 2222"
    ) + 2 * len("<PII>")


def test_quota_sample_two_phase_matches_naive_and_is_monotone(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, "hot" if i < 300 else f"s{i % 7}") for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    picked = text.quota_sample(docs, 20, key_col="source", n_salts=4)
    got = {(r.doc_id, r.source, r.pick_rank if hasattr(r, "pick_rank") else r._rank)
           for r in picked.selectExpr("doc_id", "source", "_rank as pick_rank").collect()}
    # naive single-window reference
    h = text._id_hash_head32("doc_id", "afspark")
    w = Window.partitionBy("source").orderBy(F.col("_h"), "doc_id")
    naive = (
        docs.withColumn("_h", h)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= 20)
    )
    want = {(r.doc_id, r.source, r.pick_rank) for r in naive.collect()}
    assert got == want
    # every key capped; hot key exactly at quota
    by_key = {}
    for _, s, _ in got:
        by_key[s] = by_key.get(s, 0) + 1
    assert by_key["hot"] == 20
    assert all(v <= 20 for v in by_key.values())
    # subset-monotone in quota
    small = {(r.doc_id, r.source) for r in
             text.quota_sample(docs, 5, key_col="source", n_salts=4)
             .select("doc_id", "source").collect()}
    assert small <= {(d, s) for d, s, _ in got}


def test_bm25_hand_golden(spark):
    import math

    from afspark.operators.retrieval import bm25_topk

    rows = [
        (1, "merge merge spark"),       # dl=3, tf(merge)=2, tf(spark)=1
        (2, "merge table table table"), # dl=4, tf(merge)=1
        (3, "table scan scan"),         # no query term
        (4, "spark"),                   # dl=1, tf(spark)=1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in bm25_topk(
        docs, ["merge", "spark"], k=10, min_len=3).collect()}

    n, avgdl = 4, (3 + 4 + 3 + 1) / 4.0
    def idf(df):
        return math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def ts(tf, dl, df, k1=1.2, b=0.75):
        return idf(df) * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def r6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    assert set(out) == {1, 2, 4}  # doc 3 matches nothing
    assert out[1].n_matched == 2 and out[2].n_matched == 1
    assert out[1].score6 == pytest.approx(r6(ts(2, 3, 2) + ts(1, 3, 2)), abs=2e-6)
    assert out[2].score6 == pytest.approx(r6(ts(1, 4, 2)), abs=2e-6)
    assert out[4].score6 == pytest.approx(r6(ts(1, 1, 2)), abs=2e-6)
    # term repeated in a shorter doc must outrank one hit in a longer doc
    assert out[1].score6 > out[2].score6


def test_bm25_partitioning_invariant(spark):
    from afspark.operators.retrieval import bm25_topk

    rows = [(i, ("merge " * (i % 5)) + ("scan " * (i % 3)) + "table")
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = bm25_topk(docs, ["merge", "scan"], k=50).collect()
    b = bm25_topk(docs.repartition(13), ["merge", "scan"], k=50).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_cms_overestimates_and_is_exact_at_wide_width(spark):
    from afspark.operators.sketch import cms_heavy_hitters

    rows = [(i, f"w{i % 17} w{i % 17} filler{i % 5}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # narrow sketch: collisions allowed, but never an underestimate
    narrow = cms_heavy_hitters(docs, depth=4, width=8)
    for r in narrow.collect():
        assert r.est_count >= r.true_count
    # wide sketch: 22 distinct terms into 4x4096 lanes -> no collisions
    wide = cms_heavy_hitters(docs, depth=4, width=4096)
    for r in wide.collect():
        assert r.est_count == r.true_count


def test_cms_merge_equals_single_build(spark):
    from afspark.operators.sketch import cms_build, cms_merge

    rows = [(i, f"t{i % 9}") for i in range(500)]
    items = spark.createDataFrame(rows, "i long, term string")
    whole = cms_build(items, depth=3, width=16)
    half_a = cms_build(items.filter("i < 250"), depth=3, width=16)
    half_b = cms_build(items.filter("i >= 250"), depth=3, width=16)
    merged = cms_merge(half_a, half_b)
    as_set = lambda df: {(r.row, r.bucket, r.cnt) for r in df.collect()}
    assert as_set(merged) == as_set(whole)


def test_lm_unigram_score_hand_golden_and_ranking(spark):
    import math

    from afspark.operators.text import lm_unigram_score

    # 'common' appears 8x, 'rare' once: docs of common tokens must
    # outscore the rare-token doc
    rows = [
        (1, "common common common"),
        (2, "common common common common"),
        (3, "rare common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lm_unigram_score(docs, smoothing=0.5).collect()}

    total, vocab = 9, 2
    lp = {
        "common": math.log((8 + 0.5) / (total + 0.5 * vocab)),
        "rare": math.log((1 + 0.5) / (total + 0.5 * vocab)),
    }
    assert out[1].n_tokens == 3
    assert out[1].avg_logp == pytest.approx(lp["common"], rel=1e-12)
    assert out[2].avg_logp == pytest.approx(lp["common"], rel=1e-12)
    assert out[3].avg_logp == pytest.approx(
        (lp["rare"] + lp["common"]) / 2, rel=1e-12)
    assert out[3].avg_logp < out[1].avg_logp


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    import math

    from afspark.operators.text import weighted_sample

    rows = [(i, 10 if i < 50 else 1000) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(docs, 20, "w").collect()
    # rank formula matches the reference implementation exactly
    import hashlib
    for r in got[:5]:
        hh = int(hashlib.md5(f"afspark-ws:{r.doc_id}".encode()).hexdigest()[:8], 16)
        want = math.log((hh + 1) / 4294967297.0) / r.w
        assert r._rank == pytest.approx(want, rel=1e-12)
    # partitioning invariance
    again = weighted_sample(docs.repartition(11), 20, "w").collect()
    assert [(r.doc_id, r._rank) for r in got] == [(r.doc_id, r._rank) for r in again]
    # heavy rows (100x weight) dominate the sample
    heavy = sum(1 for r in got if r.w == 1000)
    assert heavy >= 15
    # subset-monotone in k (prefix property of a total order)
    small = [r.doc_id for r in weighted_sample(docs, 5, "w").collect()]
    assert small == [r.doc_id for r in got[:5]]
    # zero/negative weights excluded
    bad = spark.createDataFrame([(1, 0), (2, -5)], "doc_id long, w long")
    assert weighted_sample(bad, 10, "w").count() == 0


class TestCrawlSchedule:
    def test_gap_invariant_and_determinism(self, spark):
        rows = [
            (1, "a.com", 100), (2, "a.com", 300), (3, "a.com", 300),
            (4, "b.com", 50),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        from afspark.operators.text import crawl_schedule

        out = crawl_schedule(df, 30, 1000).collect()
        by_dom = {}
        for r in out:
            by_dom.setdefault(r["domain"], []).append(r)
        # per-domain min gap holds
        for rs in by_dom.values():
            ts = sorted(r["fetch_epoch"] for r in rs)
            assert all(b - a >= 30 for a, b in zip(ts, ts[1:]))
        # priority desc, id asc tie-break: 2 before 3 before 1
        a = sorted(by_dom["a.com"], key=lambda r: r["wave"])
        assert [r["doc_id"] for r in a] == [2, 3, 1]
        assert [r["fetch_epoch"] for r in a] == [1000, 1030, 1060]
        assert by_dom["b.com"][0]["fetch_epoch"] == 1000


def test_decontaminate_flags_planted_overlap(spark, docs):
    """Docs sharing any 13-gram with a benchmark example flag; clean docs
    stay at zero; canonicalization makes punctuation/case irrelevant."""
    base = docs.filter(F.col("doc_id") < 80).select("doc_id", "text")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    planted = (
        base.filter(F.col("doc_id") % 10 == 0)
        # UPPERCASE + punctuation noise: canonicalization must see through
        .select(
            F.col("doc_id").alias("bench_id"),
            F.upper(
                F.concat_ws(" ", F.slice(F.split(norm, " "), 2, 13))
            ).alias("text"),
        )
    )
    clean = base.filter(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 9000).alias("bench_id"),
        F.concat(
            F.lit("qq"), F.col("doc_id").cast("string"),
            F.lit(", A1! b2 c3 d4 e5 f6 g7 h8 i9 j0 k1 l2"),
        ).alias("text"),
    )
    out = text.decontaminate(
        base, planted.unionByName(clean), n=13
    ).toPandas().set_index("doc_id")

    # every planted doc with >= 14 canonical tokens must be contaminated
    toks = base.select(
        "doc_id", F.size(F.split(norm, " ")).alias("nt")
    ).toPandas().set_index("doc_id")
    for did in toks.index:
        row = out.loc[did]
        if did % 10 == 0 and toks.loc[did, "nt"] >= 14:
            assert row["n_contaminated"] >= 1
            assert row["n_bench_examples_hit"] >= 1
            assert 0 < row["contamination_frac"] <= 1
        # window-count arithmetic holds for every doc
        assert row["n_windows"] == max(int(toks.loc[did, "nt"]) - 12, 0)
    # the synthetic clean benchmark examples must hit nothing they didn't
    # plant: docs NOT sharing any 13-gram with any benchmark stay zero
    never_planted = out[(out.index % 10 != 0) & (out["n_contaminated"] == 0)]
    assert (never_planted["n_bench_examples_hit"] == 0).all()
    # md5 twin agrees with the xxhash64 scale path
    out2 = text.decontaminate(
        base, planted.unionByName(clean), n=13, hash_mode="md5"
    ).toPandas().set_index("doc_id").sort_index()
    pd.testing.assert_frame_equal(out.sort_index(), out2)


def test_decontaminate_broadcasts_benchmark(spark, docs):
    """The benchmark gram set must enter as a broadcast hash join —
    never a shuffle of the exploded document windows."""
    base = docs.limit(50).select("doc_id", "text")
    bench = base.limit(5).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    plan = text.decontaminate(base, bench)._jdf.queryExecution().executedPlan().toString()
    fp_joins = [
        ln for ln in plan.splitlines()
        if ("Join" in ln or "join" in ln) and "[fp#" in ln
    ]
    assert fp_joins, f"no fp-keyed join in plan:\n{plan}"
    assert all("BroadcastHashJoin" in ln for ln in fp_joins), fp_joins


def test_cluster_survivors_argmax_and_singletons(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}", float(s)) for i, s in
         [(1, 5.0), (2, 9.0), (3, 9.0), (10, 1.0), (11, 2.0), (20, 7.0)]],
        "doc_id long, text string, quality double",
    )
    clusters = spark.createDataFrame(
        # cluster A = {1,2,3} (max quality 9.0 tied between 2 and 3 -> min id 2)
        # cluster B = {10,11} (11 wins); 20 is a singleton
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)],
        "id long, cluster_id long",
    )
    out = dedup.cluster_survivors(docs, clusters, score_col="quality")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {2, 11, 20}
    assert rows[2]["cluster_size"] == 3 and rows[2]["cluster_id"] == 1
    assert rows[11]["cluster_size"] == 2 and rows[11]["cluster_id"] == 10
    assert rows[20]["cluster_size"] == 1 and rows[20]["cluster_id"] == 20
    # survivors keep their full doc row
    assert rows[11]["text"] == "text11" and rows[11]["quality"] == 2.0

    # score_col=None -> min-id representative
    out2 = dedup.cluster_survivors(docs, clusters)
    assert {r["doc_id"] for r in out2.collect()} == {1, 10, 20}

    # no per-cluster sort window anywhere in the plan (map-side
    # combinable aggregates only — the adversarial mega-cluster guard)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_cluster_survivors_string_ids(spark):
    """The API is generic over id_col; a string id (e.g. url) must give
    singletons their OWN id as cluster_id, not a NULL from a long cast."""
    docs = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "url string, quality double"
    )
    clusters = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "id string, cluster_id string"
    )
    out = dedup.cluster_survivors(docs, clusters, score_col="quality", id_col="url")
    rows = {r["url"]: r for r in out.collect()}
    assert set(rows) == {"b", "c"}
    assert rows["b"]["cluster_id"] == "a" and rows["b"]["cluster_size"] == 2
    assert rows["c"]["cluster_id"] == "c" and rows["c"]["cluster_size"] == 1


def test_mixture_weights_and_sample(spark, docs):
    w = text.source_mixture_weights(docs, alpha=0.5, token_budget=10_000)
    pw = w.toPandas()
    assert abs(pw["weight"].sum() - 1.0) < 1e-9
    assert abs(pw["nat_frac"].sum() - 1.0) < 1e-9
    # alpha=1 is natural sampling: weight == nat_frac
    p1 = text.source_mixture_weights(docs, alpha=1.0).toPandas()
    assert np.allclose(p1["weight"], p1["nat_frac"])
    # alpha<1 strictly up-weights the smallest source relative to natural
    smallest = pw.loc[pw["n_tokens"].idxmin()]
    assert smallest["weight"] > smallest["nat_frac"]
    # total target mass == the budget
    assert abs(pw["target_tokens"].sum() - 10_000) < 1e-6

    base = docs.select("doc_id", "source")
    s_small = text.mixture_sample(base, w).toPandas()
    # every source's expected emitted rows ~ rate * n_docs; exactness on
    # the deterministic hash means repeat runs are identical
    s_again = text.mixture_sample(base, w).toPandas()
    pd.testing.assert_frame_equal(
        s_small.sort_values("doc_id").reset_index(drop=True),
        s_again.sort_values("doc_id").reset_index(drop=True),
    )
    # rate-monotonicity: a larger budget's kept-doc set contains the
    # smaller's, and per-doc copies never decrease
    w_big = text.source_mixture_weights(docs, alpha=0.5, token_budget=40_000)
    s_big = text.mixture_sample(base, w_big).toPandas()
    small_copies = dict(zip(s_small["doc_id"], s_small["n_copies"]))
    big_copies = dict(zip(s_big["doc_id"], s_big["n_copies"]))
    assert set(small_copies) <= set(big_copies)
    assert all(big_copies[d] >= c for d, c in small_copies.items())
    # oversampled source (rate > 1) duplicates every doc
    rates = dict(zip(w_big.toPandas()["source"], w_big.toPandas()["rate"]))
    over = [s for s, r in rates.items() if r >= 2]
    for s in over:
        sub = s_big[s_big["source"] == s]
        assert (sub["n_copies"] >= 2).all()

    # plan: weights enter broadcast; no SortMergeJoin / Window anywhere
    plan = text.mixture_sample(base, w)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Window" not in plan


def test_training_manifest_composition_plan(spark, sf_dir):
    """The end-to-end corpus pipeline must stay a single sane plan: no
    cartesian product, the benchmark gram join broadcast, and the
    mixture stage window-free (the only window is exact-dedup's
    per-md5-group row_number)."""
    from afspark.entry_queries import q_training_corpus_manifest

    df = q_training_corpus_manifest(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    fp_joins = [
        ln for ln in plan.splitlines()
        if ("Join" in ln or "join" in ln) and "[fp#" in ln
    ]
    assert fp_joins and all("BroadcastHashJoin" in ln for ln in fp_joins)
    # sanity: every source survives with positive token mass at sf0.001+
    pdf = df.toPandas()
    assert (pdf["tokens_emitted"] > 0).all()
    assert (pdf["n_rows_emitted"] >= pdf["n_docs_kept"]).all()
