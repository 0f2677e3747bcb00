"""Deduplication operators for web-scale document tables.

Engine-side components (graded alongside SURVEY.md §2): exact dedup,
MinHash+LSH near-dup, SimHash, n-gram Jaccard, embedding-cosine near-dup.
These are the scale-path implementations (xxhash64, banded LSH joins);
the oracle-portable twins live in entry_queries.py.

Scale notes
-----------
* Shingling/minhashing is pure Catalyst (explode + xxhash64 + min): stays
  in whole-stage codegen, one shuffle for the per-doc aggregate.
* LSH candidates come from a self-join on (band_id, band_hash) — bucket
  keys are high-cardinality, so the join shuffles evenly; a hot bucket
  (boilerplate text) is capped with ``max_bucket`` to bound the quadratic
  blow-up, which is the standard LSH-at-scale mitigation.
* SimHash is one Arrow pass per partition (numpy bit-twiddling), no
  per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the min-id representative per exact text (md5 grouping).

    Returns the deduplicated documents (one row per distinct text).
    """
    w = W.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def char_shingles(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    hashed: bool = False,
    distinct: bool = True,
) -> DataFrame:
    """Distinct k-char shingles per doc: (id, sh) — pure Catalyst.

    Texts shorter than k yield no shingles (sequence(lo, hi) would
    DESCEND for hi < lo — guarded).

    ``hashed=True`` replaces the k-char string with its xxhash64 BEFORE
    the distinct — the scale path: every downstream shuffle (distinct,
    signature agg, verify joins) moves fixed 8-byte longs instead of
    k-char strings.  Jaccard over hashed shingles equals Jaccard over
    shingles up to a ~n²/2⁶⁴ collision probability.  The string form is
    kept for the DuckDB-portable oracle twin.

    The input is explicitly spread over the cluster before the explode:
    shingling amplifies bytes ~k x, so input-split sizing (which sees
    pre-explode bytes) underestimates the CPU downstream — a handful of
    parquet files would otherwise serialize the whole shingle+minhash
    stage on a handful of tasks.
    """
    n_parts = docs.sparkSession.sparkContext.defaultParallelism * 2
    sh = F.substring("_t", F.col("i"), k)
    if hashed:
        sh = F.xxhash64(sh)
    out = (
        docs.filter(F.length(text_col) >= k)
        .repartition(n_parts)
        .select(
            F.col(id_col).alias("id"),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - (k - 1))).alias("i"),
            F.col(text_col).alias("_t"),
        )
        .select("id", sh.alias("sh"))
    )
    # ``distinct=False`` skips the set-semantics shuffle — the MULTISET is
    # fine for minhash signatures (min is duplicate-invariant), which
    # saves shuffling the full exploded shingle table; consumers that
    # need set semantics (Jaccard intersection/sizes) distinct AFTER
    # pruning to candidate docs, when the table is tiny.
    return out.distinct() if distinct else out


def minhash_signatures(
    shingles: DataFrame, n_hashes: int = 16, hash_mode: str = "xxhash64"
) -> DataFrame:
    """(id, mh: array) — n_hashes seeded min-hashes.

    ``hash_mode``: "xxhash64" (default, JVM-native bigints — the scale
    path) or "md5" (salted md5 hex strings; lexicographic min over
    fixed-length lowercase hex == numeric min, identical in Spark and
    DuckDB, used for the driver oracle).
    """
    if hash_mode == "md5":
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    else:
        # One INDEPENDENT xxhash64 per lane: lane_i = xxhash64(sh, i).
        # NOT Kirsch–Mitzenmacher h1 + i*h2 (lanes share the h2-argmin
        # shingle for large i, so lane matches are heavily correlated and
        # the Jaccard estimate's variance does not shrink with n_hashes —
        # observed: true-0.99 pairs estimating < 0.55 at n=64), and NOT a
        # linear family (a*x+b) mod p either (without 128-bit multiply
        # the product cannot wrap p, leaving every lane monotone in x —
        # ALL lanes then share the min-x argmin, which is worse).  With
        # shingles pre-hashed to 8-byte longs (char_shingles hashed=True)
        # each lane is a fixed-width JVM hash in whole-stage codegen —
        # n_hashes of them stay cheap, unlike n_hashes string hashes.
        aggs = [
            F.min(F.xxhash64(F.col("sh"), F.lit(i))).alias(f"_h{i}")
            for i in range(n_hashes)
        ]
    sig = shingles.groupBy("id").agg(*aggs)
    return sig.select(
        "id", F.array(*[f"_h{i}" for i in range(n_hashes)]).alias("mh")
    )


def minhash_signatures_fused(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_hashes: int = 16,
) -> DataFrame:
    """(id, mh) straight from documents in ONE Arrow pass — the fused
    scale-path twin of ``char_shingles(hashed=True) -> minhash_signatures``.

    The classic pipeline explodes every text into ~len(text) shingle rows
    (an ~8x byte amplification that must be persisted because signature
    AND verify both read it) and then runs a 64-aggregate hash-agg whose
    per-row cost is 64 codegen'd xxhash64 folds + 64 min-buffer updates —
    measured ~55 core-seconds at sf0.1 across the shingle/signature
    stages.  This kernel computes the IDENTICAL signatures (bit-exact
    xxhash64 twins, functions/xxh64.py — lane_i = xxh64(int_lane_i,
    seed=xxh64(shingle_bytes)) exactly like ``xxhash64(sh, lit(i))``)
    with numpy sliding-window hashing + per-doc ``minimum.reduceat``:
    no shingle explode, no shingle shuffle, no wide aggregate.  Docs
    shorter than ``k`` chars emit no signature row (same as the explode
    path).  ASCII docs (byte == char) take the vectorized path; others
    fall back to an exact per-window scalar hash.

    At 100 TB this is the decisive shape change: the corpus is scanned
    once and only (id, 64-long) rows ever shuffle — the 8x-amplified
    shingle table never exists.
    """
    from ..functions.xxh64 import (
        xxh64_ascii_sliding,
        xxh64_buf,
        xxh64_int,
        xxh64_longs,
    )

    spark = docs.sparkSession
    id_type = {f.name: f.dataType.simpleString() for f in docs.schema.fields}[
        id_col
    ]
    # pre-spread like char_shingles: the scan sees pre-kernel bytes and
    # would otherwise run the CPU-bound hashing on a handful of tasks.
    # One wave (defaultParallelism, not x2): each mapInPandas task pays a
    # fixed Arrow-stream handshake, and the kernel's per-byte cost is low
    # enough that wave-count overhead beats skew smoothing here.
    n_parts = spark.sparkContext.defaultParallelism
    src = (
        docs.filter(F.length(text_col) >= k)
        .repartition(n_parts)
        .select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    )

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids: list = []
            sigs: list[np.ndarray] = []
            for did, t in zip(pdf["id"], pdf["_t"]):
                b = t.encode("utf-8")
                if len(b) == len(t):
                    sh = xxh64_ascii_sliding(np.frombuffer(b, np.uint8), k)
                else:
                    nw = len(t) - k + 1
                    if nw <= 0:
                        continue
                    sh = np.fromiter(
                        (
                            xxh64_buf(t[i : i + k].encode("utf-8"))
                            for i in range(nw)
                        ),
                        np.int64,
                        nw,
                    )
                if not len(sh):
                    continue
                ids.append(did)
                sigs.append(sh)
            if not ids:
                continue
            lens = np.array([len(s) for s in sigs])
            starts = np.concatenate(([0], np.cumsum(lens[:-1])))
            allsh = np.concatenate(sigs)
            # xxhash64(sh, lit(i)) folds left-to-right from seed 42:
            # inner = hashLong(sh, 42), lane_i = hashInt(i, inner)
            inner = xxh64_longs(allsh.view(np.uint64)).view(np.uint64)
            mh = np.empty((len(ids), n_hashes), dtype=np.int64)
            for lane in range(n_hashes):
                mh[:, lane] = np.minimum.reduceat(xxh64_int(lane, inner), starts)
            yield pd.DataFrame({"id": ids, "mh": list(mh)})

    return src.mapInPandas(gen, f"id {id_type}, mh array<bigint>")


def band_signatures(
    signatures: DataFrame,
    bands: int = 4,
    band_rows: int | None = None,
    n_hashes: int | None = None,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(id, band, bh) — banded bucket keys from minhash signatures.

    The shareable half of LSH: the self-join variant
    (lsh_candidate_pairs) and the incremental batch-vs-index variant
    (incremental_dedup_pairs) both consume this, and build_lsh_index
    persists it as the corpus signature index.
    """
    n = (
        n_hashes
        if n_hashes is not None
        else signatures.select(F.size("mh")).first()[0]
    )
    rows_per_band = band_rows if band_rows is not None else n // bands
    if bands * rows_per_band > n:
        raise ValueError("bands * band_rows exceeds signature length")

    def _band_hash(b):
        cols = [
            F.col("mh")[i]
            for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        if hash_mode == "md5":
            return F.md5(F.concat_ws(",", *cols))
        return F.xxhash64(*cols)

    return signatures.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _band_hash(b).alias("bh"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    max_bucket: int = 200,
    n_hashes: int | None = None,
    hash_mode: str = "xxhash64",
    band_rows: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b) from minhash signatures.

    Buckets larger than ``max_bucket`` are dropped (boilerplate guard) —
    at 100TB a single degenerate bucket would otherwise emit |bucket|^2
    pairs.  Dropped buckets are a recall/robustness tradeoff, the standard
    production mitigation.

    ``band_rows`` fixes the rows per band independently of the signature
    length (default n // bands).  This decouples BANDING (recall curve:
    1-(1-j^r)^b — r must stay small for recall at moderate thresholds)
    from the signature length, which the ESTIMATE pre-filter wants LARGE
    for low variance.  Banding then uses only the first bands*band_rows
    signature entries.

    Pass ``n_hashes`` (the signature length) so plan construction stays
    lazy; the ``.first()`` fallback launches a Spark job mid-plan and is
    kept only for ad-hoc use.
    """
    banded = band_signatures(signatures, bands, band_rows, n_hashes, hash_mode)
    # Hot-bucket cap via hash-agg + broadcast anti-join instead of a
    # count() window: the window forced a sort of the full banded set by
    # (band, bh); the aggregate is map-side combinable and the hot list
    # (boilerplate buckets) is tiny, so the cap costs one small shuffle +
    # a narrow broadcast join.  The signature aggregate's exchange is
    # reused across both branches (ReusedExchange).
    hot = (
        banded.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") > max_bucket)
        .select("band", "bh")
    )
    sized = banded.join(F.broadcast(hot), ["band", "bh"], "left_anti")
    a = sized.alias("a")
    b = sized.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _jaccard_verify_rows(
    pairs: DataFrame, pruned: DataFrame, sizes: DataFrame, threshold: float
) -> DataFrame:
    """Row-join Jaccard (the round-3 form): joins exploded (id, sh) rows
    and re-aggregates matches.  More shuffles than the array form but no
    per-row memory bound — kept as the fallback for oversized docs."""
    sa = pruned.select(F.col("id").alias("id_a"), "sh")
    sb = pruned.select(F.col("id").alias("id_b"), "sh")
    inter = (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_i"))
    )
    za = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("_za"))
    zb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("_zb"))
    return (
        inter.join(za, "id_a")
        .join(zb, "id_b")
        .withColumn(
            "jaccard", F.col("_i") / (F.col("_za") + F.col("_zb") - F.col("_i"))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def jaccard_verify(
    candidates: DataFrame,
    shingles: DataFrame,
    threshold: float = 0.7,
    distinct_shingles: bool = True,
    max_array_shingles: int = 1 << 20,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only (the LSH contract).

    Shingles are first semi-join-pruned to docs that appear in a
    candidate pair, then packed into ONE SORTED ARRAY per doc; the pair
    intersection is Catalyst's array_intersect (set semantics) — no
    shingle-keyed join, no per-pair aggregation shuffle.  The verify
    then costs: one scan of the shingle table (pruned at the semi-join),
    one tiny groupBy over candidate docs, and two equi-joins that move
    each candidate doc's packed array once.  The round-3 form joined
    exploded shingle ROWS on (id, sh) and re-aggregated the matches —
    same bytes, three more shuffles.

    The packed array introduces a per-ROW memory shape the row join did
    not have, so docs with more than ``max_array_shingles`` distinct
    shingles (default 2^20 ~ 8 MB of longs — an outlier multi-MB page
    that slipped through the LSH band filter) are routed through the
    row-join fallback instead; pairs touching no oversized doc keep the
    array path.  Results are identical either way.

    ``distinct_shingles=False`` declares the input may hold duplicate
    (id, sh) rows (char_shingles distinct=False); the distinct then runs
    AFTER the prune, on candidate docs only.
    """
    ids = (
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    pruned = shingles.join(F.broadcast(ids), "id", "left_semi")
    if not distinct_shingles:
        pruned = pruned.distinct()
    # pruned feeds sizes, the array build, AND both sides of the row-join
    # fallback — without a persist each branch re-scans the FULL shingle
    # table for the semi-join.  It holds candidate docs only (tiny next
    # to the corpus); lifetime is the caller's materialization, reclaimed
    # by the ContextCleaner afterwards (minhash_lsh_dedup_pairs
    # localCheckpoints its result, releasing this promptly).
    from pyspark import StorageLevel

    pruned = pruned.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = pruned.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    # the oversized-doc check is an ACTUAL (cheap) action over the cached
    # candidate-doc sizes rather than a speculative plan branch: carrying
    # an always-present fallback subplan (union + anti/semi joins) taxed
    # the common no-big-docs case ~2-3x in wall time, and AQE cannot
    # prune it early enough
    big_ids = [
        r.id
        for r in sizes.filter(F.col("sz") > max_array_shingles)
        .select("id")
        .collect()
    ]

    def _array_path(pairs: DataFrame, docs_shingles: DataFrame) -> DataFrame:
        arrs = docs_shingles.groupBy("id").agg(
            F.sort_array(F.collect_list("sh")).alias("shs")
        )
        aa = arrs.select(F.col("id").alias("id_a"), F.col("shs").alias("_sa"))
        ab = arrs.select(F.col("id").alias("id_b"), F.col("shs").alias("_sb"))
        inter = F.size(F.array_intersect("_sa", "_sb"))
        return (
            pairs.join(aa, "id_a")
            .join(ab, "id_b")
            .withColumn("_i", inter)
            .withColumn(
                "jaccard",
                F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    if not big_ids:
        return _array_path(candidates, pruned)
    is_big = F.col("id_a").isin(big_ids) | F.col("id_b").isin(big_ids)
    out_small = _array_path(
        candidates.filter(~is_big), pruned.filter(~F.col("id").isin(big_ids))
    )
    out_big = _jaccard_verify_rows(
        candidates.filter(is_big), pruned, sizes, threshold
    )
    return out_small.unionByName(out_big)


def _jaccard_verify_fused(
    cand: DataFrame,
    cand_docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    threshold: float,
    big_bytes: int = 4 << 20,
) -> DataFrame:
    """Exact candidate-pair Jaccard in one Arrow kernel (fused path).

    The generic :func:`jaccard_verify` costs a candidate-shingle explode
    + distinct + persist + sizes + two array joins (~6 shuffles and a
    deep serial job chain).  With candidates already doc-pruned, the
    same numbers come from joining each pair with its two TEXTS (both
    joins broadcast — cand and cand_docs are tiny next to the corpus)
    and hashing the shingle sets in numpy: per batch, each doc's sorted
    unique xxhash64 shingle set is computed once (memoized across the
    pairs that share it) and |A∩B| / |A∪B| is exact integer arithmetic
    + one IEEE division — identical values to the array_intersect plan
    (same hashes via functions/xxh64.py, same distinct semantics, same
    division).

    Pairs touching a doc larger than ``big_bytes`` keep the classic
    row-join verify (bounded per-row memory), mirroring the
    ``max_array_shingles`` escape hatch of the array path.
    """
    from ..functions.xxh64 import xxh64_ascii_sliding, xxh64_buf

    spark = cand.sparkSession
    texts = cand_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("_t")
    )
    big_ids = [
        r.id
        for r in texts.filter(F.octet_length("_t") > big_bytes)
        .select("id")
        .collect()
    ]
    ta = texts.select(F.col("id").alias("id_a"), F.col("_t").alias("_ta"))
    tb = texts.select(F.col("id").alias("id_b"), F.col("_t").alias("_tb"))
    pairs = cand
    outs = []
    if big_ids:
        is_big = F.col("id_a").isin(big_ids) | F.col("id_b").isin(big_ids)
        sh_big = char_shingles(
            cand_docs, text_col, id_col, k, hashed=True, distinct=False
        )
        outs.append(
            jaccard_verify(
                pairs.filter(is_big), sh_big, threshold, distinct_shingles=False
            )
        )
        pairs = pairs.filter(~is_big)
    n_parts = spark.sparkContext.defaultParallelism
    joined = (
        pairs.join(F.broadcast(ta), "id_a")
        .join(F.broadcast(tb), "id_b")
        .repartition(n_parts)
    )
    id_type = {f.name: f.dataType.simpleString() for f in cand_docs.schema.fields}[
        id_col
    ]

    def kern(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cache: dict = {}

            def shingle_set(did, t):
                a = cache.get(did)
                if a is None:
                    b = t.encode("utf-8")
                    if len(b) == len(t):
                        h = xxh64_ascii_sliding(np.frombuffer(b, np.uint8), k)
                    else:
                        nw = max(0, len(t) - k + 1)
                        h = np.fromiter(
                            (
                                xxh64_buf(t[i : i + k].encode("utf-8"))
                                for i in range(nw)
                            ),
                            np.int64,
                            nw,
                        )
                    a = np.unique(h)
                    cache[did] = a
                return a

            jac = np.empty(len(pdf), dtype=np.float64)
            for r, (ia, ib, sa, sb) in enumerate(
                zip(pdf["id_a"], pdf["id_b"], pdf["_ta"], pdf["_tb"])
            ):
                A = shingle_set(ia, sa)
                B = shingle_set(ib, sb)
                inter = len(np.intersect1d(A, B, assume_unique=True))
                union = len(A) + len(B) - inter
                jac[r] = inter / union if union else 0.0
            yield pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard": jac}
            )

    kern_out = joined.mapInPandas(
        kern, f"id_a {id_type}, id_b {id_type}, jaccard double"
    ).filter(F.col("jaccard") >= threshold)
    outs.append(kern_out)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def minhash_lsh_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_hashes: int = 64,
    bands: int = 4,
    band_rows: int | None = None,
    threshold: float = 0.7,
    hash_mode: str = "xxhash64",
    est_margin: float | None = 0.125,
    hashed_shingles: bool = True,
) -> DataFrame:
    """End-to-end near-dup pairs: shingle -> minhash -> LSH -> verify.

    ``est_margin``: before the exact verify, candidates are pre-filtered
    by the minhash ESTIMATE of Jaccard (matching-signature fraction,
    already computed — two cheap joins instead of a shingle-set join),
    keeping pairs with estimate >= threshold - est_margin.  On
    boilerplate-heavy corpora LSH bands emit many low-similarity
    candidates; the estimate kills them before they hit the expensive
    exact join.  ``None`` disables (pure LSH -> exact verify, the
    oracle twin).

    Defaults are tuned jointly: banding stays 4x4 (recall at j=0.7:
    1-(1-0.7^4)^4 ~ 0.67 per band curve — the s-curve centered at
    (1/4)^(1/4)=0.707), while the SIGNATURE is 64 hashes so the estimate
    has sigma = sqrt(j(1-j)/64) ~ 0.057 at j=0.7; margin 0.125 ~ 2.2
    sigma keeps P[drop | j=0.7] < 2% yet kills the j<=0.5 candidate bulk
    (P[pass | j=0.5] ~ 1%) that previously dominated the exact-verify
    join.  K-M double hashing makes the 64 aggregates integer ops, not
    64 xxhash evaluations.
    """
    from pyspark import StorageLevel

    if band_rows is None:
        # cap rows/band at 4 regardless of signature length: the banding
        # s-curve centers at (1/bands)^(1/rows) ~ 0.71 for 4x4; letting
        # rows grow with n_hashes would collapse recall at j ~ 0.7
        band_rows = min(4, n_hashes // bands)
    # hashed shingles only on the xxhash64 scale path — the md5 oracle
    # twin must keep string shingles DuckDB can md5 identically
    hashed = hashed_shingles and hash_mode == "xxhash64"

    # Scale path: signatures come from the FUSED Arrow kernel (one corpus
    # scan, no shingle explode/persist — see minhash_signatures_fused);
    # the exact verify later shingles ONLY candidate docs.  The md5
    # oracle twin keeps the classic explode + aggregate pipeline, whose
    # exploded shingle table is persisted because signature AND verify
    # both read it (without persist each branch recomputes the explode —
    # measured ~4x the total work at sf0.1).  distinct=False: signatures
    # are duplicate-invariant (min over the multiset == min over the
    # set); the verify applies distinct AFTER pruning to candidate docs
    # (distinct_shingles=False below).
    sh = None
    if hashed:
        sig = minhash_signatures_fused(docs, text_col, id_col, k, n_hashes)
    else:
        sh = char_shingles(
            docs, text_col, id_col, k, hashed=hashed, distinct=False
        ).persist(StorageLevel.MEMORY_AND_DISK)
        sig = minhash_signatures(sh, n_hashes, hash_mode=hash_mode)
    sig = sig.persist(StorageLevel.MEMORY_AND_DISK)
    # Pin the signature cache EAGERLY: sig fans out into >= 4 branches
    # (two banded self-join sides, hot-bucket aggregate, both estimate
    # join sides), and several of them start as CONCURRENT broadcast
    # jobs under AQE — racing a cold cache, each branch recomputed the
    # whole signature kernel (observed: the 64-task kernel stage ran 3x
    # per invocation).  One count() materializes it once, serially.
    sig.count()
    cand = lsh_candidate_pairs(
        sig, bands, n_hashes=n_hashes, hash_mode=hash_mode, band_rows=band_rows
    )
    if est_margin is not None:
        cutoff = threshold - est_margin
        siga = sig.select(F.col("id").alias("id_a"), F.col("mh").alias("_mha"))
        sigb = sig.select(F.col("id").alias("id_b"), F.col("mh").alias("_mhb"))
        est = F.aggregate(
            F.zip_with("_mha", "_mhb", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, x: acc + x,
        ) / F.lit(n_hashes)
        cand = (
            cand.join(siga, "id_a")
            .join(sigb, "id_b")
            .filter(est >= cutoff)
            .select("id_a", "id_b")
        )
    cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
    cand.count()  # same cache-race pinning as sig above (3 consumers)
    if sh is None:
        # fused path: the exact verify joins each pair with its two
        # TEXTS (doc-pruned first — the candidate set is tiny next to
        # the corpus, so the corpus is scanned exactly twice: signatures
        # + this prune) and hashes shingle sets in the Arrow kernel —
        # no candidate-shingle explode/persist at all
        cand_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .unionByName(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        # persist: the candidate docs feed the oversize check AND both
        # text-join broadcast sides — without it the corpus semi-join
        # scan runs three times
        cand_docs = docs.join(F.broadcast(cand_ids), id_col, "left_semi").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        out = _jaccard_verify_fused(
            cand, cand_docs, text_col, id_col, k, threshold
        )
    else:
        cand_docs = None
        out = jaccard_verify(cand, sh, threshold, distinct_shingles=False)
    # Materialize (the pair set is tiny) so the persisted intermediates
    # can be released NOW — otherwise sh/sig/cand accumulate in executor
    # storage across invocations in a long-lived session.
    out = out.localCheckpoint()
    for df in (cand, sig, sh, cand_docs):
        if df is not None:
            df.unpersist()
    return out


SIMHASH_SCHEMA = "id long, simhash long"


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per doc — one vectorized Arrow pass per partition.

    The whole batch's tokens are hashed in ONE concatenated byte buffer
    (no per-document Python loop): each doc is normalized to a single-
    space-joined token string, all docs are joined with a space, and the
    buffer is split on byte 0x20 — valid because tokens from str.split()
    contain no whitespace and 0x20 in UTF-8 occurs ONLY as the space
    character (continuation bytes are >= 0x80).  FNV-1a then sweeps the
    (tokens x maxlen) padded matrix column-wise across ALL tokens of the
    batch at once; per-doc votes come from one add.reduceat over doc
    boundaries.  Tokens are length-sorted into bounded slices so one
    pathological long token cannot blow up the padded matrix.

    Matches the round-3 per-doc implementation bit-for-bit, including
    its quirk that a NUL byte terminates a token's hash early (the pad
    value doubles as the live mask).
    """
    src = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))

    def _fnv_tokens(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """FNV-1a 64-bit of each token (slice of buf), padded-matrix sweep
        over a length-sorted slice at a time.

        Transient memory is bounded per slice at allocator-arena scale
        (~0.5 MB pad matrix, int32 gather indices — batch text buffers
        are far below 2^31 bytes), so peak transients stay a few MB per
        task regardless of batch size or the longest token, and the
        allocations recycle arena pages instead of faulting fresh mmap
        pages (this host's first-touch bandwidth drops to ~10 MB/s under
        pressure; see simhash64's vote-chunk comment).  Length-sorted
        slicing keeps the per-slice column sweep short for the
        normal-token bulk while isolating pathological long tokens in
        their own tiny slices.  (A fully matrix-free column-at-a-time
        gather was tried and measured ~4x slower: one O(live)-sized
        allocation per column per BATCH loses to the slice-local
        matrix's locality.)"""
        n = len(starts)
        hs = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
        order = np.argsort(lengths, kind="stable")
        budget = 512 * 1024
        i = 0
        with np.errstate(over="ignore"):
            while i < n:
                # grow the slice while padded size stays in budget
                j = i + 1
                while j < n and (j - i + 1) * int(lengths[order[j]]) <= budget:
                    j += 1
                sl = order[i:j]
                L = int(lengths[sl].max()) if len(sl) else 0
                arr = np.zeros((len(sl), L), dtype=np.uint8)
                idx = (
                    starts[sl, None].astype(np.int32)
                    + np.arange(L, dtype=np.int32)[None, :]
                )
                m = np.arange(L)[None, :] < lengths[sl, None]
                arr[m] = buf[idx[m]]
                h = np.full(len(sl), 0xCBF29CE484222325, dtype=np.uint64)
                for c in range(L):
                    live = arr[:, c] != 0
                    h[live] = (h[live] ^ arr[live, c]) * np.uint64(0x100000001B3)
                hs[sl] = h
                i = j
        return hs

    def compute(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            n_docs = len(pdf)
            out = np.zeros(n_docs, dtype=np.int64)
            parts: list[str] = []
            tok_counts = np.zeros(n_docs, dtype=np.int64)
            for i, t in enumerate(pdf["t"]):
                toks = t.split()
                tok_counts[i] = len(toks)
                if toks:
                    parts.append(" ".join(toks))
            nonempty = np.flatnonzero(tok_counts > 0)
            if len(nonempty):
                buf = np.frombuffer(" ".join(parts).encode(), dtype=np.uint8)
                sp = np.flatnonzero(buf == 32)
                starts = np.concatenate(([0], sp + 1))
                ends = np.concatenate((sp, [len(buf)]))
                lengths = ends - starts
                hs = _fnv_tokens(buf, starts, lengths)
                # votes = 2*sum(bits) - n_tokens, doc segments reduced in
                # SMALL chunks (~8k tokens, aligned to doc boundaries).
                # Chunk size is deliberately arena-scale, not cache-scale:
                # the (tokens x 64) expansion allocates the same TOTAL
                # bytes regardless of chunking, but ~4 MB chunks reuse
                # allocator arena pages while ~64 MB chunks go to fresh
                # mmap pages — and on this host first-touch faults run as
                # low as 10 MB/s (measured: the 128k-token version was 4x
                # slower under memory pressure, equal when healthy).
                nn = len(nonempty)
                bounds = np.concatenate(([0], np.cumsum(tok_counts[nonempty])))
                S = np.zeros((nn, 64), dtype=np.int64)
                bitpos = np.arange(64, dtype=np.uint64)
                CH = 1 << 13
                i = 0
                while i < nn:
                    j = int(np.searchsorted(bounds, bounds[i] + CH, side="right")) - 1
                    j = max(j, i + 1)
                    t0, t1 = int(bounds[i]), int(bounds[j])
                    bits = (
                        (hs[t0:t1, None] >> bitpos) & np.uint64(1)
                    ).astype(np.int32)
                    S[i:j] = np.add.reduceat(bits, bounds[i:j] - t0, axis=0)
                    i = j
                votes = 2 * S - tok_counts[nonempty][:, None]
                sh = (
                    (votes > 0).astype(np.uint64)
                    << bitpos[None, :]
                ).sum(axis=1)
                out[nonempty] = sh.astype(np.int64)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "simhash": out})

    return src.mapInPandas(compute, SIMHASH_SCHEMA)


def simhash_near_pairs(simhashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by Hamming distance, 4-block LSH on the 64-bit hash.

    Pigeonhole: any pair within Hamming distance 3 shares at least one of
    four 16-bit blocks exactly — join on (block_idx, block_value).
    """
    blocks = simhashes.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select("id", "simhash", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.bi") == F.col("b.bi"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return cand.select(
        "id_a", "id_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    seed: int = 42,
    dim: int | None = None,
    bands: int = 1,
) -> DataFrame:
    """Embedding-cosine near-dups via random-hyperplane LSH + exact verify.

    ``bands=1`` (default): pairs agreeing on ALL n_planes sign bits are
    candidates (single bucket key -> one shuffle); exact cosine filters
    them.  Recall at 16 planes is only ~8% per pair at cos 0.9 — fine
    for catching SOME of a large duplicate cluster, weak for pairwise
    guarantees.

    ``bands>1``: minhash-style banding — ``bands`` independent groups of
    ``n_planes`` hyperplanes each; a pair is a candidate if ANY band's
    signature matches (equi-join on (band, sig), one shuffle).  At
    bands=4, n_planes=8: P[candidate | cos .9] = 1-(1-p^8)^4 ~ 0.79 with
    p = 1-acos(.9)/pi, vs 0.08 for the single 16-bit signature.  The
    exact verify keeps precision at 100%.

    Pass ``dim`` (embedding dimensionality) to keep plan construction
    lazy; the ``.first()`` fallback launches a Spark job mid-plan.
    """
    if dim is None:
        dim = emb.select(F.size(vec_col)).first()[0]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(bands * n_planes, dim))
    e = emb.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double")).alias("v"),
    )

    def _band_sig(band: int):
        sig_expr = None
        for p_i in range(n_planes):
            plane = planes[band * n_planes + p_i]
            dot = F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(x)) for x in plane]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bit = F.when(dot > 0, F.lit(1 << p_i)).otherwise(F.lit(0))
            sig_expr = bit if sig_expr is None else (sig_expr + bit)
        return sig_expr

    sig = e.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), _band_sig(b).alias("sig"))
                    for b in range(bands)
                ]
            )
        ).alias("bs"),
    ).select("id", "v", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a, b = sig.alias("a"), sig.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.sig") == F.col("b.sig"))
        & (F.col("a.id") < F.col("b.id")),
    )
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    cos = dot / (norm(F.col("a.v")) * norm(F.col("b.v")))
    out = (
        cand.select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), cos.alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    # a pair matching in several bands appears once per band; cos_sim is
    # deterministic per pair, so a plain distinct dedups the output
    return out.distinct() if bands > 1 else out


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): every node connects its strictly-larger
    neighbors to the minimum of its closed neighborhood."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("u"), F.col("_mv")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star round: orient edges large->small, then each node links
    its (all-smaller) neighborhood plus itself to the neighborhood min."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    linked = oriented.join(mins, "u").select(
        F.explode(
            F.array(
                F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
            )
        ).alias("e")
    ).select("e.u", "e.v")
    return linked.filter(F.col("u") != F.col("v")).distinct()


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    return_rounds: bool = False,
):
    """Connected components via alternating large-star/small-star.

    The O(log n)-round algorithm for ADVERSARIAL graphs (long chains,
    high-diameter components) where plain neighbor propagation needs
    O(diameter) rounds.  Each round is two groupBy-min aggregates and two
    equi-joins — the same shuffle shape as the propagation loop in
    connected_components, which remains the default for near-dup graphs
    (dense local clumps, diameter 2-4, fewer rounds in practice).

    Convergence is detected by an order-independent edge-set checksum
    (count + bit_xor of edge hashes — overflow-safe under ANSI).
    Returns (id, cluster_id = min id in component); with
    ``return_rounds=True`` returns (labels, rounds) for bound tests.
    """
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    prev = None
    rounds = 0
    for _ in range(max_iter):
        # localCheckpoint truncates the doubling iterative lineage
        edges = _small_star(_large_star(edges)).localCheckpoint()
        rounds += 1
        chk = tuple(
            edges.agg(
                F.count(F.lit(1)), F.bit_xor(F.xxhash64("u", "v"))
            ).first()
        )
        if chk == prev:
            break
        prev = chk
    nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
    )
    labels = nodes.join(
        edges.select(F.col("u").alias("id"), F.col("v").alias("_lbl")).distinct(),
        "id",
        "left",
    ).select("id", F.coalesce(F.col("_lbl"), F.col("id")).alias("cluster_id"))
    if return_rounds:
        return labels, rounds
    return labels


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Near-dup clusters from a pair list: (id, cluster_id=min id in
    component) via iterative min-label propagation.

    Each iteration joins labels across symmetric edges and takes the
    per-node min; converges in O(component diameter) rounds — near-dup
    graphs are dense local clumps, so diameter is small (2-4).  Every
    round is one join + one hash agg; labels persist between rounds and
    the loop exits on a zero-changes check (one lightweight count per
    round).  For adversarial long-chain graphs at 100TB the alternating
    large-star/small-star variant (Kiveris et al., "Connected Components
    in MapReduce") bounds rounds by O(log n); the propagation loop below
    shares its join shape, so swapping it in is mechanical.
    """
    from pyspark import StorageLevel

    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for _ in range(max_iter):
        # (a) min over neighbors' labels
        nbr = sym.join(
            labels.select(F.col("id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("id"), "label")
        stepped = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # (b) pointer jumping: label <- label's label; combined with (a)
        # this converges in O(log n) rounds even on long chains, where
        # pure neighbor propagation needs O(diameter).
        new = (
            stepped.alias("x")
            .join(
                stepped.select(
                    F.col("id").alias("_pid"), F.col("label").alias("_plabel")
                ),
                F.col("x.label") == F.col("_pid"),
                "left",
            )
            .select(
                F.col("x.id").alias("id"),
                F.coalesce(F.col("_plabel"), F.col("x.label")).alias("label"),
            )
            # localCheckpoint truncates the lineage: the iterative plan
            # otherwise references the previous round's DataFrame through
            # two paths and DOUBLES in size every round (optimizer time
            # explodes after ~10 rounds)
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        stepped.unpersist()
        labels.unpersist()
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("id", F.col("label").alias("cluster_id"))


def build_lsh_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_hashes: int = 64,
    bands: int = 4,
    band_rows: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """The corpus signature index: (id, band, bh) — what a production
    pipeline PERSISTS (parquet bucketed by (band, bh)) so that each new
    crawl batch dedups against the whole history WITHOUT touching the
    historical text again.  ~bands rows of 3 small columns per document
    regardless of document size."""
    hashed = hash_mode == "xxhash64"
    if hashed:
        # fused Arrow signature kernel: one corpus scan, no shingle
        # explode (identical signatures — see minhash_signatures_fused)
        sig = minhash_signatures_fused(docs, text_col, id_col, k, n_hashes)
    else:
        sh = char_shingles(docs, text_col, id_col, k, hashed=hashed, distinct=False)
        sig = minhash_signatures(sh, n_hashes, hash_mode)
    return band_signatures(sig, bands, band_rows, n_hashes, hash_mode)


def incremental_dedup_pairs(
    index: DataFrame,
    corpus_docs: DataFrame,
    batch_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    n_hashes: int = 64,
    bands: int = 4,
    band_rows: int = 4,
    threshold: float = 0.7,
    hash_mode: str = "xxhash64",
    max_bucket: int = 200,
) -> DataFrame:
    """Near-dup pairs between a NEW batch and the EXISTING corpus — the
    daily-crawl shape: dedup today's pages against the whole history
    without recomputing anything corpus-sized.

    Candidate generation joins the batch's banded signatures against the
    persisted ``index`` (build_lsh_index) — an equi-join on (band, bh)
    whose corpus side is a plain index scan: NO corpus self-join, NO
    corpus re-shingling.  Corpus text is then re-read ONLY for candidate
    documents (broadcast semi-join prune BEFORE shingling) and verified
    with the standard exact-Jaccard contract (jaccard_verify).  Work
    scales with |batch| + |candidates|, never |corpus|, except the index
    scan itself — which a (band, bh)-bucketed store turns into a
    co-located join.  Equivalence with the batch-vs-corpus slice of the
    full self-join pipeline is asserted in tests/test_dedup_incr.py.

    Hot (boilerplate) buckets are capped on the UNION of index + batch
    occupancy, mirroring lsh_candidate_pairs' guard: a degenerate bucket
    would otherwise emit |bucket|² pairs.  ``id`` values must be unique
    across corpus and batch.
    """
    from pyspark import StorageLevel

    hashed = hash_mode == "xxhash64"
    bsh = None
    if hashed:
        # fused Arrow signature kernel (identical signatures, no batch
        # shingle explode/persist — see minhash_signatures_fused)
        bsig = minhash_signatures_fused(batch_docs, text_col, id_col, k, n_hashes)
    else:
        bsh = char_shingles(batch_docs, text_col, id_col, k, hashed=hashed,
                            distinct=False).persist(StorageLevel.MEMORY_AND_DISK)
        bsig = minhash_signatures(bsh, n_hashes, hash_mode)
    # The DAG below branches like the self-join pipeline: bband feeds the
    # hot-bucket occupancy AND the candidate join; cand feeds the verify
    # AND the corpus-prune broadcast.  Unpersisted, every branch replays
    # the batch shingle->minhash->band subtree (measured 187 s -> 16 s at
    # 50k docs with a 250-doc boilerplate cluster once persisted).  The
    # eager count pins the cache before AQE's concurrent broadcast jobs
    # race it (each miss re-ran the signature kernel — same fix as
    # minhash_lsh_dedup_pairs).
    bband = band_signatures(bsig, bands, band_rows, n_hashes, hash_mode).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    bband.count()

    occupancy = index.select("band", "bh").unionAll(bband.select("band", "bh"))
    hot = (
        occupancy.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("_sz"))
        .filter(F.col("_sz") > max_bucket)
        .select("band", "bh")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    idx_cold = index.join(F.broadcast(hot), ["band", "bh"], "left_anti")
    b_cold = bband.join(F.broadcast(hot), ["band", "bh"], "left_anti")

    cand = (
        b_cold.select("band", "bh", F.col("id").alias("_bid"))
        .join(idx_cold.select("band", "bh", F.col("id").alias("_cid")),
              ["band", "bh"])
        .filter(F.col("_bid") != F.col("_cid"))
        .select(
            F.least("_bid", "_cid").alias("id_a"),
            F.greatest("_bid", "_cid").alias("id_b"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .unionByName(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = None
    if hashed:
        # fused exact verify over pair texts (batch ∪ corpus, candidate-
        # pruned) — no shingle explode at all; identical jaccard values
        docs_all = batch_docs.select(F.col(id_col), F.col(text_col)).unionByName(
            corpus_docs.select(F.col(id_col), F.col(text_col))
        )
        cand_docs = docs_all.join(F.broadcast(cand_ids), id_col, "left_semi").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        out = _jaccard_verify_fused(cand, cand_docs, text_col, id_col, k, threshold)
    else:
        pruned_corpus = corpus_docs.join(F.broadcast(cand_ids), id_col, "left_semi")
        csh = char_shingles(pruned_corpus, text_col, id_col, k, hashed=hashed,
                            distinct=False)
        all_sh = bsh.unionByName(csh)
        out = jaccard_verify(cand, all_sh, threshold, distinct_shingles=False)
    # materialize (pair set is tiny) so the intermediates release now
    out = out.localCheckpoint()
    for df in (cand, hot, bband, bsh, cand_docs):
        if df is not None:
            df.unpersist()
    return out


def cluster_survivors(
    docs: DataFrame,
    clusters: DataFrame,
    score_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep ONE document per near-dup cluster — the final acting step of
    fuzzy dedup (RefinedWeb/Gopher keep a single representative per
    MinHash cluster): the max-``score_col`` member, ties broken to the
    min id; ``score_col=None`` keeps the min-id member.  Documents
    absent from ``clusters`` are singletons and pass through on a
    join-light anti path.

    ``clusters`` is ``(id, cluster_id)`` as produced by
    :func:`connected_components` / :func:`connected_components_star`.
    Output: the surviving ``docs`` rows plus ``cluster_id`` (a
    singleton's own id) and ``cluster_size``.

    Plan shape at 100 TB: selection is max -> filter -> min, all plain
    hash aggregates with MAP-SIDE partials keyed on cluster_id — no
    per-cluster sort window, so an adversarial mega-cluster (site
    boilerplate) costs O(|cluster|) combine work, never a single-task
    sort of the whole cluster.  Only cluster MEMBERS (a small fraction
    of the corpus) enter the aggregate path; the singleton majority
    takes one left_anti join keyed on the doc id.
    """
    member_ids = clusters.select(F.col("id").alias(id_col))
    if score_col is None:
        labeled = docs.select(id_col).join(
            clusters.withColumnRenamed("id", id_col), id_col
        )
        best = labeled.groupBy("cluster_id").agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("cluster_size"),
        )
    else:
        labeled = docs.select(id_col, score_col).join(
            clusters.withColumnRenamed("id", id_col), id_col
        )
        stats = labeled.groupBy("cluster_id").agg(
            F.max(score_col).alias("_smax"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        best = (
            labeled.join(stats, "cluster_id")
            .filter(F.col(score_col) == F.col("_smax"))
            .groupBy("cluster_id", "cluster_size")
            .agg(F.min(id_col).alias(id_col))
        )
    kept_members = docs.join(
        best.select(id_col, "cluster_id", "cluster_size"), id_col
    )
    # A singleton's cluster_id is its own id, cast to the MEMBER path's
    # cluster_id dtype (whatever connected_components emitted for this id
    # type) — a hardcoded cast("long") would turn string ids into NULLs
    # and collapse every singleton into one NULL cluster downstream.
    cid_type = dict(kept_members.dtypes)["cluster_id"]
    singletons = docs.join(member_ids, id_col, "left_anti").select(
        "*",
        F.col(id_col).cast(cid_type).alias("cluster_id"),
        F.lit(1).cast("long").alias("cluster_size"),
    )
    return kept_members.unionByName(singletons)
