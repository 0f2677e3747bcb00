"""Text-analysis operators for the pages/documents corpus.

All pure Catalyst (regexp/length/split expressions compile into
whole-stage codegen; zero Python in the hot path): language-ID heuristic,
quality scoring, token statistics, document fingerprinting.  Oracle twins
in entry_queries.py mirror these expressions 1:1.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

# BPE-proxy pre-tokenizer (letter runs, digit runs, single punctuation —
# the GPT-2-style pre-tokenizer shape).  ONE definition: token counting,
# mixture weights, mixture sampling and the corpus job must tokenize
# identically or token budgets silently stop matching the weights.  The
# DuckDB oracle twins in entry_queries.py interpolate this same constant.
BPE_PIECES_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny built-in stopword lists for the n-gram/stopword language heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "des"],
    "es": ["el", "la", "los", "de", "que", "es", "en", "un", "por", "con"],
}


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "*", F.explode(F.split(F.col(text_col), "\\s+")).alias("tok")
    ).filter(F.col("tok") != "")


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit-ratio language guess (+ vowel-ratio fallback).

    Emits per-language ratios and ``pred_lang`` (max ratio; 'und' when no
    stopword hits).  One explode + one hash-agg.
    """
    toks = tokens(docs.select(id_col, text_col), text_col).select(
        id_col, F.lower("tok").alias("tok")
    )
    aggs = [F.count(F.lit(1)).alias("n_tok")]
    for lang, words in STOPWORDS.items():
        aggs.append(
            F.sum(F.col("tok").isin(words).cast("int")).alias(f"hits_{lang}")
        )
    per_doc = toks.groupBy(id_col).agg(*aggs)
    ratios = per_doc.select(
        id_col,
        "n_tok",
        *[(F.col(f"hits_{lang}") / F.col("n_tok")).alias(f"ratio_{lang}") for lang in STOPWORDS],
    )
    best = F.greatest(*[F.col(f"ratio_{lang}") for lang in STOPWORDS])
    pred = F.when(best <= 0, F.lit("und"))
    for lang in STOPWORDS:
        pred = pred.when(F.col(f"ratio_{lang}") == best, F.lit(lang))
    return ratios.withColumn("pred_lang", pred)


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Length/punct/digit/token features + a composite quality score."""
    t = F.col(text_col)
    n = F.length(t)
    spaces = F.length(F.regexp_replace(t, "[^ ]", ""))
    ntok = spaces + 1
    digits = F.length(F.regexp_replace(t, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    upper = F.length(F.regexp_replace(t, "[^A-Z]", ""))
    quality = (
        F.least(n / 500.0, F.lit(1.0)) * 0.5
        + (1.0 - digits / n) * 0.3
        + F.least(ntok / 100.0, F.lit(1.0)) * 0.2
    )
    return docs.select(
        id_col,
        n.cast("long").alias("n_chars"),
        ntok.cast("long").alias("n_tokens"),
        digits.cast("long").alias("n_digits"),
        punct.cast("long").alias("n_punct"),
        upper.cast("long").alias("n_upper"),
        (n / ntok).alias("chars_per_token"),
        quality.alias("quality"),
    )


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = tokens(docs.select(id_col, text_col), text_col)
    return toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.avg(F.length("tok")).alias("avg_token_len"),
        (F.countDistinct("tok") / F.count(F.lit(1))).alias("type_token_ratio"),
    )


def bpe_ish_token_count(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cheap BPE-proxy token count: split on word/number/punct boundaries.

    Counts regex pieces (letters runs, digit runs, single punctuation) —
    the standard pre-tokenizer shape — as a deterministic proxy for LLM
    token counting without a tokenizer library.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECES_RE), 0)
    return docs.select(
        id_col,
        F.size(pieces).cast("long").alias("n_bpe_tokens"),
        # crude chars-per-token calibration constant for LLM budgeting
        (F.length(text_col) / F.greatest(F.size(pieces), F.lit(1))).alias(
            "chars_per_bpe_token"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace-normalized md5 fingerprint (near-exact dedup key)."""
    norm = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return docs.select(id_col, F.md5(norm).alias("fingerprint"))


def rolling_hash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    keep_every: int = 4,
    hash_mode: str = "xxhash64",
    pre_normalized: bool = False,
) -> DataFrame:
    """Rolling token-window fingerprints with 0-mod-p content sampling.

    Emits a hash of every ``window_tokens``-token window, keeping only
    windows whose hash ≡ 0 (mod keep_every).  Selection depends on window
    CONTENT, not position, so it is offset-invariant: a passage quoted at
    any token offset inside another document yields the same kept
    fingerprints (the classic 0-mod-p fingerprinting scheme underlying
    winnowing).  Usable for containment/quotation detection.

    ``hash_mode``: "xxhash64" (default, JVM-native scale path; fp is a
    bigint) or "md5" (portable twin — fp is the md5 hex string and the
    mod-p selector is its last hex digit, reproducible in DuckDB for the
    driver oracle).
    """
    # pre_normalized=True skips the whitespace-collapse regex when the
    # caller already normalized (a full extra regex pass over the corpus
    # otherwise — it is idempotent, so only cost changes, not semantics)
    body = (
        F.col(text_col)
        if pre_normalized
        else F.regexp_replace(F.col(text_col), "\\s+", " ")
    )
    toks = docs.select(F.col(id_col).alias("id"), F.split(body, " ").alias("ts"))
    # Window starts 0..size-w INCLUSIVE (size-w+1 windows).  Guard with
    # when(): Spark's sequence(0, hi) DESCENDS for hi < 0, and an
    # exactly-w-token doc would otherwise emit i=-1 → slice(ts, 0, w)
    # aborts the job with INVALID_PARAMETER_VALUE.START.
    starts = F.when(
        F.size("ts") >= window_tokens,
        F.sequence(F.lit(0), F.size("ts") - window_tokens),
    ).otherwise(F.array().cast("array<int>"))
    # Explode window starts and slice per row — deliberately NOT
    # transform()-with-posexplode: higher-order functions evaluate their
    # lambda INTERPRETED (no whole-stage codegen), and an interleaved A/B
    # at both 45- and 800-token documents measured the codegen'd
    # explode+slice form ~2x faster despite re-copying the token array
    # into every window row (memory bandwidth absorbs the copies; the
    # interpreted per-element eval does not amortize).
    win = toks.select("id", F.explode(starts).alias("i"), "ts")
    window_str = F.concat_ws(" ", F.slice(F.col("ts"), F.col("i") + 1, window_tokens))
    if hash_mode == "md5":
        fps = win.select("id", F.col("i").alias("pos"), F.md5(window_str).alias("fp"))
        sel = F.conv(F.substring("fp", 32, 1), 16, 10).cast("int")
        return fps.filter(F.pmod(sel, F.lit(keep_every)) == 0)
    fps = win.select("id", F.col("i").alias("pos"), F.xxhash64(window_str).alias("fp"))
    return fps.filter(F.pmod(F.col("fp"), F.lit(keep_every)) == 0)


def _id_hash_head32(id_col: str, salt: str):
    """First 32 bits of md5(salt:id) as a long — the engine's portable
    ID-hash (DuckDB twin: entry_queries._md5_head32_sql).  Shared by
    deterministic_sample and stratified_split so the two can never
    silently diverge."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")


def deterministic_sample(
    docs: DataFrame,
    pct: int,
    id_col: str = "doc_id",
    salt: str = "afspark",
) -> DataFrame:
    """Keep ~pct% of rows by ID hash — the web-pipeline sampling idiom.

    Unlike ``df.sample`` (RNG per partition, changes under repartition
    or re-runs), hash-mod sampling is a pure function of the row ID:
    stable across runs, machines, and engines, and subset-monotone
    (pct=5 output is a subset of pct=10).  Uses md5 so the DuckDB oracle
    reproduces the exact row set.
    """
    if not 0 <= pct <= 100:
        raise ValueError("pct must be in [0, 100]")
    return docs.filter(F.pmod(_id_hash_head32(id_col, salt), F.lit(100)) < pct)


def top_terms(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    min_len: int = 3,
) -> DataFrame:
    """Global top-k terms by document frequency (corpus vocabulary scan).

    One explode + distinct-per-doc + map-side-combinable count; the
    top-k is a total order on (df desc, term asc) — deterministic ties.
    At 100TB the count is the standard word-count shuffle; the final
    top-k reduces through TakeOrderedAndProject (no full sort).
    """
    toks = (
        docs.select(
            F.col("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
        )
        .filter(F.length("term") >= min_len)
        .distinct()
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    return counts.orderBy(F.col("doc_freq").desc(), F.col("term")).limit(k)


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals, per document.

    Emits (per doc): n_words, n_distinct_words, top_word_frac (count of
    the most frequent word / n_words), dup_word_frac ((n_words -
    n_distinct)/n_words), n_bigrams, top_bigram_frac, dup_bigram_frac —
    the word/n-gram repetition filters of Rae et al. 2021 (Gopher,
    arXiv:2112.11446 §A1.1), the standard crawl-quality gate for LLM
    training corpora.

    Pure Catalyst: one explode + hash-agg per level; grouping key is
    (doc_id, term) so partial aggregation happens map-side and the only
    skew bound is the largest single document.
    """
    toks = F.split(F.col(text_col), " ")
    src = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))

    words = src.select(
        "doc_id", F.explode("toks").alias("tok")
    ).filter(F.col("tok") != "")
    wc = words.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    ws = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("_top_w"),
    )

    bigrams = src.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("big"),
    )
    bc = bigrams.groupBy("doc_id", "big").agg(F.count(F.lit(1)).alias("c"))
    bs = bc.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.count(F.lit(1)).alias("_nd_big"),
        F.max("c").alias("_top_b"),
    )

    return (
        ws.join(bs, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            (F.col("_top_w") / F.col("n_words")).alias("top_word_frac"),
            (
                (F.col("n_words") - F.col("n_distinct_words")) / F.col("n_words")
            ).alias("dup_word_frac"),
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            (F.col("_top_b") / F.col("n_bigrams")).alias("top_bigram_frac"),
            (
                (F.col("n_bigrams") - F.col("_nd_big")) / F.col("n_bigrams")
            ).alias("dup_bigram_frac"),
        )
    )


def stratified_split(
    docs: DataFrame,
    weights: list[tuple[str, int]] | None = None,
    id_col: str = "doc_id",
    salt: str = "afspark-split",
) -> DataFrame:
    """Deterministic train/val/test assignment by ID hash (permille
    weights).

    Adds a ``split`` column as a pure function of (salt, id): stable
    across runs, engines, and partitionings; a document never migrates
    between splits when the corpus grows (hash-threshold, not rank); and
    because assignment is independent of every attribute, the split
    proportions hold within any stratum (language, domain, quality band)
    in expectation — the web-pipeline counterpart of sklearn's stratified
    splitters, without a per-stratum global sort (which at 100 TB would
    be a single-task window per stratum).
    """
    weights = weights or [("train", 800), ("val", 100), ("test", 100)]
    total = sum(w for _, w in weights)
    if total != 1000:
        raise ValueError(f"weights must sum to 1000 permille, got {total}")
    bucket = F.pmod(_id_hash_head32(id_col, salt), F.lit(1000))
    expr = None
    cum = 0
    for name, w in weights:
        cum += w
        expr = F.when(bucket < cum, F.lit(name)) if expr is None else expr.when(
            bucket < cum, F.lit(name)
        )
    return docs.withColumn("split", expr)


def containment_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    keep_every: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Containment/quotation detection via 0-mod-p fingerprint overlap.

    A passage of one document quoted inside another yields the SAME kept
    fingerprints at any offset (content-defined selection), so
    containment(a, b) = |fp(a) ∩ fp(b)| / min(|fp(a)|, |fp(b)|) ≈ 1 when
    the smaller document is contained in the larger — the asymmetric
    relation MinHash/Jaccard misses (Jaccard of a small quote inside a
    big page is tiny).

    Scale shape: fingerprints appearing in more than ``max_df`` documents
    are dropped BEFORE the self-join (boilerplate windows — navigation
    chrome, license boilerplate — carry no containment signal and would
    fan out quadratically); set sizes are measured after the cap so the
    ratio stays consistent.  The join is a fingerprint equi-join, counts
    are map-side combined.
    """
    fps = (
        rolling_hash_fingerprints(
            docs, text_col, id_col, window_tokens, keep_every, hash_mode
        )
        .select("id", "fp")
        .distinct()
    )
    rare = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).filter(
        F.col("_df") <= max_df
    )
    fps = fps.join(rare.select("fp"), "fp", "left_semi")
    sizes = fps.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    shared = (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return (
        shared.join(sizes.select(F.col("id").alias("id_a"), F.col("n_fp").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_fp").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            "shared",
            "n_a",
            "n_b",
            (F.col("shared") / F.least("n_a", "n_b")).alias("containment"),
        )
    )


def duplicated_span_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    hash_mode: str = "xxhash64",
    keep_every: int = 1,
) -> DataFrame:
    """Cross-document exact n-gram span duplication per document.

    The exact-substring dedup signal (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better"): every
    ``window_tokens``-token window is hashed; a window is DUPLICATED when
    its hash occurs in >= 2 distinct documents.  Output per doc:
    n_windows, n_dup_windows, dup_frac — the per-doc fraction a pipeline
    thresholds to drop or trim boilerplate/memorized spans.

    Plan shape: one explode to window hashes (rows ≈ token count — the
    inherent cost of exact-substring analysis), an fp-keyed aggregate
    counting distinct docs two-level (fp, id) -> fp (both map-side
    combined, no countDistinct sort state), and an fp-keyed equi-join
    back — every shuffle keys on the well-distributed hash, never on the
    document.  ``keep_every`` > 1 switches to 0-mod-p content sampling:
    recall drops to ~1/keep_every per window but cost drops equally —
    the standard scale dial at 100 TB; selection stays offset-invariant
    so sampled duplicates still align across documents.
    """
    fps = rolling_hash_fingerprints(
        docs,
        text_col=text_col,
        id_col=id_col,
        window_tokens=window_tokens,
        keep_every=keep_every,
        hash_mode=hash_mode,
    )
    # distinct docs per fp, two-level: dedup (fp, id) then count — both
    # plain hash aggregates with map-side partials
    ndocs = (
        fps.select("fp", "id")
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nd"))
    )
    joined = fps.join(ndocs, "fp")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum((F.col("_nd") >= 2).cast("long")).alias("n_dup_windows"),
        )
        .withColumn("dup_frac", F.col("n_dup_windows") / F.col("n_windows"))
    )


def remove_duplicate_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_tokens: int = 8,
    hash_mode: str = "xxhash64",
    min_docs: int = 2,
) -> DataFrame:
    """Rewrite ``text`` with cross-document duplicated spans REMOVED.

    The acting half of :func:`duplicated_span_stats` — the
    exact-substring *removal* step of Lee et al. 2021 ("Deduplicating
    Training Data Makes Language Models Better", §ExactSubstr) as used
    by RefinedWeb/CCNet-style pipelines: a token is dropped when it is
    covered by ANY ``window_tokens``-token window whose hash occurs in
    >= ``min_docs`` distinct documents; every other token is preserved
    in order.  All occurrences are removed (the paper reports removing
    all copies vs keeping one is a wash for LM quality); pair with a
    doc-level keeper if one canonical copy must survive.

    Whitespace is normalized to single spaces before tokenization (the
    standard token-stream form), so on already-normalized text —
    e.g. the output of ``extract.extract_text`` — the untouched
    remainder is **byte-exact**: removing a span never perturbs bytes
    outside it.  ``tests/test_pipeline_ops.py`` asserts byte-exactness
    and idempotence on planted duplicate paragraphs.

    Output: ``(id_col, text_dedup, n_tokens, n_tokens_removed)`` — one
    row per input doc; a fully-duplicated doc yields ``text_dedup = ''``
    (filter ``n_tokens_removed < n_tokens`` to drop husks).

    Plan shape at 100 TB: window hashing explodes to ~token count rows
    (inherent to exact-substring dedup); duplicated-fp detection is the
    same two-level (fp, id) hash aggregate as the stats operator.  Only
    the *duplicated* windows are expanded to covered token indices
    (w× amplification on the duplicated portion only), and only
    AFFECTED docs enter the posexplode → anti-join → ordered-rebuild
    path; untouched docs take a join-free pass-through.  Every shuffle
    keys on the window hash or (doc, token-index) — never a skewed key;
    per-doc state is bounded by one document's tokens.
    """
    norm = F.regexp_replace(F.col(text_col), "\\s+", " ")
    base = docs.select(F.col(id_col).alias("id"), norm.alias("_t"))
    fps = rolling_hash_fingerprints(
        base,
        text_col="_t",
        id_col="id",
        window_tokens=window_tokens,
        keep_every=1,  # removal needs the complete mask — no sampling
        hash_mode=hash_mode,
        pre_normalized=True,  # _t is already whitespace-collapsed
    )
    # NOTE (r6 optimization pass): an eager localCheckpoint of fps (to
    # stop its two consumers recomputing the tokenize+hash pass) was
    # tried and REVERTED — at bench scale the extra materialization job
    # + stats-blind checkpoint scan cost more than the recompute it
    # saved (interleaved A/B: 1.9 s vs 2.3 s), and the apparent 3x stage
    # CPU that motivated it was page-fault-inflated accounting on a
    # degraded host window.  Recompute of a cheap codegen subtree inside
    # ONE pipelined job beats serializing it through storage.
    dup_fps = (
        fps.select("fp", "id")
        .distinct()
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("fp")
    )
    # covered token indices of duplicated windows, deduped per (doc, idx)
    masked = (
        fps.join(dup_fps, "fp")
        .select(
            "id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(window_tokens - 1))
            ).alias("j"),
        )
        .distinct()
    )
    n_removed = masked.groupBy("id").agg(F.count(F.lit(1)).alias("n_tokens_removed"))
    # rebuild ONLY affected docs: posexplode tokens, anti-join the mask,
    # re-assemble in token order (per-doc collect_list bounded by doc size)
    affected = base.join(n_removed.select("id"), "id")
    tok = affected.select(
        "id", F.posexplode(F.split(F.col("_t"), " ")).alias("j", "tok")
    )
    rebuilt = (
        tok.join(masked, ["id", "j"], "left_anti")
        .groupBy("id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("_txt")
        )
    )
    return (
        base.join(rebuilt, "id", "left")
        .join(n_removed, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("n_tokens_removed").isNull(), F.col("_t"))
            .otherwise(F.coalesce("_txt", F.lit("")))
            .alias("text_dedup"),
            F.size(F.split(F.col("_t"), " ")).alias("n_tokens"),
            F.coalesce("n_tokens_removed", F.lit(0)).alias("n_tokens_removed"),
        )
    )


def tfidf_by_source(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_len: int = 3,
) -> DataFrame:
    """Per-(source, term) TF-IDF over document frequencies.

    tf = docs within the source containing the term; idf = ln(N / df)
    with df the global containing-doc count.  One token explode feeds
    BOTH aggregates (per-source tf and global df — each a map-side-
    combined count over deduped (doc, term) rows); the df table and the
    corpus size are broadcast back onto the tf rows (vocab-sized and
    1-row — never a shuffle of the tf side).  Scores are emitted for the
    full (source, term) matrix; rank/threshold downstream.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("_d"),
            F.col(source_col).alias("source"),
            F.explode(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")
            ).alias("term"),
        )
        .filter(F.length("term") >= min_len)
        .distinct()
    )
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf_docs"))
    dfg = toks.select("_d", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df_global")
    )
    n = docs.select(
        F.count_distinct(F.col(id_col)).alias("n_docs")
    )
    out = tf.join(F.broadcast(dfg), "term").crossJoin(F.broadcast(n))
    score = F.col("tf_docs") * F.log(F.col("n_docs") / F.col("df_global"))
    return out.select(
        "source", "term", "tf_docs", "df_global", "n_docs", score.alias("tfidf")
    )


# PII patterns shared by pii_stats / pii_redact — deliberately restricted
# to the regex subset Java (Spark) and RE2 (DuckDB oracle) evaluate
# identically: character classes, bounded repeats, \b word boundaries; no
# backreferences, no lookaround, leftmost-longest-irrelevant shapes (the
# alternation-free patterns match the same spans under both NFA and
# leftmost-first semantics).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}\b",
}


def pii_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    patterns: dict[str, str] = PII_PATTERNS,
) -> DataFrame:
    """Per-document PII match counts — the scrub-audit stage of a
    training-data pipeline (count before you redact; route docs above a
    threshold to quarantine).

    Pure Catalyst: one `regexp_count` column per pattern, all evaluated
    in a single whole-stage-codegen projection over one scan — per-doc
    cost is the regex sweeps, no shuffle at all until a consumer
    aggregates.
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).cast("long").alias(f"n_{name}")
        for name, p in patterns.items()
    ]
    total = sum(F.col(f"n_{name}") for name in patterns).alias("n_pii")
    return docs.select(F.col(id_col).alias("doc_id"), *counts).select(
        "doc_id", *[f"n_{n}" for n in patterns], total
    )


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    patterns: dict[str, str] = PII_PATTERNS,
    placeholder: str = "<PII>",
) -> DataFrame:
    """Redact PII in place: chained `regexp_replace`, one per pattern,
    applied in dict order (order matters only when patterns overlap —
    email is applied before phone/ipv4 so an address is consumed as one
    unit).  Still a single codegen projection; emits the redacted text
    plus before/after lengths so audits can verify bytes-removed without
    rescanning.
    """
    red = F.col(text_col)
    for p in patterns.values():
        red = F.regexp_replace(red, p, placeholder)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        red.alias("text_redacted"),
        F.length(text_col).cast("long").alias("len_raw"),
        F.length(red).cast("long").alias("len_redacted"),
    )


def quota_sample(
    docs: DataFrame,
    quota: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "afspark",
    n_salts: int = 32,
) -> DataFrame:
    """Keep at most ``quota`` docs per key, chosen deterministically —
    the corpus-balancing stage (cap any one domain/source's share of the
    training mix).  Selection order is (md5-hash, id): a pure function
    of the row, so the kept set is stable across runs/engines and
    subset-monotone in ``quota`` (quota=100's picks contain quota=50's).

    Two-phase for scale: ranking directly per key would sort one hot
    key's ENTIRE row set in one task (the 100-TB skew killer — a
    boilerplate mega-domain is exactly the key you're capping).  Phase 1
    ranks within (key, hash%n_salts) and keeps ``quota`` per salt lane —
    local pruning that bounds any key to n_salts*quota rows; phase 2
    ranks the survivors per key and keeps ``quota``.  Lane pruning is
    sound BECAUSE lanes are disjoint and phase 2's order restores the
    global (hash, id) rank: a row outside its lane's top-quota is
    outside the key's top-quota a fortiori.
    """
    if quota < 1:
        raise ValueError("quota must be >= 1")
    h = _id_hash_head32(id_col, salt)
    src = docs.withColumn("_h", h)
    lane = F.pmod(F.col("_h"), F.lit(n_salts))
    pruned = (
        src.withColumn("_lane", lane)
        .withColumn("_r1", F.row_number().over(
            W.partitionBy(key_col, "_lane").orderBy("_h", id_col)
        ))
        .filter(F.col("_r1") <= quota)
    )
    w2 = W.partitionBy(key_col).orderBy("_h", id_col)
    return (
        pruned.withColumn("_rank", F.row_number().over(w2))
        .filter(F.col("_rank") <= quota)
        .drop("_h", "_lane", "_r1")
    )


def lm_unigram_score(
    docs: DataFrame,
    smoothing: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc mean unigram log-probability — the cheap stand-in for the
    LM-perplexity quality filter (CCNet-style) a training-data pipeline
    runs before the expensive model pass.  Documents whose tokens are
    corpus-typical score high; gibberish / rare-token salads score low.

    Add-a smoothed self-corpus model: p(t) = (cnt_t + a) / (total + a*V).
    Two aggregations + two equi-joins, all Catalyst: token counts shuffle
    by term (map-side combined), token->logp re-join is co-partitioned
    on term, per-doc mean shuffles back by doc id.  The (total, V)
    scalars re-enter broadcast-side.  At web scale the frequency table
    is the heavy-tailed vocabulary — the term join stays an equi-join
    (no broadcast assumption); salting hot terms is unnecessary because
    the probe side is pre-aggregated per (doc, term) first, bounding any
    one term's rows by the doc count.

    Returns (doc_id, n_tokens, avg_logp): avg over the doc's token
    OCCURRENCES (repeats weighted), natural log.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+")).alias("term"),
    ).filter(F.col("term") != "")
    # (doc, term) pre-aggregation: bounds the term-join probe rows per
    # term by n_docs and shrinks both shuffles
    dt = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    freq = dt.groupBy("term").agg(F.sum("tf").alias("cnt"))
    scalars = freq.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vocab")
    )
    logp = freq.crossJoin(F.broadcast(scalars)).select(
        "term",
        F.log(
            (F.col("cnt") + smoothing)
            / (F.col("total") + smoothing * F.col("vocab"))
        ).alias("_logp"),
    )
    return (
        dt.join(logp, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            (F.sum(F.col("tf") * F.col("_logp")) / F.sum("tf")).alias("avg_logp"),
        )
        .select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"), "avg_logp")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "afspark-ws",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES): rank = ln(u)/w with u a pure ID-hash
    uniform in (0,1); the k largest ranks are a weighted sample — a doc
    with twice the weight is twice as likely to make the cut.  The
    pipeline use is importance-weighted corpus selection (by length,
    quality score, domain prior) that is REPRODUCIBLE: a pure function
    of (salt, id, weight), invariant to partitioning and engine, and
    mergeable — the top-k of unioned shards is the top-k of the union,
    so per-shard local top-k composes (TakeOrderedAndProject here).

    ln(u)/w is the log of the classic u^(1/w) key — same order, one
    transcendental.  Rows with weight <= 0 or null are excluded (their
    inclusion probability is 0).  Ties (impossible under distinct ids)
    break on id.  Returns the sampled rows + ``_rank``.
    """
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
    )
    u = (h + 1) / F.lit(4294967297.0)  # (0, 1): never ln(0)
    rank = F.log(u) / F.col(weight_col)
    return (
        docs.filter(F.col(weight_col) > 0)
        .withColumn("_rank", rank)
        .orderBy(F.col("_rank").desc(), F.col(id_col))
        .limit(k)
    )


def crawl_schedule(
    frontier: DataFrame,
    min_gap_seconds: int,
    base_epoch: int,
    domain_col: str = "source",
    priority_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Politeness-constrained crawl schedule: assign each frontier URL a
    fetch slot such that two fetches against the same domain are at
    least ``min_gap_seconds`` apart — the standard frontier shaping step
    before dispatching a recrawl wave.

    Slots are deterministic: within a domain, URLs rank by
    (priority DESC, id ASC) and slot k fetches at
    base_epoch + (k-1)*min_gap_seconds.  The emitted ``wave`` (=rank)
    also serves as the batch index a fetcher fleet can pull round-robin,
    which automatically interleaves domains.

    Scale shape: ONE row_number window keyed on the domain.  The frame
    is a domain's frontier — bounded by per-domain URL counts, the same
    skew profile as every per-series sequence op here; for a
    pathological mega-domain, pre-split by url-hash into virtual
    sub-domains (each still gap-legal if the gap is scaled by the split
    factor).
    """
    w = W.partitionBy(domain_col).orderBy(
        F.col(priority_col).desc(), F.col(id_col)
    )
    rk = F.row_number().over(w)
    return frontier.select(
        F.col(id_col),
        F.col(domain_col).alias("domain"),
        F.col(priority_col).alias("priority"),
        rk.alias("wave"),
        (F.lit(base_epoch) + (rk - 1).cast("long") * min_gap_seconds)
        .alias("fetch_epoch"),
    )


def pmi_bigrams(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-k adjacent-token collocations by pointwise mutual information.

    PMI = log p(ab) / (p(a) p(b)) with p(ab) = c_ab/M (bigram mass) and
    p(a) = c_a/N (unigram mass).  The ``log`` is monotone, so ranking by
    the RATIO ``c_ab * N^2 / (M * c_a * c_b)`` is the same ordering
    while staying libm-free: every factor is an exact integer count and
    the score is fixed-shape double arithmetic — identical across
    engines (the driver oracle relies on this; see also hdrsketch.py's
    integer-bucketing rationale).

    Scale shape (100 TB): two vocabulary-bounded groupBys (map-side
    combined — the shuffle carries distinct terms, not tokens), two
    broadcast-sized scalar totals, two joins against the unigram table
    (vocab-sized; Spark broadcasts it under AQE when it fits), and a
    TakeOrderedAndProject top-k — no full sort.  ``min_count`` prunes
    the hapax tail before the joins.

    Bigrams are ADJACENT pairs only (collocation detection, not co-
    occurrence windows), built by exploding 1..len-1 indexes; docs with
    fewer than two tokens are filtered BEFORE the explode because
    Spark's ``sequence(1, 0)`` descends instead of returning empty.
    """
    toks = docs.select(
        F.filter(F.split(F.col(text_col), " "), lambda x: x != "").alias("l")
    )
    uni = (
        toks.select(F.explode("l").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_tot = uni.agg(F.sum("c").alias("n_uni"))
    bi = (
        toks.filter(F.size("l") >= 2)
        .select(
            F.col("l"),
            F.explode(F.sequence(F.lit(1), F.size("l") - 1)).alias("i"),
        )
        .select(
            F.element_at("l", F.col("i")).alias("w1"),
            F.element_at("l", F.col("i") + 1).alias("w2"),
        )
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    m_tot = bi.agg(F.sum("c_ab").alias("m_bi"))
    ua = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    scored = (
        bi.filter(F.col("c_ab") >= min_count)
        .join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(m_tot))
        .withColumn(
            "pmi_ratio",
            F.col("c_ab").cast("double")
            * F.col("n_uni").cast("double")
            * F.col("n_uni").cast("double")
            / (
                F.col("m_bi").cast("double")
                * F.col("c_a").cast("double")
                * F.col("c_b").cast("double")
            ),
        )
    )
    return scored.select("w1", "w2", "c_ab", "c_a", "c_b", "pmi_ratio").orderBy(
        F.col("pmi_ratio").desc(), "w1", "w2"
    ).limit(k)


def _decontam_norm(col: str) -> Column:
    """Shared canonicalization for decontamination: lowercase,
    non-alphanumeric runs collapsed to single spaces."""
    return F.trim(F.regexp_replace(F.lower(F.col(col)), "[^a-z0-9]+", " "))


def _token_grams(frame, norm, out_id, in_id, with_pos, n, hash_mode):
    """Every n-token window of ``norm`` as (id[, pos], fp).

    Explode + slice per row, not transform()-with-posexplode: see
    rolling_hash_fingerprints — interpreted higher-order lambdas measured
    ~2x slower than this codegen'd form at both short and long docs.
    """
    toks = frame.select(F.col(in_id).alias(out_id), F.split(norm, " ").alias("ts"))
    starts = F.when(
        F.size("ts") >= n, F.sequence(F.lit(0), F.size("ts") - n)
    ).otherwise(F.array().cast("array<int>"))
    win = toks.select(out_id, F.explode(starts).alias("pos"), "ts")
    ws = F.concat_ws(" ", F.slice(F.col("ts"), F.col("pos") + 1, n))
    fp = F.md5(ws) if hash_mode == "md5" else F.xxhash64(ws)
    cols = [out_id, "pos", fp.alias("fp")] if with_pos else [out_id, fp.alias("fp")]
    return win.select(*cols)


def benchmark_grams(
    benchmark: DataFrame,
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Distinct (bench_id, fp) ``n``-gram set of an eval suite — the
    broadcast side of :func:`decontaminate`.

    Build this ONCE (persist + materialize) when decontaminating many
    document batches against the same eval suite — e.g. the corpus job's
    per-resume-shard passes — instead of letting each call re-read and
    re-explode the benchmark.  ``n`` and ``hash_mode`` must match the
    ``decontaminate`` call it is passed to (document-side windows are
    hashed the same way or nothing joins).
    """
    grams = _token_grams(
        benchmark,
        _decontam_norm(bench_text_col),
        "bench_id",
        bench_id_col,
        with_pos=False,
        n=n,
        hash_mode=hash_mode,
    ).distinct()
    # stamp the gram length into the fp column's schema metadata so
    # decontaminate can reject an n mismatch (hash dtype alone cannot
    # distinguish 10-grams from 13-grams — both join to nothing)
    return grams.withColumn(
        "fp", F.col("fp").alias("fp", metadata={"ngram": n})
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "bench_id",
    n: int = 13,
    hash_mode: str = "xxhash64",
    bench_grams: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs that overlap an
    eval set by any shared ``n``-token gram (Brown et al. 2020 GPT-3
    Appendix C; the standard pretraining-pipeline step before training).

    Both sides are canonicalized identically — lowercase, non-alphanumeric
    runs collapsed to single spaces — so formatting/punctuation noise
    cannot hide an overlap.  Every ``n``-token window of every benchmark
    example becomes a gram; a document window is CONTAMINATED when its
    hash appears in that gram set.  Benchmark examples shorter than ``n``
    tokens contribute no grams (GPT-3 sizes N per benchmark as
    min(13, percentile example length) — pick ``n`` per benchmark
    accordingly; this operator keeps one fixed N per call).

    Output, one row per input doc:
    ``(id_col, n_windows, n_contaminated, contamination_frac,
    n_bench_examples_hit)`` — threshold ``n_contaminated > 0`` to drop,
    or ``contamination_frac`` for the GPT-3 "dirty document" split.

    Plan shape at 100 TB: the benchmark gram set is eval-suite-sized
    (10^4-10^6 grams, megabytes) — explicitly ``F.broadcast`` — so the
    document-side window explode joins MAP-SIDE with no shuffle of the
    exploded rows; only matched (doc, pos, bench) hits reach the per-doc
    aggregate (map-side combined), and clean docs take a join-free
    arithmetic pass (n_windows from token count).  Shuffle volume is
    proportional to the CONTAMINATION, not the corpus.

    ``bench_grams`` short-circuits the benchmark side with a precomputed
    :func:`benchmark_grams` frame (same ``n``/``hash_mode``) so repeated
    calls against one eval suite don't rebuild its gram pipeline.
    """
    norm_doc = _decontam_norm(text_col)
    if bench_grams is None:
        if benchmark is None:
            raise ValueError("decontaminate needs benchmark or bench_grams")
        bench_grams = benchmark_grams(
            benchmark, bench_text_col, bench_id_col, n=n, hash_mode=hash_mode
        )
    else:
        # a hash_mode or n mismatch between the precomputed grams and the
        # doc-side windows would not error — it would silently flag
        # NOTHING.  The fp dtype (string=md5, bigint=xxhash64) and the
        # ngram schema metadata benchmark_grams stamps make both
        # mismatches detectable.
        want = "string" if hash_mode == "md5" else "bigint"
        got = dict(bench_grams.dtypes).get("fp")
        if got != want:
            raise ValueError(
                f"bench_grams fp dtype {got!r} does not match "
                f"hash_mode={hash_mode!r} (expected {want!r}); build the "
                f"gram set with the same hash_mode"
            )
        grams_n = bench_grams.schema["fp"].metadata.get("ngram")
        if grams_n is not None and grams_n != n:
            raise ValueError(
                f"bench_grams were built with n={grams_n} but this call "
                f"uses n={n}; gram lengths must match or nothing joins"
            )
    doc_wins = _token_grams(
        docs, norm_doc, "id", id_col, with_pos=True, n=n, hash_mode=hash_mode
    )
    hits = doc_wins.join(F.broadcast(bench_grams), "fp").groupBy("id").agg(
        F.countDistinct("pos").alias("n_contaminated"),
        F.countDistinct("bench_id").alias("n_bench_examples_hit"),
    )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.greatest(
            F.size(F.split(norm_doc, " ")) - F.lit(n - 1), F.lit(0)
        ).cast("long").alias("n_windows"),
    )
    return base.join(hits, "id", "left").select(
        F.col("id").alias(id_col),
        "n_windows",
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
        F.when(F.col("n_windows") > 0,
               F.coalesce("n_contaminated", F.lit(0)) / F.col("n_windows"))
        .otherwise(F.lit(0.0)).alias("contamination_frac"),
        F.coalesce("n_bench_examples_hit", F.lit(0)).cast("long")
        .alias("n_bench_examples_hit"),
    )


def source_mixture_weights(
    docs: DataFrame,
    alpha: float = 0.5,
    token_budget: int | None = None,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-scaled data-mixture weights per source (the
    multilingual/multi-domain sampling rule of Lample & Conneau 2019,
    used by the Pile/Llama mixtures): ``w_i ∝ p_i^alpha`` where ``p_i``
    is a source's natural token share — ``alpha < 1`` up-weights small
    sources, ``alpha = 1`` is natural sampling.  Token counts use the
    BPE-proxy pre-tokenizer (:func:`bpe_ish_token_count`).

    With ``token_budget`` set, adds each source's target token count and
    ``rate`` = target/natural tokens — the per-source sampling rate
    (epochs; > 1 means oversampling) consumed by
    :func:`mixture_sample`.

    Plan shape: one map-side-combined aggregate to (source, n_tokens) —
    sources number in the hundreds, so everything after the agg is
    broadcast-sized arithmetic.
    """
    pieces = F.regexp_extract_all(F.col(text_col), F.lit(BPE_PIECES_RE), 0)
    per_source = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(pieces)).cast("long").alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("_tot"),
        F.sum(F.pow(F.col("n_tokens"), F.lit(float(alpha)))).alias("_powsum"),
    )
    out = (
        per_source.crossJoin(F.broadcast(tot))
        .withColumn("nat_frac", F.col("n_tokens") / F.col("_tot"))
        # p_i^a / sum p_j^a == n_i^a / sum n_j^a (the 1/tot^a cancels)
        .withColumn(
            "weight", F.pow(F.col("n_tokens"), F.lit(float(alpha))) / F.col("_powsum")
        )
    )
    if token_budget is not None:
        out = out.withColumn(
            "target_tokens", F.col("weight") * F.lit(float(token_budget))
        ).withColumn("rate", F.col("target_tokens") / F.col("n_tokens"))
    return out.drop("_tot", "_powsum")


def mixture_sample(
    docs: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    salt: str = "afspark-mix",
) -> DataFrame:
    """Act on a data mixture: emit each doc ``n_copies`` times in
    expectation of its source's ``rate`` (from
    :func:`source_mixture_weights` with a ``token_budget``).

    ``n_copies = floor(rate) + [idhash mod 1e6 < frac(rate)*1e6]`` —
    every doc of an oversampled source (rate > 1) appears floor(rate)
    times plus one more for a deterministic id-hash fraction; an
    undersampled source keeps a rate-sized hash slice.  Pure function of
    (id, salt): stable across runs/partitionings/engines, and
    rate-monotone (a bigger budget's sample contains the smaller's).

    Plan shape at 100 TB: the weights side is sources-sized — broadcast
    — and the keep/copy decision is a map-side expression; NO shuffle,
    NO window, no per-source sort (the classic skew trap for
    prefix-sum budget cuts is designed out by sampling on rate instead).
    Expected token error vs the target is O(sqrt(docs-per-source))
    tokens — negligible at corpus scale.
    """
    rates = weights.select(source_col, "rate")
    h = F.pmod(_id_hash_head32(id_col, salt), F.lit(1_000_000))
    whole = F.floor("rate").cast("long")
    frac = F.col("rate") - F.floor("rate")
    # floor(x + 0.5): a rate quantized upstream (e.g. to 6 decimals)
    # yields a threshold stable under last-ulp noise, so the kept row
    # set is reproducible across engines for the oracle twin
    thresh = F.floor(frac * 1_000_000 + F.lit(0.5)).cast("long")
    return (
        docs.join(F.broadcast(rates), source_col)
        .withColumn("n_copies", whole + (h < thresh).cast("long"))
        .filter(F.col("n_copies") >= 1)
        .drop("rate")
    )
