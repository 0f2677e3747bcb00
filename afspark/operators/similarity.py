"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k (broadcast the queries, one
narrow pass over the corpus — at 100TB this is a full scan but zero
shuffle until the per-query top-k aggregation, which is tiny).

Scale path: IVF — a seeded k-means-lite codebook (trained on a bounded
sample) assigns every vector to its nearest centroid ONCE (narrow); a
query probes only the ``n_probe`` closest cells, turning the full scan
into a partition-pruned scan when the table is written partitioned by
``cell``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _as_double(vec_col: str):
    return F.transform(vec_col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def _sq_dists(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Pairwise squared distances via the GEMM expansion
    ||x||^2 + ||c||^2 - 2 x.c — O(rows x cells) memory instead of the
    O(rows x cells x dim) broadcast tensor (0.9 GB per 10k-row batch at
    dim=768, an executor OOM at realistic embedding widths).

    Precision trade-off (accepted; sklearn does the same): the expansion
    loses ~half the significant digits to cancellation for points very
    close to a centroid, so argmin CELL assignment for near-TIED
    centroids can differ from the exact pairwise-difference form.  If
    exact tie behavior ever matters, recompute the top-2 candidate cells
    exactly."""
    xx = (X * X).sum(axis=1)[:, None]
    cc = (C * C).sum(axis=1)[None, :]
    return np.maximum(xx + cc - 2.0 * (X @ C.T), 0.0)


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    """Exact per-query top-k over (qid, cid, cos_sim) WITHOUT a full-corpus
    window.

    A plain ``row_number() OVER (PARTITION BY qid)`` shuffles every scored
    corpus row for a query into ONE task — a straggler/OOM by design at
    scale.  Instead:

      phase 1 (narrow, no shuffle): one Arrow pass per input partition
        keeps a running top-k per qid across batches -> at most
        k * n_partitions survivor rows;
      phase 2: the usual rank window over ONLY those survivors (tiny).

    Tie order matches the window form: cos_sim DESC, cid ASC.  NaN
    cos_sim (zero-norm vectors) sorts FIRST to mirror Spark's
    NaN-greatest double ordering.
    """
    fields = scored.schema
    cid_dtype = fields["cid"].dataType.simpleString()
    qid_dtype = fields["qid"].dataType.simpleString()
    out_schema = f"qid {qid_dtype}, cid {cid_dtype}, cos_sim double"

    def _compact(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["cos_sim"].to_numpy(np.float64)
        # Spark orders NaN as the greatest double; pandas sorts NaN last.
        pdf = pdf.assign(_key=np.where(np.isnan(key), np.inf, key))
        pdf = pdf.sort_values(["qid", "_key", "cid"], ascending=[True, False, True])
        return pdf.groupby("qid", sort=False).head(k).drop(columns="_key")

    def local_topk(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand = _compact(pdf)
            best = cand if best is None else _compact(pd.concat([best, cand]))
        if best is not None:
            yield best

    survivors = scored.mapInPandas(local_topk, out_schema)
    ranked = survivors.withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("qid").orderBy(F.col("cos_sim").desc(), F.col("cid"))
        ),
    )
    return ranked.filter(F.col("rank") <= k)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """Exact cosine top-k per query.  Queries are broadcast (small side);
    the corpus is scanned once, scores stay narrow, and the per-query
    top-k is the two-phase local-then-merge reduction (_topk_per_query) —
    no full-corpus shuffle, no single-partition-per-query window."""
    c = corpus.select(
        F.col(id_col).alias("cid"), _as_double(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(query_vec_col).alias("qv")
    )
    pairs = c.crossJoin(F.broadcast(q))
    cos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    scored = pairs.select("qid", "cid", cos.alias("cos_sim"))
    return _topk_per_query(scored, k)


def train_codebook(
    corpus: DataFrame,
    n_cells: int = 16,
    sample: int = 2048,
    iters: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Seeded k-means-lite on a bounded driver sample -> (n_cells, dim).

    The sample is capped (default 2048 vectors) so the driver cost is
    constant regardless of corpus size; codebook quality degrades
    gracefully, which is acceptable for IVF cell assignment.
    """
    pdf = (
        corpus.select(_as_double(vec_col).alias("v"))
        .limit(sample)
        .toPandas()
    )
    X = np.stack(pdf["v"].to_numpy())
    rng = np.random.default_rng(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = X[m].mean(axis=0)
    return cents


def assign_cells(
    corpus: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Add the nearest-centroid ``cell`` — one Arrow pass, no shuffle."""
    cb = codebook.astype(np.float64)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy())
            d2 = _sq_dists(X, cb)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "v": pdf["v"].to_numpy(),
                    "cell": d2.argmin(axis=1).astype(np.int32),
                }
            )

    src = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    return src.mapInPandas(assign, "id long, v array<double>, cell int")


def write_ivf_index(corpus_cells: DataFrame, path: str) -> None:
    """Persist assign_cells output partitioned BY CELL.

    This is the scale contract of IVF: with ``cell=`` directories on
    disk, ivf_topk's probed-cell predicate prunes at the scan, so a query
    reads n_probe/n_cells of the corpus instead of all of it.
    """
    corpus_cells.write.mode("overwrite").partitionBy("cell").parquet(path)


def read_ivf_index(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_topk(
    corpus_cells: DataFrame,
    codebook: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    max_driver_queries: int = 100_000,
) -> DataFrame:
    """Approximate top-k: probe only the n_probe nearest cells per query.

    corpus_cells: output of assign_cells (persisted/partitioned by cell
    at scale -> the cell filter becomes partition pruning).

    The query set is collected to the driver to compute probe cells
    against the (tiny) codebook — guarded by ``max_driver_queries`` so a
    corpus-sized DataFrame passed by mistake fails fast instead of
    OOMing the driver.
    """
    qsel = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(query_vec_col).alias("qv")
    )
    qpdf = qsel.limit(max_driver_queries + 1).toPandas()
    if len(qpdf) > max_driver_queries:
        raise ValueError(
            f"ivf_topk collects queries to the driver; got > {max_driver_queries} "
            "rows — pass a bounded query set or raise max_driver_queries"
        )
    cb = codebook.astype(np.float64)
    probes = []
    for r in qpdf.itertuples(index=False):
        qv = np.asarray(r.qv)
        d2 = ((cb - qv[None, :]) ** 2).sum(axis=1)
        for cell in np.argsort(d2)[:n_probe]:
            probes.append((int(r.qid), list(map(float, r.qv)), int(cell)))
    spark = corpus_cells.sparkSession
    qcells = spark.createDataFrame(probes, "qid long, qv array<double>, cell int")
    # STATIC probed-cell pre-filter: the probe set is already known on the
    # driver, so push it as a literal isin predicate.  When corpus_cells
    # is read from a cell-partitioned store (write_ivf_index) this becomes
    # partition pruning at the scan — only probed cell directories are
    # read (asserted by tests/test_plans.py) — instead of relying on
    # runtime DPP through the broadcast join.
    probed_cells = sorted({c for _, _, c in probes})
    joined = corpus_cells.filter(F.col("cell").isin(probed_cells)).join(
        F.broadcast(qcells), "cell"
    )
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    scored = joined.select("qid", F.col("id").alias("cid"), cos.alias("cos_sim"))
    return _topk_per_query(scored, k)


def _hash_uniform(ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-id uniform [0,1) from a splitmix64 finalizer —
    position- and partitioning-independent, vectorized over the batch."""
    with np.errstate(over="ignore"):
        z = (
            ids.astype(np.uint64)
            + np.uint64(0x9E3779B97F4A7C15) * np.uint64(salt + 1)
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _kmeans_parallel_seeds(
    ids_v: DataFrame, n_cells: int, seed: int, rounds: int = 5
) -> np.ndarray:
    """k-means|| init (Bahmani et al., VLDB 2012): O(rounds) corpus
    passes INDEPENDENT of n_cells, replacing maximin's one-pass-per-seed
    (n_cells-1 sequential full scans — a 100-TB killer at realistic IVF
    cell counts of 256-4096).

    Per round, ONE fused narrow Arrow pass both (a) emits the partial
    cost sum(d^2 to nearest current candidate) per Arrow batch and (b)
    samples each point with p = min(1, l*d^2/phi_prev) using the PREVIOUS
    round's cost (the spark.mllib fusion — avoids a separate cost pass
    per round).  l = 2*n_cells oversampling; candidates accumulate to
    ~l*rounds.  A final pass weights each candidate by the number of
    corpus points nearest to it (partial counts per batch), then a
    driver-local weighted Lloyd's reduces the tiny candidate set to
    n_cells seeds.  Total passes: 1 (first seed) + rounds+1 (fused loop;
    its round 0 is cost-only) + 1 (weights) = rounds + 3 — 8 at the
    default rounds=5, independent of n_cells (tested).

    Determinism: sampling uses a splitmix64 hash of (id, round), not an
    RNG, so the candidate set is independent of partitioning and task
    order (partitioning-invariance is tested).
    """
    first = (
        ids_v.withColumn(
            "_h", F.md5(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")))
        )
        .orderBy("_h")
        .limit(1)
        .toPandas()
    )
    cands = [np.asarray(first["v"].iloc[0], dtype=np.float64)]
    ell = 2.0 * n_cells
    # round 0 is cost-only (phi_prev None -> p=0): Bahmani computes the
    # initial cost psi before the first sampling round; fusing it as a
    # no-sample round keeps one pass per round.  rounds+1 loop iters =
    # `rounds` actual sampling rounds.
    phi_prev = None
    for rnd in range(rounds + 1):
        chosen = np.stack(cands)
        prev = phi_prev

        def round_pass(batches, _c=chosen, _prev=prev, _rnd=rnd):
            cost = 0.0
            picked: list[pd.DataFrame] = []
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["v"].to_numpy())
                d2 = _sq_dists(X, _c).min(axis=1)
                cost += float(d2.sum())
                ids = pdf["id"].to_numpy(np.int64)
                u = _hash_uniform(ids, salt=seed * 1000 + _rnd)
                if _prev is None:
                    p = np.zeros(len(d2))  # cost-only round
                elif _prev <= 0.0:
                    p = np.zeros(len(d2))  # candidates already cover corpus
                else:
                    p = np.minimum(1.0, ell * d2 / _prev)
                m = u < p
                if m.any():
                    picked.append(
                        pd.DataFrame(
                            {
                                "id": ids[m],
                                "v": [list(map(float, r)) for r in X[m]],
                                "cost": np.nan,
                            }
                        )
                    )
            yield pd.DataFrame({"id": [-1], "v": [None], "cost": [cost]})
            for p_df in picked:
                yield p_df

        res = ids_v.mapInPandas(
            round_pass, "id long, v array<double>, cost double"
        ).toPandas()
        phi_prev = float(res["cost"].dropna().sum())
        new = res[res["cost"].isna()].sort_values("id")
        for vec in new["v"]:
            cands.append(np.asarray(vec, dtype=np.float64))
        if phi_prev == 0.0 and len(cands) >= n_cells and rnd > 0:
            break
    C = np.stack(cands)

    def weight_pass(batches, _c=C):
        counts = np.zeros(len(_c), dtype=np.int64)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf["v"].to_numpy())
            assign = _sq_dists(X, _c).argmin(axis=1)
            counts += np.bincount(assign, minlength=len(_c))
        yield pd.DataFrame({"cand": np.arange(len(_c)), "n": counts})

    w = (
        ids_v.mapInPandas(weight_pass, "cand int, n long")
        .groupBy("cand")
        .agg(F.sum("n").alias("n"))
        .toPandas()
        .sort_values("cand")
    )
    weights = np.zeros(len(C), dtype=np.float64)
    weights[w["cand"].to_numpy()] = w["n"].to_numpy(np.float64)

    # driver-local weighted Lloyd's on the tiny candidate set.
    # init: weighted maximin over candidates (cheap — |C| ~ l*rounds).
    live = weights > 0
    if live.sum() >= n_cells:
        C, weights = C[live], weights[live]
    if len(C) <= n_cells:
        # degenerate/tiny corpus: pad by repeating candidates
        reps = int(np.ceil(n_cells / len(C)))
        return np.tile(C, (reps, 1))[:n_cells].copy()
    heavy = int(np.argmax(weights))
    sel = [heavy]
    d2 = ((C - C[heavy]) ** 2).sum(axis=1)
    while len(sel) < n_cells:
        score = weights * d2
        if score.max() > 0:
            nxt = int(np.argmax(score))
        elif d2.max() > 0:
            # every positive-weight candidate already selected: fall back
            # to the farthest DISTINCT unselected candidate rather than
            # argmax-of-zeros (which would duplicate C[0] silently)
            nxt = int(np.argmax(d2))
        else:
            break  # no distinct candidates left; pad below
        sel.append(nxt)
        d2 = np.minimum(d2, ((C - C[nxt]) ** 2).sum(axis=1))
    base = len(sel)
    while len(sel) < n_cells:  # degenerate: fewer distinct points than cells
        sel.append(sel[len(sel) % base])
    cents = C[sel].copy()
    # GEMM distance form (_sq_dists) — the broadcast-tensor form is
    # O(|C| * k * dim) memory, catastrophic at |C|~l*rounds, k~4096.
    for _ in range(20):
        a = _sq_dists(C, cents).argmin(axis=1)
        new = cents.copy()
        for c in range(n_cells):
            m = a == c
            if weights[m].sum() > 0:
                new[c] = (C[m] * weights[m, None]).sum(axis=0) / weights[m].sum()
        if np.allclose(new, cents):
            break
        cents = new
    return cents


def ivf_topk_distributed(
    corpus_cells: DataFrame,
    codebook: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
) -> DataFrame:
    """ivf_topk for LARGE query sets (ANN-dedup-style workloads where the
    queries are themselves a corpus): probe-cell assignment runs as a
    narrow Arrow pass over the query DataFrame — no driver collect, no
    max_driver_queries bound — and candidates come from an equi-join on
    ``cell``.

    Trade-off vs ivf_topk: the probed-cell set is not known on the
    driver, so there is no static isin partition prune; with a
    cell-partitioned store the prune can still happen at runtime via
    dynamic partition pruning when the probe side broadcasts, and with
    query sets large enough to probe most cells the prune is moot anyway
    (that is the regime this variant exists for).  Results are identical
    to ivf_topk for the same inputs (tested).
    """
    cb = codebook.astype(np.float64)
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(query_vec_col).alias("qv")
    )

    def probes(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Q = np.stack(pdf["qv"].to_numpy())
            d2 = _sq_dists(Q, cb)
            npb = min(n_probe, d2.shape[1])
            order = np.argsort(d2, axis=1)[:, :npb]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(pdf["qid"].to_numpy(), npb),
                    "qv": np.repeat(pdf["qv"].to_numpy(), npb),
                    "cell": order.reshape(-1).astype(np.int32),
                }
            )

    qcells = q.mapInPandas(probes, "qid long, qv array<double>, cell int")
    joined = corpus_cells.join(qcells, "cell")
    cos = _dot(F.col("v"), F.col("qv")) / (_norm(F.col("v")) * _norm(F.col("qv")))
    scored = joined.select("qid", F.col("id").alias("cid"), cos.alias("cos_sim"))
    return _topk_per_query(scored, k)


def train_codebook_distributed(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    init_rounds: int = 5,
) -> np.ndarray:
    """Distributed Lloyd's k-means over the FULL corpus.

    Upgrades train_codebook (bounded driver sample) for corpora whose
    distribution a sample cannot represent.  Scale shape per iteration:
    one narrow Arrow pass assigns vectors and emits PER-ARROW-BATCH
    partial (cell, sum_vector, count) rows — O(batches * n_cells) tiny
    rows, never the vectors themselves — which a driver-side combine
    reduces to the new centroids (n_cells * dim doubles).  No shuffle of
    corpus rows at any point; total network traffic per iteration is
    centroids out (broadcast via closure) + partials back.

    Init is k-means|| (_kmeans_parallel_seeds): init_rounds + 2 corpus
    passes regardless of n_cells — the round-3 maximin init cost one
    full corpus scan PER SEED.  Deterministic and partitioning-
    independent (hash sampling, not RNG).  Empty cells keep their
    previous centroid.
    """
    ids_v = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    cents = _kmeans_parallel_seeds(ids_v, n_cells, seed, rounds=init_rounds)
    src = corpus.select(_as_double(vec_col).alias("v"))

    for _ in range(iters):
        cb = cents.copy()

        def partials(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["v"].to_numpy())
                assign = _sq_dists(X, cb).argmin(axis=1)
                cells, counts = np.unique(assign, return_counts=True)
                sums = np.zeros((len(cells), X.shape[1]))
                for j, c in enumerate(cells):
                    sums[j] = X[assign == c].sum(axis=0)
                yield pd.DataFrame(
                    {
                        "cell": cells.astype(np.int32),
                        "s": list(sums),
                        "n": counts.astype(np.int64),
                    }
                )

        agg = src.mapInPandas(
            partials, f"cell int, s array<double>, n long"
        ).toPandas()
        new = cents.copy()
        for c in range(n_cells):
            rows = agg[agg["cell"] == c]
            if len(rows):
                total = np.sum(np.stack(rows["s"].to_numpy()), axis=0)
                new[c] = total / rows["n"].sum()
        cents = new
    return cents


# ---------------------------------------------------------------------------
# Product quantization (PQ): byte-code ANN — the memory/IO scale path
# ---------------------------------------------------------------------------

def _normalize_rows(X: np.ndarray) -> np.ndarray:
    n = np.sqrt((X * X).sum(axis=1))
    return X / np.where(n == 0.0, 1.0, n)[:, None]


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    sample: int = 2048,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Per-subspace k-means codebooks -> (m, n_codes, dim/m).

    Vectors are L2-NORMALIZED first (the PQ pipeline ranks by L2 on the
    unit sphere, which is cosine order: d2 = 2 - 2*cos).  The training
    sample is the first ``sample`` vectors BY ID (orderBy + limit — a
    deterministic TakeOrdered, no full shuffle), so the codebooks are
    reproducible for the golden twin.  Distances use the naive
    (x - c)^2 broadcast form — subspace dim is tiny (dim/m), so the GEMM
    expansion's cancellation risk isn't worth it here.
    """
    pdf = (
        corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
        .orderBy("id")
        .limit(sample)
        .toPandas()
    )
    X = _normalize_rows(np.stack(pdf["v"].to_numpy()).astype(np.float64))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = np.empty((m, n_codes, dsub))
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        cents = S[rng.choice(len(S), size=min(n_codes, len(S)), replace=False)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                mask = assign == c
                if mask.any():
                    cents[c] = S[mask].mean(axis=0)
        books[j, : len(cents)] = cents
        if len(cents) < n_codes:  # degenerate tiny sample: pad with copies
            books[j, len(cents) :] = cents[0]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to ``m`` small codes (nearest subspace centroid).

    One Arrow pass, no shuffle.  The output is ``m`` ints per vector
    instead of ``dim`` floats — a 32x narrower corpus at dim=64/m=8
    (float32), which is what makes exhaustive ADC scans and in-memory
    candidate stores viable at 100 TB.  Output: id, code array<int>.
    """
    cb = codebooks.astype(np.float64)
    m, _, dsub = cb.shape

    def encode(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _normalize_rows(np.stack(pdf["v"].to_numpy()).astype(np.float64))
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                d2 = ((S[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "code": list(codes)})

    src = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    return src.mapInPandas(encode, "id long, code array<int>")


def pq_topk(
    codes: DataFrame,
    codebooks: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    query_id_col: str = "qid",
    query_vec_col: str = "qvec",
    max_driver_queries: int = 100_000,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    Per query, a (m x n_codes) lookup table of exact subspace distances
    to the NORMALIZED query is built once; each corpus code then scores
    in m table gathers (no float vector math per row).  Scores are
    emitted as approximate cosine (1 - d2/2, exact on the unit sphere up
    to quantization) and reduced by the same two-phase local-top-k as
    brute force — no full-corpus shuffle.  The query side is collected
    at the driver, guarded by ``max_driver_queries`` exactly like
    ivf_topk: a corpus-sized DataFrame passed by mistake fails fast
    instead of OOMing the driver.
    """
    cb = codebooks.astype(np.float64)
    m, n_codes, dsub = cb.shape
    qpdf = (
        queries.select(
            F.col(query_id_col).alias("qid"), _as_double(query_vec_col).alias("qv")
        )
        .limit(max_driver_queries + 1)
        .toPandas()
    )
    if len(qpdf) > max_driver_queries:
        raise ValueError(
            f"pq_topk collects queries to the driver; got > {max_driver_queries} "
            "rows — pass a bounded query set or raise max_driver_queries"
        )
    qids = qpdf["qid"].tolist()
    Q = _normalize_rows(
        np.stack([np.asarray(v, np.float64) for v in qpdf["qv"]])
    )
    luts = np.empty((len(qids), m, n_codes))
    for qi, qv in enumerate(Q):
        for j in range(m):
            qs = qv[j * dsub : (j + 1) * dsub]
            luts[qi, j] = ((cb[j] - qs[None, :]) ** 2).sum(axis=1)

    jj = np.arange(m)

    def adc(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["code"].to_numpy()).astype(np.int64)
            ids = pdf["id"].to_numpy()
            frames = []
            for qi, qid in enumerate(qids):
                d2 = luts[qi][jj[None, :], C].sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {"qid": qid, "cid": ids, "cos_sim": 1.0 - d2 / 2.0}
                    )
                )
            yield pd.concat(frames)

    qid_t = "long" if isinstance(qids[0], (int, np.integer)) else "string"
    scored = codes.mapInPandas(adc, f"qid {qid_t}, cid long, cos_sim double")
    return _topk_per_query(scored, k)
