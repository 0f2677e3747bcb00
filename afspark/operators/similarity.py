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
    dim=768, an executor OOM at realistic embedding widths)."""
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


def train_codebook_distributed(
    corpus: DataFrame,
    n_cells: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
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

    Deterministic farthest-point init (maximin): seed 1 is the vector
    with the smallest md5(seed || id) (position-independent); each next
    seed is the corpus point farthest from the chosen set (ties broken by
    id) — one narrow pass per seed, partial max per Arrow batch, so
    well-separated clusters always receive a seed (random init can put
    every seed in one blob and Lloyd's cannot recover).  Empty cells keep
    their previous centroid.
    """
    ids_v = corpus.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    first = (
        ids_v.withColumn(
            "_h", F.md5(F.concat(F.lit(f"{seed}:"), F.col("id").cast("string")))
        )
        .orderBy("_h")
        .limit(1)
        .toPandas()
    )
    seeds = [np.asarray(first["v"].iloc[0], dtype=np.float64)]
    while len(seeds) < n_cells:
        chosen = np.stack(seeds)

        def far_partial(batches):
            best = None  # (dist, -id, vec) — max dist, tie -> smallest id
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.stack(pdf["v"].to_numpy())
                d2 = _sq_dists(X, chosen).min(axis=1)
                ids = pdf["id"].to_numpy()
                order = np.lexsort((ids, -d2))  # max d2, then min id
                i = order[0]
                cand = (float(d2[i]), int(ids[i]), list(map(float, X[i])))
                if best is None or (cand[0], -cand[1]) > (best[0], -best[1]):
                    best = cand
            if best is not None:
                yield pd.DataFrame(
                    {"d2": [best[0]], "id": [best[1]], "v": [best[2]]}
                )

        cand = ids_v.mapInPandas(
            far_partial, "d2 double, id long, v array<double>"
        ).toPandas()
        cand = cand.sort_values(["d2", "id"], ascending=[False, True]).iloc[0]
        seeds.append(np.asarray(cand["v"], dtype=np.float64))
    cents = np.stack(seeds)
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
