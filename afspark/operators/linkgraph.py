"""Link-graph analytics: deterministic edge derivation + fixed-point
PageRank by iterative join-aggregate.

A Common-Crawl-style corpus is a hyperlink graph; rank mass is the
classic page-importance signal a training-data pipeline mixes into
quality scoring (the reference has no graph surface — SURVEY.md §2 is
feature kernels — this extends the engine the way the dedup/similarity
family does).

Spark-first shape: each PageRank iteration is ONE equi-join
(ranks ⋈ edges on src) + ONE keyed aggregation (mass by dst) + one
left-join back to the node set — no Pregel runtime, no RDDs, and the
plan is the same join-agg Catalyst already optimizes.  At scale the two
standing optimizations are (a) pre-partition edges by src once and reuse
that partitioning every iteration (shuffle only ranks, which are
n_nodes-sized, never the edge set), and (b) truncate the growing lineage
with localCheckpoint every few iterations (``checkpoint_every``) so the
driver's plan and the DAG don't deepen linearly — both standard for
iterative DataFrame algorithms.

Determinism contract (the driver oracle hashes values): ranks are kept
in FIXED-POINT integer units (1e12 = total mass 1.0).  Every edge
contribution is floored to an integer before the sum, so each
iteration's aggregate is an exact integer sum — order-independent across
engines and partitionings.  The quantization error vs float PageRank is
< out_degree × n_iter ulps of 1e-12 per node — far below any ranking
use — and the SQL twin reproduces the identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # fixed-point mass units per 1.0


def derive_links(
    docs: DataFrame,
    out_degree: int = 3,
    id_col: str = "doc_id",
    n_nodes: int | None = None,
) -> DataFrame:
    """Deterministic synthetic hyperlinks: node i links to
    (i*1103515245 + j*12345 + 7) mod n for j in 0..out_degree-1 (LCG
    constants from the classic glibc rand; self-loops and duplicate
    targets are kept — every node has exactly ``out_degree`` out-edges,
    so there is no dangling-mass branch).

    Requires contiguous ids 0..n-1 (the documents table's layout).  The
    modulus n is ONE driver-side scalar count (pass ``n_nodes`` to skip
    even that), folded into the expression as a literal — embedding it
    as a scalar subquery instead would splice a 1-row
    BroadcastNestedLoopJoin + full count scan into every consumer of
    the edge set.
    """
    n = int(docs.count()) if n_nodes is None else int(n_nodes)
    offs = F.array(*[F.lit(j) for j in range(out_degree)])
    return (
        docs.select(F.col(id_col).alias("src"))
        .select("src", F.explode(offs).alias("_j"))
        .select(
            "src",
            ((F.col("src") * F.lit(1103515245)
              + F.col("_j") * F.lit(12345) + F.lit(7))
             % F.lit(n)).alias("dst"),
        )
    )


def pagerank_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 3,
    damping: float = 0.85,
    out_degree: int = 3,
    id_col: str = "doc_id",
    checkpoint_every: int = 0,
    n_nodes: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank, ``n_iter`` synchronous iterations from the
    uniform vector:  r' = floor((1-d)*SCALE/n) + floor(d * Σ_in floor(r/deg)).

    All inner sums are exact integers (see module docstring); the two
    float products (r/deg before floor, d*mass before floor) are single
    IEEE ops on integer-valued doubles — bit-identical across engines.

    ``checkpoint_every=k`` localCheckpoints the rank vector every k
    iterations (0 = never): at 100-TB edge scale the plan otherwise
    re-derives all prior iterations on every action and the lineage
    deepens linearly.  Edges are reused unchanged every iteration —
    persist/bucket them by src upstream for shuffle reuse.

    n is ONE driver-side scalar count (pass ``n_nodes``) folded into the
    init/base literals; embedding it as a scalar subquery would add a
    1-row BroadcastNestedLoopJoin + a full node-count scan to EVERY
    iteration of the unrolled plan (observed: 4 extra scans at
    n_iter=3 before this was lifted).
    """
    import math

    n = int(nodes.count()) if n_nodes is None else int(n_nodes)
    # identical IEEE arithmetic to the SQL twin's floor(<double>/n)
    ranks = nodes.select(
        F.col(id_col).alias("_id"),
        F.lit(int(math.floor(float(SCALE) / n))).alias("_r"),
    )
    base = int(math.floor((1.0 - damping) * SCALE / n))
    for it in range(n_iter):
        mass = (
            edges.join(
                ranks.select(F.col("_id").alias("src"), "_r"), "src"
            )
            .select(
                "dst",
                F.floor(F.col("_r") / F.lit(float(out_degree)))
                .cast("long").alias("_c"),
            )
            .groupBy("dst")
            .agg(F.sum("_c").alias("_mass"))
        )
        ranks = (
            ranks.select("_id")
            .join(mass.withColumnRenamed("dst", "_id"), "_id", "left")
            .select(
                "_id",
                (F.lit(base)
                 + F.floor(
                     F.lit(damping) * F.coalesce("_mass", F.lit(0))
                 ).cast("long")).alias("_r"),
            )
        )
        if checkpoint_every and (it + 1) % checkpoint_every == 0:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks.select(
        F.col("_id").alias(id_col),
        F.col("_r").alias("rank_fp"),
        (F.col("_r") / F.lit(float(SCALE))).alias("rank"),
    )


def hits_fixed(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 2,
    id_col: str = "doc_id",
    n_nodes: int | None = None,
) -> DataFrame:
    """HITS hubs & authorities (Kleinberg), ``n_iter`` synchronous
    rounds in fixed-point integers: auth = Σ_in hub, hub = Σ_out auth,
    each re-normalized to total mass SCALE after every half-step.

    Normalization needs the global mass — folded in as a broadcast
    scalar crossJoin (one-row aggregate subplan, no driver collect(),
    no synchronous barrier per half-step; same pattern as
    profile.py's chi² total).  The normalizing division
    floor(x * SCALE_float / total) is a single identical IEEE
    expression per engine, applied to exact-integer x — cross-engine
    deterministic like pagerank_fixed.

    Because the raw-mass frame is referenced TWICE per half-step (the
    total subplan and the normalized output), it is lazily
    localCheckpoint-ed first: without that the logical plan doubles
    every half-step (2^(2·n_iter) copies of the innermost join — plan
    analysis alone hangs past n_iter≈8), and the broadcast job would
    recompute the whole prefix.  The checkpoint caches one node-sized
    vector per half-step (same lineage-truncation dial as
    pagerank_fixed's checkpoint_every).

    Scale shape per half-step: one equi-join (scores ⋈ edges) + one
    keyed aggregation — identical shuffle profile to a PageRank
    iteration.  Output: id, hub_fp, auth_fp (fixed-point, SCALE = 1.0
    total mass each).
    """
    if n_iter < 1:
        raise ValueError("hits_fixed needs n_iter >= 1 (auth is undefined "
                         "before the first half-step)")
    n = int(nodes.count()) if n_nodes is None else int(n_nodes)
    ids = nodes.select(F.col(id_col).alias("_id"))
    init = int(SCALE // n) if n else 0
    hub = ids.select("_id", F.lit(init).alias("_h"))

    def _half(scores, score_col, src_col, dst_col, out_col):
        """out[dst] = sum over edges of score[src]; then normalize."""
        mass = (
            edges.join(
                scores.select(F.col("_id").alias(src_col), score_col),
                src_col,
            )
            .groupBy(dst_col)
            .agg(F.sum(score_col).alias("_m"))
        )
        raw = ids.join(
            mass.withColumnRenamed(dst_col, "_id"), "_id", "left"
        ).select("_id", F.coalesce("_m", F.lit(0)).alias("_raw"))
        # raw feeds both the total subplan and the output: checkpoint it
        # so the plan stays linear in n_iter and raw computes once
        raw = raw.localCheckpoint(eager=False)
        total = raw.agg(
            F.greatest(F.sum("_raw"), F.lit(1)).alias("_tot")
        )
        return raw.crossJoin(F.broadcast(total)).select(
            "_id",
            F.floor(
                F.col("_raw") * F.lit(float(SCALE))
                / F.col("_tot").cast("double")
            ).cast("long").alias(out_col),
        )

    auth = None
    for _ in range(n_iter):
        auth = _half(
            hub.select("_id", F.col("_h")), "_h", "src", "dst", "_a"
        )
        hub = _half(
            auth.select("_id", F.col("_a")), "_a", "dst", "src", "_h"
        )
    return (
        hub.join(auth, "_id")
        .select(
            F.col("_id").alias(id_col),
            F.col("_h").alias("hub_fp"),
            F.col("_a").alias("auth_fp"),
        )
    )


def _undirected_simple(edges: DataFrame, src_col: str, dst_col: str) -> DataFrame:
    """Undirected simple graph (u < v) induced by an edge list."""
    return (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v"))
        .distinct()
    )


def _degrees(und: DataFrame) -> DataFrame:
    """(x, d) undirected degree table of a (u, v) simple-edge frame."""
    return (
        und.select(F.col("u").alias("x"))
        .unionAll(und.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )


def triangle_counts(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    und: DataFrame | None = None,
    deg: DataFrame | None = None,
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph induced
    by the edge list (self-loops and duplicates dropped) — the local
    clustering-coefficient numerator and a standard web-graph spam /
    community signal.

    Algorithm: degree-ordered wedge join (the MapReduce-classic "count
    on the smallest vertex").  Every undirected edge is ORIENTED from
    the lower-rank endpoint to the higher, ranking by (degree, id); a
    wedge a->b, a->c (b<c by the same order) closes iff oriented edge
    b->c exists.  Orientation bounds each vertex's oriented out-degree
    by O(sqrt(E)) regardless of hubs, so the wedge self-join's fan-out
    is O(E^1.5) worst-case instead of sum(deg^2) — the difference
    between feasible and not on a power-law web graph.

    Three shuffles, all equi-joins on vertex keys (degree join, wedge
    join, closing-edge semi-join); counts aggregate map-side.  Each
    triangle is counted exactly once at its lowest-rank vertex; the
    per-node output credits all three corners via the final explode.

    ``und``/``deg`` accept the caller's precomputed simple-edge and
    degree frames (clustering_coefficient shares them — identical
    subplans let Spark's ReuseExchange serve both sides of the reuse
    from one shuffle).
    """
    if und is None:
        und = _undirected_simple(edges, src_col, dst_col)
    if deg is None:
        deg = _degrees(und)
    ranked = (
        und.join(deg.withColumnRenamed("x", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("x", "v").withColumnRenamed("d", "dv"), "v")
    )
    lower_u = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_u, F.col("u")).otherwise(F.col("v")).alias("lo"),
        F.when(lower_u, F.col("v")).otherwise(F.col("u")).alias("hi"),
        F.when(lower_u, F.col("du")).otherwise(F.col("dv")).alias("dlo"),
        F.when(lower_u, F.col("dv")).otherwise(F.col("du")).alias("dhi"),
    )
    e1 = oriented.select("lo", "hi", "dlo", "dhi")
    # wedges at the lowest-rank corner: pair the out-neighbors of `lo`,
    # ordered between themselves by the SAME (degree, id) rank
    l = e1.select(F.col("lo").alias("a"), F.col("hi").alias("b"),
                  F.col("dhi").alias("db"))
    r = e1.select(F.col("lo").alias("a"), F.col("hi").alias("c"),
                  F.col("dhi").alias("dc"))
    wedge = l.join(r, "a").filter(
        (F.col("db") < F.col("dc"))
        | ((F.col("db") == F.col("dc")) & (F.col("b") < F.col("c")))
    )
    closing = e1.select(F.col("lo").alias("b"), F.col("hi").alias("c"))
    tri = wedge.join(closing, ["b", "c"], "left_semi")
    per_corner = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return per_corner.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles")
    )


def clustering_coefficient(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: triangles / C(deg, 2)
    over the undirected simple graph — 1.0 means the neighborhood is a
    clique, 0 a star.  Nodes of degree < 2 are excluded (coefficient
    undefined).  The division is one IEEE op on two exact integers
    (2*triangles and deg*(deg-1)) so the value is engine-portable.

    Cost is triangle_counts plus one equi-join: the simple-edge dedup
    and degree frames are built once and SHARED with the triangle stage
    (identical subplans — Spark's ReuseExchange serves both consumers
    from one shuffle; previously each was computed twice).
    """
    und = _undirected_simple(edges, src_col, dst_col)
    degs = _degrees(und)
    deg = degs.select(F.col("x").alias("node"), F.col("d").alias("deg"))
    tri = triangle_counts(edges, src_col, dst_col, und=und, deg=degs)
    j = deg.filter(F.col("deg") >= 2).join(tri, "node", "left")
    t2 = F.coalesce(F.col("triangles"), F.lit(0)).cast("long") * 2
    return j.select(
        "node",
        "deg",
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        (
            t2.cast("double") / (F.col("deg") * (F.col("deg") - 1)).cast("double")
        ).alias("cc"),
    )
