"""Fixed-point PageRank over the deterministic LCG link graph
(operators/linkgraph.py)."""

import numpy as np
import pytest

from afspark.operators.linkgraph import (
    SCALE,
    derive_links,
    pagerank_fixed,
)


def _numpy_twin(n: int, n_iter: int = 3, d: float = 0.85, deg: int = 3):
    """Local fixed-point PageRank twin with the identical flooring."""
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    j = np.tile(np.arange(deg, dtype=np.int64), n)
    dst = (src * 1103515245 + j * 12345 + 7) % n
    r = np.full(n, SCALE // n, dtype=np.int64)
    base = int(np.floor((1.0 - d) * SCALE / n))
    for _ in range(n_iter):
        contrib = np.floor(r[src] / float(deg)).astype(np.int64)
        mass = np.zeros(n, dtype=np.int64)
        np.add.at(mass, dst, contrib)
        r = base + np.floor(d * mass).astype(np.int64)
    return r


@pytest.fixture(scope="module")
def nodes(spark):
    return spark.range(40).withColumnRenamed("id", "doc_id")


def test_matches_numpy_twin(spark, nodes):
    edges = derive_links(nodes, out_degree=3)
    got = {
        r["doc_id"]: r["rank_fp"]
        for r in pagerank_fixed(nodes, edges, n_iter=3).collect()
    }
    want = _numpy_twin(40)
    assert got == {i: int(want[i]) for i in range(40)}


def test_out_degree_exact(spark, nodes):
    edges = derive_links(nodes, out_degree=3)
    per_src = {r["src"]: r["n"] for r in
               edges.groupBy("src").count().withColumnRenamed(
                   "count", "n").collect()}
    assert per_src == {i: 3 for i in range(40)}


def test_mass_approximately_conserved(spark, nodes):
    # flooring only ever REMOVES mass: total stays within
    # n_iter * n * (deg + 2) units of SCALE
    edges = derive_links(nodes, out_degree=3)
    out = pagerank_fixed(nodes, edges, n_iter=3)
    total = out.groupBy().sum("rank_fp").collect()[0][0]
    assert SCALE - 3 * 40 * 5 <= total <= SCALE


def test_checkpoint_path_identical(spark, nodes):
    edges = derive_links(nodes, out_degree=3)
    a = pagerank_fixed(nodes, edges, n_iter=4).collect()
    b = pagerank_fixed(nodes, edges, n_iter=4, checkpoint_every=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestHits:
    def _numpy_hits(self, n, n_iter=2, deg=3):
        src = np.repeat(np.arange(n, dtype=np.int64), deg)
        j = np.tile(np.arange(deg, dtype=np.int64), n)
        dst = (src * 1103515245 + j * 12345 + 7) % n
        h = np.full(n, SCALE // n, dtype=np.int64)

        def half(score, frm, to):
            raw = np.zeros(n, dtype=np.int64)
            np.add.at(raw, to, score[frm])
            t = float(raw.sum())
            return np.floor(raw * float(SCALE) / t).astype(np.int64)

        a = None
        for _ in range(n_iter):
            a = half(h, src, dst)
            h = half(a, dst, src)
        return h, a

    def test_matches_numpy_twin(self, spark, nodes):
        from afspark.operators.linkgraph import hits_fixed

        edges = derive_links(nodes, out_degree=3)
        got = {
            r["doc_id"]: (r["hub_fp"], r["auth_fp"])
            for r in hits_fixed(nodes, edges, n_iter=2).collect()
        }
        h, a = self._numpy_hits(40)
        assert got == {i: (int(h[i]), int(a[i])) for i in range(40)}

    def test_mass_normalized(self, spark, nodes):
        from afspark.operators.linkgraph import hits_fixed

        edges = derive_links(nodes, out_degree=3)
        rows = hits_fixed(nodes, edges, n_iter=1).collect()
        th = sum(r["hub_fp"] for r in rows)
        ta = sum(r["auth_fp"] for r in rows)
        # flooring removes < n units from each normalized vector
        assert SCALE - 40 <= th <= SCALE
        assert SCALE - 40 <= ta <= SCALE


def test_triangle_counts_known_graphs(spark):
    from afspark.operators.linkgraph import triangle_counts

    # K4 on {0..3}: every node in C(3,2)=3 triangles; square {10..13}: none;
    # star hub 20: none; dup/self edges must not inflate counts
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    square = [(10, 11), (11, 12), (12, 13), (13, 10)]
    star = [(20, x) for x in (21, 22, 23, 24)]
    noise = [(0, 0), (1, 0), (2, 1)]  # self-loop + reversed dups
    edges = spark.createDataFrame(
        k4 + square + star + noise, "src long, dst long"
    )
    got = {r.node: r.triangles for r in triangle_counts(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_clustering_coefficient_known_graphs(spark):
    from afspark.operators.linkgraph import clustering_coefficient

    # K4: cc=1 everywhere; path 10-11-12: middle node cc=0; deg-1 nodes absent
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    path = [(10, 11), (11, 12)]
    edges = spark.createDataFrame(k4 + path, "src long, dst long")
    got = {r.node: (r.deg, r.triangles, r.cc) for r in
           clustering_coefficient(edges).collect()}
    for n in range(4):
        assert got[n] == (3, 3, 1.0)
    assert got[11] == (2, 0, 0.0)
    assert 10 not in got and 12 not in got  # degree-1: undefined
