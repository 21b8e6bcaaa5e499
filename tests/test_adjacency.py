"""CSR-blocked adjacency operators vs the join-based path and the oracle."""

from __future__ import annotations

import numpy as np

from graphzeppelin_spark import oracle
from graphzeppelin_spark.operators.adjacency import (
    _csr_from_pairs,
    _wedges_from_csr,
    triangle_count_csr,
)
from graphzeppelin_spark.sources.generators import kron_stream
from tests.conftest import edges_df


def test_wedge_generation_matches_bruteforce():
    rng = np.random.default_rng(7)
    u = rng.integers(0, 40, 400)
    w = rng.integers(100, 180, 400)
    uw = np.unique(u * 1000 + w)
    u, w = uw // 1000, uw % 1000
    uniq, indptr, idx = _csr_from_pairs(u, w)
    v1, v2, apex = _wedges_from_csr(uniq, indptr, idx)
    got = set(zip(apex.tolist(), v1.tolist(), v2.tolist()))
    exp = set()
    for k, a in enumerate(uniq):
        nbrs = idx[indptr[k] : indptr[k + 1]]
        for x in range(len(nbrs)):
            for y in range(x + 1, len(nbrs)):
                p, q = int(nbrs[x]), int(nbrs[y])
                exp.add((int(a), min(p, q), max(p, q)))
    assert got == exp


def test_triangle_count_csr_vs_oracle(spark):
    n = 256
    s = kron_stream(scale=8, edge_factor=6, seed=2)
    edges_np = oracle.live_edges(s, n)
    expected = oracle.triangle_count(edges_np, n)
    got = triangle_count_csr(edges_df(spark, edges_np), num_partitions=4).collect()[0][
        "n_triangles"
    ]
    assert got == expected


def test_triangle_count_csr_empty_adjacency(spark):
    edges = np.array([[0, 1], [2, 3]])  # no wedges at all
    got = triangle_count_csr(edges_df(spark, edges)).collect()[0]["n_triangles"]
    assert got == 0
