"""Exact numpy oracle — the GraphVerifier twin (reference test/util/graph_verifier.cpp).

Maintains edge liveness under toggle updates (parity of occurrence counts) and
recomputes ground truth with plain union-find / dense linear algebra. Used only
by tests and as the internal verifier for sampled sketch edges; never by the
engine's distributed paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def live_edges(stream: pd.DataFrame, num_vertices: int, upto_seq: int | None = None) -> np.ndarray:
    """Edges live after replaying the stream (toggle semantics): seen odd # times.

    Returns an (m, 2) int64 array of canonical (lo, hi) edges, sorted.
    Mirrors reference graph_verifier.cpp:62 (adj_matrix[src][dst] ^= 1).
    """
    pdf = stream if upto_seq is None else stream[stream["seq"] < upto_seq]
    src = pdf["src"].to_numpy(dtype=np.int64)
    dst = pdf["dst"].to_numpy(dtype=np.int64)
    lo = np.minimum(src, dst)
    hi = np.maximum(src, dst)
    eid = lo * np.int64(num_vertices) + hi
    uniq, counts = np.unique(eid, return_counts=True)
    odd = uniq[counts % 2 == 1]
    return np.stack([odd // num_vertices, odd % num_vertices], axis=1)


class UnionFind:
    """Plain path-compressing union-find (the oracle's DSU; reference dsu.h behavior)."""

    def __init__(self, n: int):
        self.parent = np.arange(n, dtype=np.int64)
        self.size = np.ones(n, dtype=np.int64)

    def find(self, x: int) -> int:
        root = x
        p = self.parent
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return int(root)

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]
        return True


def connected_components(edges: np.ndarray, num_vertices: int) -> np.ndarray:
    """Canonical CC labeling: label[v] = min vertex id in v's component."""
    uf = UnionFind(num_vertices)
    for s, d in edges:
        uf.union(int(s), int(d))
    roots = np.array([uf.find(v) for v in range(num_vertices)], dtype=np.int64)
    # canonicalize root -> min member
    order = np.argsort(roots, kind="stable")
    labels = np.empty(num_vertices, dtype=np.int64)
    sorted_roots = roots[order]
    boundaries = np.concatenate([[0], np.nonzero(np.diff(sorted_roots))[0] + 1, [num_vertices]])
    for i in range(len(boundaries) - 1):
        members = order[boundaries[i] : boundaries[i + 1]]
        labels[members] = members.min()
    return labels


def pagerank(
    edges: np.ndarray,
    num_vertices: int,
    damping: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 200,
    directed: bool = False,
    num_iters: int | None = None,
) -> np.ndarray:
    """Power-iteration PageRank; dangling mass redistributed uniformly.

    If num_iters is given, runs exactly that many iterations (for lockstep
    comparison with unrolled SQL oracles); otherwise iterates to tol.
    """
    n = num_vertices
    if directed:
        src, dst = edges[:, 0], edges[:, 1]
    else:
        src = np.concatenate([edges[:, 0], edges[:, 1]])
        dst = np.concatenate([edges[:, 1], edges[:, 0]])
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    iters = num_iters if num_iters is not None else max_iter
    for _ in range(iters):
        contrib = np.where(outdeg > 0, r / np.maximum(outdeg, 1), 0.0)
        incoming = np.bincount(dst, weights=contrib[src], minlength=n)
        dangling = r[outdeg == 0].sum()
        r_new = (1 - damping) / n + damping * (incoming + dangling / n)
        delta = np.abs(r_new - r).max()
        r = r_new
        if num_iters is None and delta < tol:
            break
    return r


def triangle_count(edges: np.ndarray, num_vertices: int) -> int:
    """Exact triangle count via sorted adjacency-set intersection."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        s, d = int(s), int(d)
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    count = 0
    for s, d in edges:
        s, d = int(s), int(d)
        if s in adj and d in adj:
            count += len(adj[s] & adj[d])
    return count // 3


def spanning_forest_is_valid(
    forest: np.ndarray, edges: np.ndarray, num_vertices: int
) -> bool:
    """Validity check mirroring verify_spanning_forests (graph_verifier.cpp:107-149):
    every forest edge exists in the graph, the forest is acyclic, and it connects
    exactly the true components (same labeling as the full graph)."""
    edge_set = {(int(min(s, d)), int(max(s, d))) for s, d in edges}
    uf = UnionFind(num_vertices)
    for s, d in forest:
        s, d = int(s), int(d)
        if (min(s, d), max(s, d)) not in edge_set:
            return False
        if not uf.union(s, d):  # cycle
            return False
    forest_labels = np.array([uf.find(v) for v in range(num_vertices)])
    true_labels = connected_components(edges, num_vertices)
    # same partition iff label maps are bijective over vertices
    pairs = set(zip(forest_labels.tolist(), true_labels.tolist()))
    return len(pairs) == len(set(true_labels.tolist())) == len(set(forest_labels.tolist()))
