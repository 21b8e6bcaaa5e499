"""Generators + numpy oracle self-tests (reference parity: golden fixture = 78 CCs)."""

from __future__ import annotations

import numpy as np

from graphzeppelin_spark import oracle
from graphzeppelin_spark.sources.generators import (
    dynamic_erdos_stream,
    kron_stream,
    multiples_graph_stream,
    path_graph_stream,
)


def test_multiples_graph_golden():
    # reference golden fixture: 1024 vertices, 5206 updates, 78 components
    s = multiples_graph_stream(1024)
    assert len(s) == 5206
    edges = oracle.live_edges(s, 1024)
    assert len(edges) == 5206  # insert-only, no duplicates
    labels = oracle.connected_components(edges, 1024)
    assert len(np.unique(labels)) == 78


def test_toggle_semantics():
    s = dynamic_erdos_stream(num_vertices=64, density=0.1, rounds=2, seed=7)
    edges = oracle.live_edges(s, 64)
    # manual parity recount
    eid = s["src"].to_numpy() * 64 + s["dst"].to_numpy()
    lo = np.minimum(s["src"], s["dst"]).to_numpy()
    hi = np.maximum(s["src"], s["dst"]).to_numpy()
    eid = lo * 64 + hi
    uniq, counts = np.unique(eid, return_counts=True)
    expected = set(uniq[counts % 2 == 1].tolist())
    got = set((edges[:, 0] * 64 + edges[:, 1]).tolist())
    assert got == expected
    assert len(got) > 0


def test_erdos_stream_has_deletes_and_is_deterministic():
    s1 = dynamic_erdos_stream(num_vertices=256, density=0.03, rounds=3, seed=42)
    s2 = dynamic_erdos_stream(num_vertices=256, density=0.03, rounds=3, seed=42)
    assert s1.equals(s2)
    assert (s1["type"] == 1).sum() > 0


def test_kron_stream_power_law_and_deletes():
    s = kron_stream(scale=10, edge_factor=8, seed=42)
    assert (s["type"] == 1).sum() > 0
    n = 1 << 10
    assert s["src"].max() < n and s["dst"].max() < n
    edges = oracle.live_edges(s, n)
    deg = np.bincount(np.concatenate([edges[:, 0], edges[:, 1]]), minlength=n)
    # power law: max degree much larger than mean degree
    assert deg.max() > 8 * max(deg.mean(), 1)


def test_path_graph_single_component():
    s = path_graph_stream(128, seed=3)
    edges = oracle.live_edges(s, 128)
    labels = oracle.connected_components(edges, 128)
    assert len(np.unique(labels)) == 1


def test_oracle_pagerank_sums_to_one():
    s = kron_stream(scale=8, edge_factor=4, seed=1)
    edges = oracle.live_edges(s, 256)
    r = oracle.pagerank(edges, 256)
    assert abs(r.sum() - 1.0) < 1e-8


def test_oracle_triangles_known():
    # K4 has 4 triangles
    edges = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]])
    assert oracle.triangle_count(edges, 4) == 4
