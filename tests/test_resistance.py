"""Tests for resistance_distance (CG solve) vs a dense pinv replica of
the reference (which imports scipy, absent here)."""

import networkx as nx
import numpy as np
import pytest

from linkgraph.exceptions import NetworkXError, NotImplementedForDirected
from linkgraph.graph import from_nx
from linkgraph.algos.resistance import resistance_distance


def _ref(G, a, b, weight=None, invert_weight=True):
    nodes = list(G.nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    L = np.zeros((len(nodes), len(nodes)))
    for u, v, d in G.edges(data=True):
        if u == v:
            continue
        c = d.get(weight, 1.0) if weight else 1.0
        if weight and invert_weight:
            c = 1.0 / c
        L[idx[u], idx[v]] -= c
        L[idx[v], idx[u]] -= c
        L[idx[u], idx[u]] += c
        L[idx[v], idx[v]] += c
    Li = np.linalg.pinv(L, hermitian=True)
    i, j = idx[a], idx[b]
    return Li[i, i] + Li[j, j] - 2 * Li[i, j]


def test_path_is_hop_distance(spark):
    G = nx.path_graph(8)
    g = from_nx(spark, G)
    assert resistance_distance(g, 0, 7) == pytest.approx(7.0, abs=1e-7)
    assert resistance_distance(g, 2, 5) == pytest.approx(3.0, abs=1e-7)


def test_cycle_closed_form(spark):
    n, k = 10, 4  # r = k(n-k)/n
    G = nx.cycle_graph(n)
    assert resistance_distance(from_nx(spark, G), 0, k) == pytest.approx(
        k * (n - k) / n, abs=1e-7
    )


def test_random_matches_pinv(spark):
    G = nx.gnp_random_graph(18, 0.25, seed=7)
    G = G.subgraph(max(nx.connected_components(G), key=len)).copy()
    g = from_nx(spark, G)
    nodes = sorted(G.nodes)
    for a, b in [(nodes[0], nodes[-1]), (nodes[1], nodes[3])]:
        assert resistance_distance(g, a, b) == pytest.approx(
            _ref(G, a, b), abs=1e-6
        )


def test_weighted_inversion(spark):
    G = nx.cycle_graph(6)
    for i, (u, v) in enumerate(G.edges()):
        G[u][v]["weight"] = 1.0 + i % 3
    g = from_nx(spark, G)
    assert resistance_distance(g, 0, 3, weight="weight") == pytest.approx(
        _ref(G, 0, 3, weight="weight"), abs=1e-6
    )
    assert resistance_distance(
        g, 0, 3, weight="weight", invert_weight=False
    ) == pytest.approx(_ref(G, 0, 3, weight="weight", invert_weight=False), abs=1e-6)


def test_errors(spark):
    g = from_nx(spark, nx.path_graph(4))
    assert resistance_distance(g, 1, 1) == 0.0
    with pytest.raises(NetworkXError):
        resistance_distance(g, 0, 99)
    disc = from_nx(spark, nx.disjoint_union(nx.path_graph(2), nx.path_graph(2)))
    with pytest.raises(NetworkXError):
        resistance_distance(disc, 0, 1)
    with pytest.raises(NotImplementedForDirected):
        resistance_distance(from_nx(spark, nx.DiGraph([(0, 1)])), 0, 1)
