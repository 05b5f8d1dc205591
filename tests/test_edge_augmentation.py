"""k-edge-augmentation parity
(``networkx/algorithms/connectivity/edge_augmentation.py`` — SciPy-free,
so direct reference checks are possible)."""

import networkx as nx
import pytest

import linkgraph as lg
from linkgraph.graph import from_nx
from linkgraph.exceptions import NetworkXError


def _g(spark, G):
    return from_nx(spark, G)


def _augmented(G, edges):
    H = G.copy()
    H.add_edges_from(edges)
    return H


FIXTURES = [
    nx.path_graph(6),
    nx.disjoint_union(nx.cycle_graph(4), nx.path_graph(3)),
    nx.barbell_graph(4, 2),
    nx.star_graph(5),
]


@pytest.mark.parametrize("G", FIXTURES)
@pytest.mark.parametrize("k", [1, 2, 3])
def test_augmentation_achieves_k(spark, G, k):
    g = _g(spark, G)
    edges = list(lg.k_edge_augmentation(g, k))
    H = _augmented(G, edges)
    assert nx.is_k_edge_connected(H, k)


def test_is_k_edge_connected_parity(spark):
    for G in FIXTURES + [nx.complete_graph(5)]:
        g = _g(spark, G)
        for k in (1, 2, 3):
            assert lg.is_k_edge_connected(g, k) == nx.is_k_edge_connected(G, k)


def test_is_locally_k_edge_connected_parity(spark):
    G = nx.barbell_graph(4, 0)
    g = _g(spark, G)
    for (s, t, k) in [(0, 1, 2), (0, 7, 1), (0, 7, 2), (1, 2, 3)]:
        assert lg.is_locally_k_edge_connected(g, s, t, k) == \
            nx.connectivity.is_locally_k_edge_connected(G, s, t, k)


def test_one_edge_augmentation_weighted(spark):
    G = nx.Graph()
    G.add_nodes_from(range(4))  # 4 isolated nodes
    g = _g(spark, G)
    avail = [(0, 1, 5), (1, 2, 1), (2, 3, 1), (0, 3, 1), (0, 2, 10)]
    edges = list(lg.k_edge_augmentation(g, 1, avail=avail))
    H = _augmented(G, edges)
    assert nx.is_connected(H)
    total = sum(w for (u, v, w) in avail if (u, v) in edges or (v, u) in edges)
    assert total == 3  # the three unit edges form the cheapest spanning tree


def test_unfeasible_raises_and_partial(spark):
    G = nx.path_graph(3)
    g = _g(spark, G)
    with pytest.raises((NetworkXError, ValueError)):
        list(lg.k_edge_augmentation(g, 4))  # fewer than k+1 nodes
    # avail insufficient to connect: partial yields what it can
    G2 = nx.Graph()
    G2.add_nodes_from(range(4))
    G2.add_edge(0, 1)
    g2 = _g(spark, G2)
    avail = [(2, 3, 1)]
    with pytest.raises(NetworkXError):
        list(lg.k_edge_augmentation(g2, 1, avail=avail))
    part = list(lg.k_edge_augmentation(g2, 1, avail=avail, partial=True))
    assert part == [(2, 3)]


def test_greedy_with_avail_k2(spark):
    G = nx.path_graph(8)
    g = _g(spark, G)
    avail = [(u, v) for u in range(8) for v in range(u + 1, 8)
             if not G.has_edge(u, v)]
    edges = list(lg.k_edge_augmentation(g, 2, avail=avail))
    H = _augmented(G, edges)
    assert nx.is_k_edge_connected(H, 2)
