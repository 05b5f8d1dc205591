"""Exact-order parity for the bfs_edges family
(breadth_first_search.py:20,109,465).

The engine's neighbor order is ascending id, so reference calls pin
``sort_neighbors=sorted``; ``bfs_labeled_edges`` has no such parameter,
so its fixtures are built with sorted adjacency (gnp and classic
generators insert edges in sorted order).
"""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.paths import bfs_edges, generic_bfs_edges, bfs_labeled_edges
from linkgraph.exceptions import NetworkXError

FIXTURES = [
    nx.gnp_random_graph(20, 0.15, seed=7),
    nx.gnp_random_graph(20, 0.2, seed=9, directed=True),
    nx.balanced_tree(3, 3),
    nx.disjoint_union(nx.cycle_graph(6), nx.path_graph(5)),
]


def _edges(df):
    return [(r["src"], r["dst"]) for r in df.orderBy("order").collect()]


@pytest.mark.parametrize("G", FIXTURES)
@pytest.mark.parametrize("depth_limit", [None, 2])
def test_bfs_edges_parity(spark, G, depth_limit):
    g = from_nx(spark, G)
    got = _edges(bfs_edges(g, 0, depth_limit=depth_limit))
    want = list(nx.bfs_edges(G, 0, depth_limit=depth_limit, sort_neighbors=sorted))
    assert got == want


def test_bfs_edges_reverse_parity(spark):
    G = nx.gnp_random_graph(20, 0.2, seed=11, directed=True)
    g = from_nx(spark, G)
    got = _edges(bfs_edges(g, 0, reverse=True))
    want = list(nx.bfs_edges(G, 0, reverse=True, sort_neighbors=sorted))
    assert got == want


def test_generic_bfs_edges_parity(spark):
    G = nx.gnp_random_graph(18, 0.18, seed=3)
    g = from_nx(spark, G)
    got = _edges(generic_bfs_edges(g, 0))
    want = list(nx.bfs_edges(G, 0, sort_neighbors=sorted))
    assert got == want
    with pytest.raises(NetworkXError):
        generic_bfs_edges(g, 0, neighbors=lambda n: [])


@pytest.mark.parametrize("G", FIXTURES)
def test_bfs_labeled_edges_parity(spark, G):
    g = from_nx(spark, G)
    got = [
        (r["src"], r["dst"], r["label"])
        for r in bfs_labeled_edges(g, [0]).orderBy("order").collect()
    ]
    want = list(nx.bfs_labeled_edges(G, 0))
    assert got == want


def test_bfs_labeled_edges_multisource(spark):
    G = nx.disjoint_union(nx.cycle_graph(6), nx.path_graph(5))
    g = from_nx(spark, G)
    got = [
        (r["src"], r["dst"], r["label"])
        for r in bfs_labeled_edges(g, [0, 6]).orderBy("order").collect()
    ]
    want = list(nx.bfs_labeled_edges(G, [0, 6]))
    assert got == want
