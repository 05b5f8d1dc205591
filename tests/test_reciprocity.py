"""Parity tests for reciprocity vs networkx (reciprocity.py:14,81)."""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.reciprocity import overall_reciprocity, node_reciprocity


def _nx_graph():
    G = nx.DiGraph()
    G.add_edges_from([(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (0, 4)])
    G.add_node(9)  # isolated
    return G


def test_overall_reciprocity_parity(spark):
    G = _nx_graph()
    g = from_nx(spark, G)
    assert overall_reciprocity(g) == pytest.approx(nx.overall_reciprocity(G))


def test_node_reciprocity_parity(spark):
    G = _nx_graph()
    g = from_nx(spark, G)
    want = nx.reciprocity(G, nodes=[n for n in G if n != 9])
    got = {r["id"]: r["reciprocity"] for r in node_reciprocity(g).collect()}
    for n, v in want.items():
        assert got[n] == pytest.approx(v), n
    assert got[9] is None  # isolated -> undefined (reference yields None)


def test_overall_reciprocity_empty_raises(spark):
    g = from_nx(spark, nx.DiGraph([(0, 1)]))
    g.edges = g.edges.limit(0)
    with pytest.raises(ValueError):
        overall_reciprocity(g)


def test_reciprocity_undirected_raises(spark):
    g = from_nx(spark, nx.Graph([(0, 1)]))
    with pytest.raises(ValueError):
        overall_reciprocity(g)


def test_random_digraph_parity(spark):
    G = nx.gnp_random_graph(30, 0.15, seed=42, directed=True)
    g = from_nx(spark, G)
    assert overall_reciprocity(g) == pytest.approx(nx.overall_reciprocity(G))
